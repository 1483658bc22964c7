"""Forced object-store spill on the flagship pipeline (VERDICT r4 #6).

At 100 TB the tiling job's wide-row exchange WILL exceed any node's
object store; the design contract is that Ray spills to disk and the job
completes with identical results — never OOMs, never drops rows.  This
test pins that contract at small scale: a fresh Ray session with a
120 MiB object store materializes a ~400 MiB flagship pipeline output
(forcing real spill — the raylet's cumulative spill counter must move)
and the per-tile summary must equal the unconstrained session's exactly.

Runs in a SUBPROCESS because the capped ``object_store_memory`` needs its
own ``ray.init`` (the suite's session fixture owns this process's Ray).
"""

import json
import os
import subprocess
import sys

SCRIPT = r"""
import sys, json, glob, re
sys.path.insert(0, "@REPO@")
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", object_store_memory=120 * 1024 * 1024)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from oma_ray.pipelines.tiling import (build_tiling_pipeline, default_grid,
                                      default_polygons, tile_summary)
from oma_ray.synth import make_pages_dataset
ds = build_tiling_pipeline(
    make_pages_dataset("/root/testdata/sf0.001", replicate=2000),
    ray.put(default_grid()), ray.put(default_polygons()))
mat = ds.materialize()  # pins ~400 MiB of blocks in a 120 MiB store
s = tile_summary(mat).sort_values("tile_id").reset_index(drop=True)
import ray._private.worker as _w
f = _w._global_node.get_session_dir_path() + "/logs/raylet.out"
spill = 0
for line in open(f, errors="ignore"):
    m = (re.search(r"cumulative spill requests: (\d+)", line)
         or re.search(r"Spilled (\d+) MiB", line))
    if m:
        spill = max(spill, int(m.group(1)))
print(json.dumps({
    "summary": s.to_dict(orient="list"),
    "spill_requests": spill,
}))
ray.shutdown()
"""


def test_flagship_completes_and_matches_under_forced_spill():
    import pandas as pd

    from oma_ray.pipelines.tiling import run_tiling

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT.replace("@REPO@", repo)],
        capture_output=True, text=True, timeout=570,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["spill_requests"] > 0, "store cap never forced a spill"

    spilled = pd.DataFrame(out["summary"])
    assert int(spilled["n_pages"].sum()) == 500 * 2000

    # unconstrained reference summary in THIS session (replicate=1, the
    # distribution is deterministic: counts scale exactly by replicate...
    # except page ids differ, so compare via the replicate=1 run only on
    # the invariant: per-tile matched share is NOT directly comparable —
    # the exact cross-check therefore re-runs replicate=2000 unconstrained.
    ref = run_tiling("/root/testdata/sf0.001", replicate=2000)
    ref = ref.sort_values("tile_id").reset_index(drop=True)
    assert ref[["tile_id", "n_pages", "n_matched"]].equals(
        spilled[["tile_id", "n_pages", "n_matched"]].astype(ref.dtypes))
