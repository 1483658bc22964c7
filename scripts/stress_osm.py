"""Scale-stress for the distributed OSM conversion: synthesize a large
deterministic OSM extract (no external data), encode it to PBF with the
fixture-grade writer, run the blob-parallel + distributed-reunify path, and
check its entry multiset against the driver-side conformance path.

Usage: python scripts/stress_osm.py [n_nodes] [num_cpus] [--big]

This is the "would it still work at 1000×" evidence (BASELINE.md): the
fixture has 38 nodes; this runs the same code on 10^5-10^6 elements where
driver-side dicts would already dominate a laptop's memory at the next
factor of 1000.

``--big`` (the 10^7 decade, VERDICT r4 #5): skips every driver-side
entry list — the default mode holds THREE full entry lists on the driver
for Counter parity, ~2 KB/entry × 12M × 3 ≈ 70 GB at n_nodes=10M — and
instead parity-checks the dir-path output of the DEFAULT regimes
(node-coord + membership broadcast) against a second run with BOTH
distributed-join regimes FORCED (memb_broadcast_max=0,
node_broadcast_max_bytes=0) via a streaming distributed multiset hash
(md5 per canonical entry row, summed mod 2^127 inside map_batches; the
driver sees one int per block).  Correctness anchoring to the jar stays
at the 1.21M/3.63M differentials; this decade checks regime parity,
throughput and that no stage holds row-scale state.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


from oma_ray.synth_osm import synth_big_osm  # noqa: E402


def _dir_multiset_hash(out_dir: str) -> tuple[int, int]:
    """Distributed multiset hash of a conversion dir: md5 over a canonical
    serialization of every entry (sets sorted, tuples recursed), summed as
    int128s mod 2**255 inside ``map_batches`` — the driver reduces one
    (hash, count) pair per block, never an entry."""
    import hashlib

    import pyarrow as pa

    from oma_ray.pipelines.oma_out import read_entries_ds, table_to_entries

    def canon(x) -> str:
        if isinstance(x, frozenset):
            return "{" + ",".join(sorted(canon(e) for e in x)) + "}"
        if isinstance(x, (tuple, list)):
            return "(" + ",".join(canon(e) for e in x) + ")"
        return repr(x)

    MOD = 2**255

    def block_hash(batch: pa.Table) -> pa.Table:
        entries = table_to_entries(batch)
        h = 0
        for e in entries:
            h = (h + int.from_bytes(
                hashlib.md5(canon(e).encode()).digest(), "big")) % MOD
        return pa.table({"h": pa.array([str(h)], type=pa.string()),
                         "n": pa.array([len(entries)], type=pa.int64())})

    parts = read_entries_ds(out_dir).map_batches(
        block_hash, batch_format="pyarrow").to_pandas()
    return (sum(int(x) for x in parts["h"]) % MOD, int(parts["n"].sum()))


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    big = "--big" in sys.argv

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from collections import Counter

    from oma_ray.pipelines.osm import convert_osm
    from oma_ray.pipelines.osm_dist import convert_pbf_distributed
    from oma_ray.sources.pbf import pbf_blob_index, write_pbf
    from oma_ray.stages.classify import TypeConfig
    from oma_ray.synth import default_bbs_text

    t0 = time.time()
    nodes, ways, rels = synth_big_osm(n_nodes)
    print(f"synth: {len(nodes)} nodes, {len(ways)} ways, {len(rels)} rels "
          f"in {time.time()-t0:.1f}s")

    t0 = time.time()
    path = f"/tmp/stress_{n_nodes}.pbf"
    write_pbf(path, nodes, ways, rels)
    print(f"pbf: {len(pbf_blob_index(path))} blobs, "
          f"{__import__('os').path.getsize(path)//1024} KiB "
          f"in {time.time()-t0:.1f}s")

    cfg = TypeConfig.default()
    n_elem = len(nodes) + len(ways) + len(rels)

    # THE scale path: PBF → entry streams → partitioned parquet, nothing
    # entry-scale on the driver (convert_pbf_to_dir)
    import shutil

    from oma_ray.pipelines.oma_out import read_entries
    from oma_ray.pipelines.osm_dist import convert_pbf_to_dir

    out_dir = f"/tmp/stress_dir_{n_nodes}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    convert_pbf_to_dir(path, default_bbs_text(), cfg, out_dir)
    t_dir = time.time() - t0
    print(f"dir path (pbf→partitioned parquet): {t_dir:.1f}s "
          f"({n_elem/t_dir:,.0f} elem/s)")

    if big:
        out2 = f"/tmp/stress_dir_{n_nodes}_forced"
        shutil.rmtree(out2, ignore_errors=True)
        t0 = time.time()
        convert_pbf_to_dir(path, default_bbs_text(), cfg, out2,
                           memb_broadcast_max=0,
                           node_broadcast_max_bytes=0)
        t_forced = time.time() - t0
        print(f"dir path FORCED-JOIN regimes: {t_forced:.1f}s "
              f"({n_elem/t_forced:,.0f} elem/s)")
        t0 = time.time()
        h1, n1 = _dir_multiset_hash(out_dir)
        h2, n2 = _dir_multiset_hash(out2)
        print(f"hash pass: {time.time()-t0:.1f}s; "
              f"entries {n1} vs {n2}")
        ok = (h1 == h2) and (n1 == n2) and n1 > 0
        print("REGIME MULTISET MATCH (streaming hash):", ok)
        shutil.rmtree(out2, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        ray.shutdown()
        sys.exit(0 if ok else 1)

    t0 = time.time()
    dist = convert_pbf_distributed(path, default_bbs_text(), cfg)
    t_dist = time.time() - t0
    print(f"distributed(collected): {len(dist)} entries in {t_dist:.1f}s "
          f"({n_elem/t_dist:,.0f} elem/s)")

    from collections import Counter as _C

    dir_entries, _cfg = read_entries(out_dir)
    print("DIR MULTISET MATCH vs collected:", _C(dir_entries) == _C(dist))

    t0 = time.time()
    ref = convert_osm(nodes, ways, rels, default_bbs_text(), cfg)
    t_drv = time.time() - t0
    print(f"driver-side: {len(ref)} entries in {t_drv:.1f}s")

    ok = Counter(dist) == Counter(ref)
    print("MULTISET MATCH:", ok)
    ray.shutdown()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
