"""Cluster job entrypoint — the `ray job submit` contract.

On a real cluster (the north_rule's fixed N-node / 4N-node deployments):

    ray job submit --working-dir . -- \
        python scripts/job_entry.py tiling  --input <pages-parquet-dir> --out /data/tiled
    ray job submit --working-dir . -- \
        python scripts/job_entry.py convert --input planet.osm.pbf --out /data/oma_dir

The job runner injects RAY_ADDRESS, so `ray.init(address="auto")` attaches
to the running cluster; in this sandbox the same script runs standalone
(RAY_ADDRESS=local is preset).  Both subcommands are RESUMABLE: re-submitting
the identical job skips shards/streams whose lineage ids the partition
manifest already marks done, which is the recovery story after a node loss
mid-job.  One JSON metrics line goes to stdout (job logs) at the end.

N→4N scaling evidence in this sandbox (no multi-node cluster available):
`python bench.py --scaling` runs the tiling job at num_cpus=8 vs 32 in
fresh processes — see BASELINE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "auto"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def job_tiling(args) -> dict:
    from oma_ray.pipelines.tiling import run_tiling_resumable

    files = sorted(glob.glob(f"{args.input}/*.parquet")) if os.path.isdir(
        args.input
    ) else [args.input]
    if not files:
        raise SystemExit(f"no parquet under {args.input}")
    t0 = time.time()
    metrics = run_tiling_resumable(
        files, args.out,
        shard_size=args.shard_size, replicate=args.replicate,
    )
    return {
        "job": "tiling",
        "wall_sec": round(time.time() - t0, 3),
        "out": args.out,
        **metrics,
    }


def job_convert(args) -> dict:
    from oma_ray.pipelines.osm_dist import convert_pbf_to_dir
    from oma_ray.stages.classify import TypeConfig
    from oma_ray.synth import default_bbs_text

    bbs_text = open(args.bbs).read() if args.bbs else default_bbs_text()
    type_text = open(
        args.types if args.types else "/root/reference/default.type"
    ).read()
    t0 = time.time()
    convert_pbf_to_dir(
        args.input, bbs_text, TypeConfig.parse(type_text), args.out,
        type_text=type_text,
    )
    return {"job": "convert", "wall_sec": round(time.time() - t0, 3),
            "out": args.out}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("tiling", help="pages → tiled partitioned parquet")
    t.add_argument("--input", required=True,
                   help="pages/documents parquet file or directory")
    t.add_argument("--out", required=True, help="output dir (manifest inside)")
    t.add_argument("--shard-size", type=int, default=1,
                   help="input files per resume shard")
    t.add_argument("--replicate", type=int, default=1,
                   help="synthetic fan-out per document row (bench inputs)")
    t.set_defaults(fn=job_tiling)

    c = sub.add_parser("convert", help="OSM PBF → partitioned .oma-dir")
    c.add_argument("--input", required=True, help="input .pbf")
    c.add_argument("--out", required=True, help="output partition dir")
    c.add_argument("--bbs", default=None, help="tiling grid (.bbs)")
    c.add_argument("--types", default=None, help="classification (.type)")
    c.set_defaults(fn=job_convert)

    args = p.parse_args(argv)
    _init_ray()
    out = args.fn(args)
    print(json.dumps(out))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
