"""Block/slice-equivalent partitioned output (SURVEY §2.2 K3/K4, §2.6 A4).

The reference nests jump tables — chunk → block (per key) → slice (per
value), each slice DEFLATEd (TypeAnalysis.java:528-674) — and embeds the
parsed ``.type`` tables in the output header (TypeAnalysis.java:304-377) so
a reader needs nothing but the file.  The Ray-native equivalent:

- one parquet directory tree partitioned by
  ``chunk_type / tile_bucket / key_part`` (K3/A4: the block axis is a real
  partition column; the slice axis is the ``value`` column, sorted within
  each fragment so per-value runs are contiguous — parquet's dictionary +
  ZSTD replace per-slice DEFLATE, and row-group stats replace jump tables);
- ``config.json`` next to the manifest records the verbatim ``.type`` and
  ``.bbs`` texts plus the expanded box list (K4): the output is
  self-describing — ``read_entries`` needs no out-of-band state;
- the partition manifest (state/manifest.py) gains one entry for the write
  with row/partition counts (A2 metrics).

``tile_bucket`` hashes the chunk bounds into a bounded number of
directories, like pipelines/tiling.py — at 10^12 rows no tile may map to
one giant file, and hot tiles spread across buckets' row groups.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from oma_ray.state.manifest import Manifest

N_TILE_BUCKETS = 64
OTHER_KEY = "__other__"  # partition-dir-safe stand-in for the "" other-block


def _bucket_of(bounds: tuple) -> int:
    """Deterministic bounds → directory bucket (NOT Python hash(): that is
    per-process salted)."""
    return (
        bounds[0] * 31 + bounds[1] * 17 + bounds[2] * 7 + bounds[3]
    ) % N_TILE_BUCKETS


def entries_to_table(entries: list[tuple]) -> pa.Table:
    """convert_osm signature tuples → flat Arrow rows (JSON side-payloads
    for nested tags/members/geo, like pipelines/osm_dist.py)."""
    rows = {
        "chunk_type": [], "tile_bucket": [], "key_part": [],
        "bounds_json": [], "key": [], "value": [], "meta_json": [],
        "tags_json": [], "members_json": [], "geo_json": [],
    }
    for (ct, bounds, key, value, meta, tags, members, geo) in entries:
        rows["chunk_type"].append(ct)
        rows["tile_bucket"].append(int(_bucket_of(bounds)))
        rows["key_part"].append(key if key else OTHER_KEY)
        rows["bounds_json"].append(json.dumps(list(bounds), default=int))
        rows["key"].append(key)
        rows["value"].append(value)
        rows["meta_json"].append(json.dumps(list(meta), default=int))
        rows["tags_json"].append(json.dumps(sorted(tags), default=int))
        rows["members_json"].append(json.dumps(sorted(members), default=int))
        rows["geo_json"].append(json.dumps(geo, default=int))
    return pa.table(
        {
            "chunk_type": pa.array(rows["chunk_type"], type=pa.string()),
            "tile_bucket": pa.array(rows["tile_bucket"], type=pa.int32()),
            "key_part": pa.array(rows["key_part"], type=pa.string()),
            "bounds_json": pa.array(rows["bounds_json"], type=pa.string()),
            "key": pa.array(rows["key"], type=pa.string()),
            "value": pa.array(rows["value"], type=pa.string()),
            "meta_json": pa.array(rows["meta_json"], type=pa.string()),
            "tags_json": pa.array(rows["tags_json"], type=pa.string()),
            "members_json": pa.array(rows["members_json"], type=pa.string()),
            "geo_json": pa.array(rows["geo_json"], type=pa.string()),
        }
    )


def table_to_entries(t: pa.Table) -> list[tuple]:
    out = []
    for row in t.to_pylist():
        out.append(
            (
                row["chunk_type"],
                tuple(json.loads(row["bounds_json"])),
                row["key"],
                row["value"],
                tuple(json.loads(row["meta_json"])),
                frozenset(tuple(x) for x in json.loads(row["tags_json"])),
                frozenset(tuple(x) for x in json.loads(row["members_json"])),
                _geo_from_json(row["chunk_type"], json.loads(row["geo_json"])),
            )
        )
    return out


def _geo_from_json(ct: str, gj):
    if ct == "N":
        return (gj[0], gj[1])
    if ct == "W":
        return tuple(tuple(p) for p in gj)
    if ct == "A":
        return (
            tuple(tuple(p) for p in gj[0]),
            tuple(tuple(tuple(q) for q in h) for h in gj[1]),
        )
    return ()


def write_entries(
    entries: list[tuple],
    out_dir: str,
    *,
    type_text: str = "",
    bbs_text: str = "",
    lineage: str = "conversion",
) -> str:
    """Partitioned, self-describing write of a conversion's entry multiset.

    Rows sort by (value, key) within each block before the write so each
    slice (value run) is contiguous — the reference's per-block slice
    extraction order (TypeAnalysis.java:588-637) expressed as a local sort.
    """
    import ray.data as rd

    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    t = entries_to_table(entries)
    ds = rd.from_arrow(t)
    ds = ds.repartition(
        min(default_partitions(), max(1, len(entries))),
        keys=["chunk_type", "tile_bucket", "key_part"],
    )

    def sort_block(batch: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            batch,
            sort_keys=[
                ("chunk_type", "ascending"), ("key", "ascending"),
                ("value", "ascending"), ("meta_json", "ascending"),
            ],
        )
        return batch.take(idx)

    ds = ds.map_batches(sort_block, batch_format="pyarrow")
    data_dir = os.path.join(out_dir, "data")
    ds.write_parquet(
        data_dir, partition_cols=["chunk_type", "tile_bucket", "key_part"]
    )

    # K4: self-describing output — the configs ride with the data
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({"type_config": type_text, "bbs": bbs_text}, f)
    man = Manifest(out_dir)
    man.mark_done(
        lineage,
        rows=len(entries),
        partitions=len(
            set(zip(t["chunk_type"].to_pylist(), t["tile_bucket"].to_pylist(),
                    t["key_part"].to_pylist()))
        ),
        path=data_dir,
    )
    return out_dir


def read_entries(out_dir: str) -> tuple[list[tuple], dict]:
    """Read back a partitioned conversion → (entries, config dict)."""
    import pyarrow.dataset as pads

    t = pads.dataset(
        os.path.join(out_dir, "data"), format="parquet", partitioning="hive"
    ).to_table()
    # partition cols come back; drop the helper ones before decoding
    t = t.select(
        [c for c in t.column_names
         if c not in ("chunk_type_part",)]
    )
    with open(os.path.join(out_dir, "config.json")) as f:
        config = json.load(f)
    return table_to_entries(t), config
