"""Parquet source helpers.

``read_parquet_clean`` passes a metadata-stripped schema to
``ray.data.read_parquet``: pandas-written parquet embeds a ``pandas`` blob in
the Arrow schema metadata, which makes ``pyarrow.Schema`` *unhashable* —
every block bundling/concat in Ray Data then falls into the
``unify_schemas`` slow path and logs a warning per task ("Failed to hash the
schemas").  Stripping at the read keeps every downstream schema hashable
(cheap early-exit dedup) and the logs quiet.  Column pruning is preserved.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def read_parquet_clean(path: str | list[str], columns: list[str] | None = None,
                       **kwargs):
    import ray.data as rd

    first = path[0] if isinstance(path, list) else path
    if isinstance(first, str) and not first.endswith(".parquet"):
        import os

        if os.path.isdir(first):
            # sharded input (the 100 TB layout): schema from the first
            # shard; Ray's read handles the directory listing itself
            shards = sorted(
                f for f in os.listdir(first) if f.endswith(".parquet"))
            if shards:
                first = os.path.join(first, shards[0])
    schema = pq.read_schema(first).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    if (
        "override_num_blocks" not in kwargs
        and isinstance(path, str)
        and not path.endswith("/")
    ):
        # A single SMALL file is one read task that Ray then SplitBlocks
        # into ~64 slivers — every downstream stage pays 64 task overheads
        # for kilobyte blocks (measured 2.6-6s → 1.9s on the sf0.1 events
        # read by capping at ~cores/2).  Real multi-file / >100 MB inputs
        # keep Ray's own parallelism: there the split is bandwidth, not
        # overhead.
        try:
            import os

            if os.path.isfile(path) and os.path.getsize(path) < 100_000_000:
                from oma_ray.cluster import cluster_cpus

                kwargs["override_num_blocks"] = max(
                    8, int(cluster_cpus() * 0.5))
        except Exception:
            pass
    return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)


def from_pandas_clean(df) -> pa.Table:
    """pandas → Arrow without the pandas schema-metadata blob (see module
    docstring; emitted tables stay hashable for Ray's schema dedup)."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
