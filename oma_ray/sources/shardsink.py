"""Shared deterministic shard-sink protocol for the text interchange
sinks (JSONL, CSV): one gzip shard per batch named after the batch's min
id (globally unique → idempotent reruns), atomic tmp+rename writes,
``gzip.compress(mtime=0)`` for byte-identical reruns, and a parquet
manifest sidecar under ``<out_dir>/_manifest`` for resume/skip.

Concrete sinks supply only ``extension`` and ``serialize(df) -> str``;
a protocol fix here (atomicity, naming, manifest) reaches every format.
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa

INDEX_SCHEMA = pa.schema([("file", pa.string()), ("n_rows", pa.int64())])


class ShardWriterBase:
    """map_batches sink base: one batch → one ``part-<min id>.<ext>.gz``
    shard; returns the shard's manifest row as the output batch."""

    extension = "dat"

    def __init__(self, out_dir: str, id_col: str = "doc_id",
                 columns: list[str] | None = None):
        self.out_dir = out_dir
        self.id_col = id_col
        self.columns = columns
        os.makedirs(out_dir, exist_ok=True)

    def serialize(self, df) -> str:  # pragma: no cover - abstract hook
        raise NotImplementedError

    def encode(self, batch: pa.Table) -> tuple[bytes, str]:
        """(shard bytes, filename suffix).  Default: text ``serialize``
        + deterministic gzip.  Binary formats (Arrow IPC) override this
        and skip the gzip layer."""
        body = self.serialize(batch.to_pandas())
        if not body.endswith("\n"):
            body += "\n"
        return (gzip.compress(body.encode("utf-8"), mtime=0),
                f"{self.extension}.gz")

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return INDEX_SCHEMA.empty_table()
        if self.columns:
            batch = batch.select(self.columns)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        payload, suffix = self.encode(batch)
        name = f"part-{int(np.min(ids))}.{suffix}"
        path = os.path.join(self.out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.table({"file": pa.array([name]),
                         "n_rows": pa.array([batch.num_rows], pa.int64())})


def write_shards(ds, writer: ShardWriterBase):
    """Consume a Dataset through the shard writer + write the manifest."""
    idx = ds.map_batches(writer, batch_format="pyarrow")
    idx.write_parquet(os.path.join(writer.out_dir, "_manifest"))
