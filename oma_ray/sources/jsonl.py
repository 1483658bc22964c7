"""JSONL (newline-delimited JSON) source/sink — the lingua franca of LLM
training-data interchange.

Sink: one gzip shard per batch (deterministic name from the batch's min id,
``gzip.compress(mtime=0)`` so reruns are byte-identical — the WARC sink
convention), a parquet manifest sidecar for resume/skip.  The JSON encoding
is pandas' C serializer (``to_json(orient="records", lines=True)``) — no
per-row Python in the write path.

Source: a thin wrapper over ``ray.data.read_json`` (pyarrow's block JSON
parser underneath — vectorized decode, streaming over shards).
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa

_INDEX_SCHEMA = pa.schema([("file", pa.string()), ("n_rows", pa.int64())])


class JsonlShardWriter:
    """map_batches sink: one batch → one ``part-<min id>.jsonl.gz`` shard;
    returns the shard's manifest row.  Shard names derive from the batch's
    min id (globally unique), so reruns are idempotent per shard."""

    def __init__(self, out_dir: str, id_col: str = "doc_id",
                 columns: list[str] | None = None):
        self.out_dir = out_dir
        self.id_col = id_col
        self.columns = columns
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _INDEX_SCHEMA.empty_table()
        if self.columns:
            batch = batch.select(self.columns)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        body = batch.to_pandas().to_json(
            orient="records", lines=True, force_ascii=True)
        if not body.endswith("\n"):
            body += "\n"
        name = f"part-{int(np.min(ids))}.jsonl.gz"
        path = os.path.join(self.out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(gzip.compress(body.encode("utf-8"), mtime=0))
        os.replace(tmp, path)
        return pa.table({"file": pa.array([name]),
                         "n_rows": pa.array([batch.num_rows], pa.int64())})


def write_jsonl(ds, out_dir: str, **kw):
    """Write a Dataset as gzipped JSONL shards + parquet manifest under
    ``out_dir``.  Consumes the Dataset (this IS the sink)."""
    idx = ds.map_batches(JsonlShardWriter(out_dir, **kw),
                         batch_format="pyarrow")
    idx.write_parquet(os.path.join(out_dir, "_manifest"))


def read_jsonl(out_dir: str):
    """Read the gzipped JSONL shards under ``out_dir`` as a Dataset
    (skips the manifest sidecar by extension)."""
    import ray.data as rd

    return rd.read_json(
        out_dir,
        file_extensions=["gz"],
        arrow_open_stream_args={"compression": "gzip"},
    )
