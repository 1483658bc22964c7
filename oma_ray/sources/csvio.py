"""CSV source/sink — the spreadsheet-interchange sibling of the JSONL
sink (`sources/jsonl.py`): one gzip shard per batch with a deterministic
min-id name and ``gzip.compress(mtime=0)`` (byte-identical reruns), a
parquet manifest sidecar, pandas' C serializer on the write path and
``ray.data.read_csv`` (pyarrow's block CSV parser, embedded-newline
mode) on the read path.
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa

_INDEX_SCHEMA = pa.schema([("file", pa.string()), ("n_rows", pa.int64())])


class CsvShardWriter:
    """map_batches sink: one batch → one ``part-<min id>.csv.gz`` shard
    (header per shard; min-id names make reruns idempotent)."""

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
        body = batch.to_pandas().to_csv(index=False, lineterminator="\n")
        name = f"part-{int(np.min(ids))}.csv.gz"
        path = os.path.join(self.out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(gzip.compress(body.encode("utf-8"), mtime=0))
        os.replace(tmp, path)
        return pa.table({"file": pa.array([name]),
                         "n_rows": pa.array([batch.num_rows], pa.int64())})


def write_csv(ds, out_dir: str, **kw):
    """Write a Dataset as gzipped CSV shards + parquet manifest under
    ``out_dir``.  Consumes the Dataset (this IS the sink)."""
    idx = ds.map_batches(CsvShardWriter(out_dir, **kw),
                         batch_format="pyarrow")
    idx.write_parquet(os.path.join(out_dir, "_manifest"))


def read_csv_shards(out_dir: str):
    """Read the gzipped CSV shards under ``out_dir`` as a Dataset
    (quoted embedded newlines supported; manifest skipped by
    extension)."""
    import pyarrow.csv as pacsv
    import ray.data as rd

    return rd.read_csv(
        out_dir,
        file_extensions=["gz"],
        arrow_open_stream_args={"compression": "gzip"},
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
    )
