"""Arrow IPC (Feather v2 container) source/sink — the zero-copy binary
interchange format between Arrow-native engines.

Sink: the shared deterministic shard protocol (`sources/shardsink.py`:
min-id shard per batch, atomic tmp+rename writes, parquet manifest) with
the pyarrow IPC file writer — the payload is the Arrow columnar layout
itself, no row-wise serialization at all, and the writer output is
byte-deterministic for a given (schema, data) so reruns are idempotent.

Source: ``ray.data.read_binary_files`` over the shards + a per-FILE (not
per-row) decode map — each shard memory-maps back through
``pa.ipc.open_file`` into whole record batches, which keeps the read
path vectorized and lets Ray parallelize across shards exactly as the
parquet reads do.
"""

from __future__ import annotations

import pyarrow as pa

from oma_ray.sources.shardsink import ShardWriterBase, write_shards


class ArrowIpcShardWriter(ShardWriterBase):
    extension = "arrow"

    def encode(self, batch: pa.Table) -> tuple[bytes, str]:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, batch.schema) as w:
            w.write_table(batch)
        return sink.getvalue().to_pybytes(), self.extension


def write_ipc(ds, out_dir: str, **kw):
    """Write a Dataset as Arrow IPC file shards + parquet manifest under
    ``out_dir``.  Consumes the Dataset (this IS the sink)."""
    write_shards(ds, ArrowIpcShardWriter(out_dir, **kw))


def read_ipc(out_dir: str):
    """Read the Arrow IPC shards under ``out_dir`` as a Dataset: binary
    file blocks in, decoded record batches out (one decode per FILE)."""
    import ray.data as rd

    ds = rd.read_binary_files(out_dir, file_extensions=["arrow"])

    def decode(batch: pa.Table) -> pa.Table:
        tables = [
            pa.ipc.open_file(pa.BufferReader(b)).read_all()
            for b in batch.column("bytes").to_pylist()
        ]
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)

    return ds.map_batches(decode, batch_format="pyarrow")
