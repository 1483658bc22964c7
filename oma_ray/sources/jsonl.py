"""JSONL (newline-delimited JSON) source/sink — the lingua franca of LLM
training-data interchange.

Sink: the shared deterministic shard protocol (`sources/shardsink.py`:
min-id gzip shard per batch, atomic writes, ``mtime=0`` byte-identical
reruns, parquet manifest) with pandas' C JSON serializer — no per-row
Python in the write path.

Source: a thin wrapper over ``ray.data.read_json`` (pyarrow's block JSON
parser underneath — vectorized decode, streaming over shards).
"""

from __future__ import annotations

from oma_ray.sources.shardsink import ShardWriterBase, write_shards


class JsonlShardWriter(ShardWriterBase):
    extension = "jsonl"

    def serialize(self, df) -> str:
        return df.to_json(orient="records", lines=True, force_ascii=True)


def write_jsonl(ds, out_dir: str, **kw):
    """Write a Dataset as gzipped JSONL shards + parquet manifest under
    ``out_dir``.  Consumes the Dataset (this IS the sink)."""
    write_shards(ds, JsonlShardWriter(out_dir, **kw))


def read_jsonl(out_dir: str):
    """Read the gzipped JSONL shards under ``out_dir`` as a Dataset
    (skips the manifest sidecar by extension)."""
    import ray.data as rd

    return rd.read_json(
        out_dir,
        file_extensions=["gz"],
        arrow_open_stream_args={"compression": "gzip"},
    )
