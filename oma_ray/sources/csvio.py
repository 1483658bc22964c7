"""CSV source/sink — the spreadsheet-interchange sibling of the JSONL
sink, on the shared deterministic shard protocol
(`sources/shardsink.py`), with pandas' C CSV serializer on the write
path and ``ray.data.read_csv`` (pyarrow's block CSV parser,
embedded-newline mode) on the read path.

Type-inference caveat: pyarrow's CSV reader infers column types per
file, so a string column whose values in some shard all LOOK numeric
("007") would silently come back as int64 with leading zeros lost.
Callers that know the schema pass ``column_types`` (a dict of
column → pyarrow type) to pin it — the round-trip query does.
"""

from __future__ import annotations

from oma_ray.sources.shardsink import ShardWriterBase, write_shards


class CsvShardWriter(ShardWriterBase):
    extension = "csv"

    def serialize(self, df) -> str:
        return df.to_csv(index=False, lineterminator="\n")


def write_csv(ds, out_dir: str, **kw):
    """Write a Dataset as gzipped CSV shards + parquet manifest under
    ``out_dir``.  Consumes the Dataset (this IS the sink)."""
    write_shards(ds, CsvShardWriter(out_dir, **kw))


def read_csv_shards(out_dir: str, column_types: dict | None = None):
    """Read the gzipped CSV shards under ``out_dir`` as a Dataset
    (quoted embedded newlines supported; manifest skipped by extension;
    pass ``column_types`` to pin the schema against per-file type
    inference — see the module docstring)."""
    import pyarrow.csv as pacsv
    import ray.data as rd

    convert = (pacsv.ConvertOptions(column_types=column_types)
               if column_types else None)
    kw = {"convert_options": convert} if convert else {}
    return rd.read_csv(
        out_dir,
        file_extensions=["gz"],
        arrow_open_stream_args={"compression": "gzip"},
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        **kw,
    )
