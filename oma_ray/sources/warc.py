"""WARC source/sink — Common-Crawl-style web-archive shards (ISO 28500).

The engine's input is Common-Crawl-style pages, and Common Crawl's native
container is WARC: a stream of records, each record gzip-compressed as its
OWN member so a reader can start decoding at any member boundary.  This
module gives the engine that surface in both directions:

- **Writer** (`write_warc`): a `map_batches` sink — each block becomes one
  `shard-<min page_id>.warc.gz` (deterministic name → a rerun overwrites
  its own shard, so a failed run resumes by re-processing only missing
  shards) plus CDX-style offset rows (url, ts, file, offset, length)
  collected into a `cdx/` parquet sidecar, the same role Common Crawl's
  CDX index plays.
- **Indexed reader** (`read_warc`): a Dataset over the sidecar rows; the
  batch kernel groups rows per file, coalesces ADJACENT members into one
  contiguous range read (one `seek`+`read` per run, not per record) and
  splits at the recorded offsets — so read parallelism is per index batch,
  not per file, and a 100 GB shard never has to be scanned sequentially.
- **Fallback reader** (`read_warc_files`): foreign WARCs with no sidecar —
  per-file multi-member gzip scan (`zlib` member splitting), parallel
  across files only (the format offers nothing better without an index).

Record layout written (and parsed back): WARC/1.0 headers terminated by a
blank line, `Content-Length` body framing, two CRLF record separators —
per the public WARC 1.1 spec.  `gzip.compress(..., mtime=0)` keeps shard
bytes deterministic.

Reference parity note: the reference engine reads/writes its own
container formats with jump tables (reference: OmaReader.java /
ChunkGenerator.java chunk tables); the CDX sidecar is the WARC-world
equivalent of those seek tables.
"""

from __future__ import annotations

import gzip
import os
import zlib
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"


def _iso(ts_us: int) -> str:
    return datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")


def _parse_iso_us(s: str) -> int:
    dt = datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(
        tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000


def record_bytes(url: str, ts_us: int, payload: bytes,
                 rec_id: str) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: resource\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_iso(ts_us)}\r\n"
        f"WARC-Record-ID: <urn:oma:{rec_id}>\r\n"
        f"Content-Type: text/html\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + _CRLF + _CRLF


class WarcShardWriter:
    """map_batches sink: one batch → one .warc.gz shard; returns the
    shard's CDX index rows as the output batch (url, ts_us, file, offset,
    length).  Shard names derive from the batch's min page_id, which is
    unique per batch (page ids are globally unique), so reruns are
    idempotent per shard."""

    def __init__(self, out_dir: str, url_col: str = "url",
                 ts_col: str = "warc_ts", payload_col: str = "html",
                 id_col: str = "page_id"):
        self.out_dir = out_dir
        self.url_col, self.ts_col = url_col, ts_col
        self.payload_col, self.id_col = payload_col, id_col
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "url": pa.array([], type=pa.string()),
                "ts_us": pa.array([], type=pa.int64()),
                "file": pa.array([], type=pa.string()),
                "offset": pa.array([], type=pa.int64()),
                "length": pa.array([], type=pa.int64()),
            })
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        urls = batch.column(self.url_col).to_pylist()
        ts = batch.column(self.ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        ts_us = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = batch.column(self.payload_col).to_pylist()

        name = f"shard-{int(ids.min())}.warc.gz"
        path = os.path.join(self.out_dir, name)
        offsets = np.zeros(len(urls), dtype=np.int64)
        lengths = np.zeros(len(urls), dtype=np.int64)
        pos = 0
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            for i, (u, t, p, rid) in enumerate(
                    zip(urls, ts_us, payloads, ids)):
                if isinstance(p, str):
                    p = p.encode()
                member = gzip.compress(
                    record_bytes(u, int(t), p, str(int(rid))), mtime=0)
                f.write(member)
                offsets[i], lengths[i] = pos, len(member)
                pos += len(member)
        os.replace(tmp, path)
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "ts_us": pa.array(ts_us),
            "file": pa.array([name] * len(urls), type=pa.string()),
            "offset": pa.array(offsets),
            "length": pa.array(lengths),
        })


def write_warc(pages, out_dir: str, **cols):
    """Write a pages Dataset as WARC shards + CDX parquet sidecar under
    ``out_dir``.  Consumes the Dataset (this IS the sink)."""
    idx = pages.map_batches(
        WarcShardWriter(out_dir, **cols), batch_format="pyarrow")
    idx.write_parquet(os.path.join(out_dir, "cdx"))


def parse_records(buf: bytes):
    """Yield (url, ts_us, payload) from a decoded WARC byte stream
    (one or more records, Content-Length framing)."""
    pos, n = 0, len(buf)
    while pos < n:
        end = buf.find(b"\r\n\r\n", pos)
        if end < 0:
            break
        url = ts_us = None
        clen = -1
        for line in buf[pos:end].split(_CRLF):
            if line.startswith(b"WARC-Target-URI:"):
                url = line.split(b":", 1)[1].strip().decode()
            elif line.startswith(b"WARC-Date:"):
                ts_us = _parse_iso_us(line.split(b":", 1)[1].strip().decode())
            elif line.startswith(b"Content-Length:"):
                clen = int(line.split(b":", 1)[1])
        if clen < 0:
            raise ValueError("WARC record without Content-Length")
        body = bytes(buf[end + 4:end + 4 + clen])
        yield url, ts_us, body
        pos = end + 4 + clen + 4  # body + two CRLF separators


def _records_table(rows) -> pa.Table:
    urls, tss, payloads = [], [], []
    for u, t, p in rows:
        urls.append(u)
        tss.append(t)
        payloads.append(p)
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "ts_us": pa.array(tss, type=pa.int64()),
        "html": pa.array(payloads, type=pa.binary()),
    })


class WarcRangeReader:
    """map_batches kernel over CDX index rows → decoded records.

    Sorts each batch's rows by (file, offset) and coalesces runs of
    ADJACENT members into one contiguous range read; each file in the
    batch is opened once.  Output: (url, ts_us, html)."""

    def __init__(self, warc_dir: str):
        self.warc_dir = warc_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _records_table([])
        files = np.asarray(batch.column("file").to_pylist())
        off = batch.column("offset").to_numpy(zero_copy_only=False)
        ln = batch.column("length").to_numpy(zero_copy_only=False)
        order = np.lexsort((off, files))
        files, off, ln = files[order], off[order], ln[order]
        rows = []
        i, n = 0, len(files)
        while i < n:
            j = i + 1
            # extend the run while same file AND byte-adjacent
            while (j < n and files[j] == files[i]
                   and off[j] == off[j - 1] + ln[j - 1]):
                j += 1
            with open(os.path.join(self.warc_dir, str(files[i])), "rb") as f:
                f.seek(int(off[i]))
                span = f.read(int(off[j - 1] + ln[j - 1] - off[i]))
            base = off[i]
            for k in range(i, j):
                member = span[off[k] - base:off[k] - base + ln[k]]
                rows.extend(parse_records(gzip.decompress(member)))
            i = j
        return _records_table(rows)


def read_warc(out_dir: str, **read_kwargs):
    """Indexed parallel read of a `write_warc` output directory →
    Dataset(url, ts_us, html)."""
    import glob

    from oma_ray.sources.parquet import read_parquet_clean

    idx = read_parquet_clean(
        sorted(glob.glob(os.path.join(out_dir, "cdx", "*.parquet"))),
        **read_kwargs)
    return idx.map_batches(WarcRangeReader(out_dir), batch_format="pyarrow")


def split_members(buf: bytes):
    """Split a multi-member gzip byte stream into decoded member payloads
    (zlib with gzip headers; uses unused_data to find member boundaries)."""
    out = []
    while buf:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(buf))
        buf = d.unused_data
    return out


def read_warc_files(paths, **read_kwargs):
    """Foreign-WARC fallback (no CDX): per-file sequential multi-member
    scan, parallel across files only."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    ds = rd.from_items([{"path": p} for p in paths], **read_kwargs)

    def scan(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                for payload in split_members(f.read()):
                    rows.extend(parse_records(payload))
        return _records_table(rows)

    return ds.map_batches(scan, batch_format="pyarrow")
