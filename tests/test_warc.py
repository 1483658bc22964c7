"""WARC source/sink tests: byte-identical round-trip through shards + CDX
index, indexed-vs-sequential reader equality, member splitting, adjacency
coalescing under scrambled index order, and shard determinism."""

import glob
import gzip
import os

import numpy as np
import pyarrow as pa
import pytest

from oma_ray.sources.warc import (
    WarcRangeReader,
    WarcShardWriter,
    parse_records,
    read_warc,
    read_warc_files,
    record_bytes,
    split_members,
    write_warc,
)

SF = "/root/testdata/sf0.001"


def _pages_table():
    from oma_ray.synth import make_pages_dataset

    t = pa.concat_tables(
        [pa.Table.from_pydict(b.to_pydict())
         for b in make_pages_dataset(SF).iter_batches(
             batch_format="pyarrow", batch_size=None)])
    return t


def _key(url, ts, html):
    return (url, int(ts), bytes(html))


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    from oma_ray.synth import make_pages_dataset

    d = str(tmp_path_factory.mktemp("warc"))
    write_warc(make_pages_dataset(SF), d)
    return d


def test_roundtrip_byte_identical(warc_dir):
    pages = _pages_table()
    got = read_warc(warc_dir).to_pandas()
    want = {
        _key(u, t.value if hasattr(t, "value") else t, h)
        for u, t, h in zip(pages.column("url").to_pylist(),
                           pages.column("warc_ts").cast(pa.int64()).to_pylist(),
                           pages.column("html").to_pylist())
    }
    have = {_key(r.url, r.ts_us, r.html) for r in got.itertuples()}
    assert have == want
    assert len(got) == pages.num_rows


def test_sequential_scan_matches_indexed(warc_dir):
    paths = sorted(glob.glob(os.path.join(warc_dir, "*.warc.gz")))
    assert paths
    seq = read_warc_files(paths).to_pandas()
    idx = read_warc(warc_dir).to_pandas()
    a = {_key(r.url, r.ts_us, r.html) for r in seq.itertuples()}
    b = {_key(r.url, r.ts_us, r.html) for r in idx.itertuples()}
    assert a == b and len(seq) == len(idx)


def test_split_members_and_parse():
    r1 = record_bytes("https://a.example/1", 1_704_067_200_000_000,
                      b"<html>one</html>", "1")
    r2 = record_bytes("https://b.example/2", 1_704_067_201_000_000,
                      b"bin\x00\xff payload", "2")
    stream = gzip.compress(r1, mtime=0) + gzip.compress(r2, mtime=0)
    parts = split_members(stream)
    assert parts == [r1, r2]
    recs = [r for p in parts for r in parse_records(p)]
    assert recs[0] == ("https://a.example/1", 1_704_067_200_000_000,
                       b"<html>one</html>")
    assert recs[1][2] == b"bin\x00\xff payload"


def test_range_reader_scrambled_and_split_batches(warc_dir, tmp_path):
    # scramble the CDX rows and split them across arbitrary batch cuts:
    # the coalescing kernel must still decode every member correctly
    import pyarrow.parquet as pq

    idx = pa.concat_tables([
        pq.read_table(p)
        for p in glob.glob(os.path.join(warc_dir, "cdx", "*.parquet"))])
    rng = np.random.default_rng(3)
    perm = rng.permutation(idx.num_rows)
    shuffled = idx.take(pa.array(perm))
    rdr = WarcRangeReader(warc_dir)
    outs = [rdr(shuffled.slice(i, 97))
            for i in range(0, shuffled.num_rows, 97)]
    got = pa.concat_tables(outs)
    assert got.num_rows == idx.num_rows
    assert set(got.column("url").to_pylist()) == set(
        idx.column("url").to_pylist())


def test_writer_deterministic(tmp_path):
    batch = pa.table({
        "page_id": pa.array([10, 11], type=pa.int64()),
        "url": ["https://x.example/p/10", "https://x.example/p/11"],
        "warc_ts": pa.array([1_704_067_200_000_000, 1_704_067_260_000_000],
                            type=pa.timestamp("us")),
        "html": pa.array([b"<html>a</html>", b"<html>b</html>"],
                         type=pa.binary()),
    })
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    i1 = WarcShardWriter(d1)(batch)
    i2 = WarcShardWriter(d2)(batch)
    assert i1.equals(i2.set_column(
        i2.schema.get_field_index("file"), "file", i1.column("file")))
    f1 = open(os.path.join(d1, "shard-10.warc.gz"), "rb").read()
    f2 = open(os.path.join(d2, "shard-10.warc.gz"), "rb").read()
    assert f1 == f2
