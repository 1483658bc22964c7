"""O5M + PBF source conformance (SURVEY §2.1 S3/S4).

Round-trips our fixture-grade writers against our decoders, checks sniffer
dispatch, and runs the golden differential: the reference jar's output for
the SAME elements encoded as .pbf / .o5m (cached under tests/golden/,
regenerate via scripts/make_golden.py) must match our convert_osm fed by
our decoders, entry for entry.
"""

from collections import Counter

import pytest

from oma_ray.sources.osm_xml import read_osm_xml
from oma_ray.synth_osm import osm_fixture_xml

GOLDEN = "tests/golden"


@pytest.fixture(scope="module")
def fixture_elements():
    return read_osm_xml(osm_fixture_xml())


def _eq_elements(a, b):
    # members decode as lists of tuples either way; normalize
    def norm(e):
        e = dict(e)
        if "members" in e:
            e["members"] = [tuple(m) for m in e["members"]]
        return e

    assert [norm(x) for x in a] == [norm(x) for x in b]


def test_pbf_roundtrip(tmp_path, fixture_elements):
    from oma_ray.sources.pbf import pbf_blob_index, read_osm_pbf, write_pbf

    nodes, ways, rels = fixture_elements
    p = str(tmp_path / "f.pbf")
    write_pbf(p, nodes, ways, rels)
    blobs = pbf_blob_index(p)
    assert [b["type"] for b in blobs] == ["OSMHeader"] + ["OSMData"] * 3
    n2, w2, r2 = read_osm_pbf(p)
    _eq_elements(nodes, n2)
    _eq_elements(ways, w2)
    _eq_elements(rels, r2)


def test_pbf_blocks_split(tmp_path, fixture_elements):
    from oma_ray.sources.pbf import pbf_blob_index, read_osm_pbf, write_pbf

    nodes, ways, rels = fixture_elements
    p = str(tmp_path / "f.pbf")
    write_pbf(p, nodes, ways, rels, block_size=7)  # force multiple blobs
    assert len(pbf_blob_index(p)) > 4
    n2, w2, r2 = read_osm_pbf(p)
    _eq_elements(nodes, n2)
    _eq_elements(ways, w2)
    _eq_elements(rels, r2)


def test_o5m_roundtrip(tmp_path, fixture_elements):
    from oma_ray.sources.o5m import read_osm_o5m, write_o5m

    nodes, ways, rels = fixture_elements
    p = str(tmp_path / "f.o5m")
    write_o5m(p, nodes, ways, rels)
    n2, w2, r2 = read_osm_o5m(p)
    _eq_elements(nodes, n2)
    _eq_elements(ways, w2)
    _eq_elements(rels, r2)


def test_sniffer_dispatch(tmp_path, fixture_elements):
    from oma_ray.sources.o5m import write_o5m
    from oma_ray.sources.pbf import write_pbf
    from oma_ray.sources.sniff import detect_format, read_osm_any

    nodes, ways, rels = fixture_elements
    pbf = str(tmp_path / "f.pbf")
    o5m = str(tmp_path / "f.o5m")
    write_pbf(pbf, nodes, ways, rels)
    write_o5m(o5m, nodes, ways, rels)
    assert detect_format(pbf) == "pbf"
    assert detect_format(o5m) == "o5m"
    for p in (pbf, o5m):
        n2, w2, r2 = read_osm_any(p)
        assert len(n2) == len(nodes) and len(w2) == len(ways) and len(r2) == len(rels)


@pytest.mark.parametrize("fmt", ["pbf", "o5m"])
def test_golden_differential(tmp_path, fixture_elements, fmt):
    """jar(.{fmt} fixture) == our convert_osm(our {fmt} reader) — and both
    equal the XML golden (same element content, three encodings)."""
    from oma_ray.pipelines.osm import convert_osm, entries_from_oma
    from oma_ray.stages.classify import TypeConfig
    from oma_ray.synth import default_bbs_text

    nodes, ways, rels = fixture_elements
    p = str(tmp_path / f"f.{fmt}")
    if fmt == "pbf":
        from oma_ray.sources.pbf import read_osm_pbf as reader
        from oma_ray.sources.pbf import write_pbf as writer
    else:
        from oma_ray.sources.o5m import read_osm_o5m as reader
        from oma_ray.sources.o5m import write_o5m as writer
    writer(p, nodes, ways, rels)
    ref = Counter(entries_from_oma(f"{GOLDEN}/fixture_{fmt}.oma"))
    ref_xml = Counter(entries_from_oma(f"{GOLDEN}/default.oma"))
    assert ref == ref_xml  # the jar agrees with itself across encodings
    n2, w2, r2 = reader(p)
    ours = Counter(
        convert_osm(n2, w2, r2, default_bbs_text(), TypeConfig.default())
    )
    assert ours == ref


def test_pbf_ray_table(ray_session, tmp_path, fixture_elements):
    """Blob-parallel Dataset path: one decode task per OSMData blob."""
    from oma_ray.sources.pbf import read_pbf_table, write_pbf

    nodes, ways, rels = fixture_elements
    p = str(tmp_path / "f.pbf")
    write_pbf(p, nodes, ways, rels, block_size=7)
    df = read_pbf_table(p).to_pandas()
    assert len(df) == len(nodes) + len(ways) + len(rels)
    assert dict(df["kind"].value_counts()) == {
        "node": len(nodes), "way": len(ways), "relation": len(rels)
    }
    got_node_ids = sorted(df.loc[df["kind"] == "node", "id"].tolist())
    assert got_node_ids == sorted(n["id"] for n in nodes)


def test_oma_ray_table_matches_serial_decode(ray_session):
    """Dataset-parallel .oma reader ≡ the serial decoder, on both the
    compressed and the -0 (uncompressed-slices) goldens."""
    from collections import Counter

    from oma_ray.pipelines.oma_out import table_to_entries
    from oma_ray.sources.oma_file import decode_oma, read_oma_table

    for name in ("default.oma", "uncompressed.oma"):
        path = f"tests/golden/{name}"
        serial = Counter(
            (
                e.chunk_type, e.bounds, e.key, e.value,
                (e.id, e.version, e.timestamp, e.changeset, e.uid, e.user),
                frozenset(e.tags.items()), frozenset(e.members), e.geo,
            )
            for e in decode_oma(path)
        )
        t = read_oma_table(path).to_arrow_refs()
        import pyarrow as pa
        import ray

        tbl = pa.concat_tables([x for x in ray.get(t) if len(x)])
        got = Counter(table_to_entries(tbl))
        assert got == serial and len(serial) > 0


def test_read_parquet_clean_sharded_dir(ray_session, tmp_path):
    """The 100 TB layout is a DIRECTORY of shards: reading the directory
    must equal reading the single file (schema from the first shard,
    listing delegated to Ray's reader)."""
    import pyarrow.parquet as pqt

    from oma_ray.sources.parquet import read_parquet_clean

    src = "/root/testdata/sf0.001/documents.parquet"
    t = pqt.read_table(src)
    n = len(t) // 4
    for i in range(4):
        pqt.write_table(
            t.slice(i * n, n if i < 3 else len(t) - 3 * n),
            str(tmp_path / f"part{i}.parquet"))
    a = read_parquet_clean(str(tmp_path), columns=["doc_id", "lang"])
    b = read_parquet_clean(src, columns=["doc_id", "lang"])
    pa_, pb = a.to_pandas(), b.to_pandas()
    assert sorted(pa_["doc_id"]) == sorted(pb["doc_id"])
    assert pa_["lang"].value_counts().to_dict() == \
        pb["lang"].value_counts().to_dict()
