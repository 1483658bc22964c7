"""OMA container writer: our writer's output must decode (via the same
decoder that round-trips the reference jar's output) back to the identical
entry multiset, compressed and uncompressed, with the embedded type header
and compression header skippable/parsable exactly like the jar's."""

from collections import Counter

import pytest

from oma_ray.pipelines.osm import convert_osm, entries_from_oma
from oma_ray.sources.oma_write import write_oma
from oma_ray.sources.osm_xml import read_osm_xml
from oma_ray.stages.classify import TypeConfig
from oma_ray.synth import default_bbs_text
from oma_ray.synth_osm import osm_fixture_xml


@pytest.fixture(scope="module")
def golden_entries():
    nodes, ways, rels = read_osm_xml(osm_fixture_xml())
    return convert_osm(
        nodes, ways, rels, default_bbs_text(), TypeConfig.default()
    )


@pytest.mark.parametrize("zipped", [True, False])
def test_write_decode_roundtrip(tmp_path, golden_entries, zipped):
    p = str(tmp_path / "out.oma")
    write_oma(p, golden_entries, TypeConfig.default(), zip_slices=zipped)
    back = entries_from_oma(p)
    assert Counter(back) == Counter(golden_entries)


def test_written_header_matches_reference_shape(tmp_path, golden_entries):
    p = str(tmp_path / "out.oma")
    write_oma(p, golden_entries, TypeConfig.default())
    buf = open(p, "rb").read()
    ref = open("tests/golden/default.oma", "rb").read()
    # magic, version and features agree with the jar's output byte-for-byte
    assert buf[:5] == ref[:5]

    # the embedded type header re-parses to the same ordered key tables the
    # jar embeds (decode both with the same minimal parser)
    def type_tables(b):
        import struct
        import zlib

        from oma_ray.functions.codec import OmaReader

        r = OmaReader(b, 21)
        r.read_long()
        out = None
        while True:
            t = r.read_byte()
            if t == 0:
                break
            base = t & 0x7F
            end = r.read_int()
            if base == ord("c"):
                r.read_string()
            elif base == ord("t"):
                if t & 0x80:
                    clen = r.read_int()
                    payload = zlib.decompress(r.read_bytes(clen))
                else:
                    payload = r.read_bytes(end - r.pos)
                tr = OmaReader(payload)
                n = tr.read_small_int()
                out = {}
                for _ in range(n):
                    sec = chr(tr.read_byte())
                    nk = tr.read_small_int()
                    keys = []
                    for _ in range(nk):
                        k = tr.read_string()
                        nv = tr.read_small_int()
                        vals = [tr.read_string() for _ in range(nv)]
                        keys.append((k, vals))
                    out[sec] = keys
            r.pos = end
        return out

    ours = type_tables(buf)
    jars = type_tables(ref)
    assert jars is not None, "jar output carries a type header"
    assert ours == jars


def test_streaming_assembly_from_partitioned_dir(ray_session, tmp_path,
                                                 golden_entries):
    """VERDICT r02 next-step #7: .oma container assembled STREAMING from
    the partitioned conversion directory — one (chunk_type, tile_bucket)
    partition in memory at a time, never the whole entry set — decodes to
    the same multiset as the golden driver-side conversion."""
    from oma_ray.pipelines.osm_dist import convert_pbf_to_dir
    from oma_ray.sources.oma_write import write_oma_from_dir
    from oma_ray.sources.pbf import write_pbf

    nodes, ways, rels = read_osm_xml(osm_fixture_xml())
    p = str(tmp_path / "f.pbf")
    write_pbf(p, nodes, ways, rels, block_size=7)
    out_dir = str(tmp_path / "conv")
    cfg_text = open("/root/reference/default.type").read()
    convert_pbf_to_dir(
        p, default_bbs_text(), TypeConfig.parse(cfg_text), out_dir,
        type_text=cfg_text,
    )
    oma_path = str(tmp_path / "streamed.oma")
    write_oma_from_dir(out_dir, oma_path)
    back = entries_from_oma(oma_path)
    assert Counter(back) == Counter(golden_entries)

    # -0 semantics through the streaming assembler (uncompressed slices)
    oma0 = str(tmp_path / "streamed0.oma")
    write_oma_from_dir(out_dir, oma0, zip_slices=False)
    assert Counter(entries_from_oma(oma0)) == Counter(golden_entries)


@pytest.mark.parametrize("zipped", [True, False])
def test_continuation_chunks_roundtrip(tmp_path, golden_entries, zipped):
    """Memory-pressure continuation chunks (TypeAnalysis.java:499-514,
    deterministic-threshold form): with ``chunk_max_elements`` set, a
    bounds group splits into consecutive same-(type, bounds) chunk-table
    rows, each a complete chunk; the file decodes to the identical entry
    multiset, and the constrained table really does contain
    duplicate-bounds rows (i.e. the flag is not a no-op)."""
    from collections import Counter as C

    from oma_ray.sources.oma_file import oma_index

    p = str(tmp_path / "cont.oma")
    write_oma(p, golden_entries, TypeConfig.default(), zip_slices=zipped,
              chunk_max_elements=2)
    assert Counter(entries_from_oma(p)) == Counter(golden_entries)

    ix = oma_index(p)
    key_counts = C((c[2], tuple(c[3])) for c in ix["chunks"])
    n_dup = sum(v for v in key_counts.values() if v > 1)
    assert n_dup > 0, "cap=2 must force at least one continuation chunk"

    # unconstrained control: same entries, no duplicate-bounds rows
    p0 = str(tmp_path / "plain.oma")
    write_oma(p0, golden_entries, TypeConfig.default(), zip_slices=zipped)
    ix0 = oma_index(p0)
    key_counts0 = C((c[2], tuple(c[3])) for c in ix0["chunks"])
    assert all(v == 1 for v in key_counts0.values())
    assert len(ix["chunks"]) > len(ix0["chunks"])
