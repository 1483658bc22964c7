"""Property-based round-trips for the round-2 codecs: protobuf varints,
PBF and O5M element encodings, PPM images, OMA container primitives."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_packed_varints_roundtrip(vals):
    from oma_ray.sources.pbf import decode_varints, encode_varint

    buf = b"".join(encode_varint(v) for v in vals)
    got = decode_varints(buf)
    assert [int(x) for x in got] == vals


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=100))
def test_zigzag_roundtrip(vals):
    from oma_ray.sources.pbf import decode_varints, encode_varint, unzigzag, zigzag

    buf = b"".join(encode_varint(zigzag(v)) for v in vals)
    got = unzigzag(decode_varints(buf))
    assert [int(x) for x in got] == vals


_meta = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=1, max_value=2**40),
        "version": st.integers(min_value=1, max_value=100),
        "timestamp": st.integers(min_value=1, max_value=2**31),
        "changeset": st.integers(min_value=0, max_value=2**31),
        "uid": st.integers(min_value=0, max_value=2**31 - 1),
        "user": st.text(
            alphabet=st.characters(blacklist_characters="\0",
                                   blacklist_categories=("Cs",)),
            max_size=12),
    }
)
_tagkey = st.text(
    alphabet=st.characters(blacklist_characters="\0", blacklist_categories=("Cs",)),
    min_size=1, max_size=10)
_tags = st.dictionaries(_tagkey, _tagkey, max_size=4)


@st.composite
def _elements(draw):
    nodes = draw(st.lists(
        st.builds(
            lambda m, lon, lat, tags: {**m, "lon": lon, "lat": lat, "tags": tags},
            _meta,
            st.integers(min_value=-1_800_000_000, max_value=1_800_000_000),
            st.integers(min_value=-900_000_000, max_value=900_000_000),
            _tags,
        ),
        max_size=8,
    ))
    ways = draw(st.lists(
        st.builds(
            lambda m, refs, tags: {**m, "refs": refs, "tags": tags},
            _meta,
            st.lists(st.integers(min_value=1, max_value=2**40), max_size=6),
            _tags,
        ),
        max_size=5,
    ))
    rels = draw(st.lists(
        st.builds(
            lambda m, members, tags: {**m, "members": members, "tags": tags},
            _meta,
            st.lists(
                st.tuples(
                    st.sampled_from(["node", "way", "relation"]),
                    st.integers(min_value=1, max_value=2**40),
                    st.text(alphabet="abcdefgh", max_size=6),
                ),
                max_size=4,
            ),
            _tags,
        ),
        max_size=4,
    ))
    return nodes, ways, rels


def _norm(elems):
    # discardable keys are dropped by the readers by design
    from oma_ray.sources.osm_xml import DISCARDABLE

    out = []
    for e in elems:
        e = dict(e)
        if "members" in e:
            e["members"] = [tuple(m) for m in e["members"]]
        e["tags"] = {k: v for k, v in e["tags"].items() if k not in DISCARDABLE}
        out.append(e)
    return out


@settings(max_examples=25, deadline=None)
@given(_elements())
def test_pbf_random_roundtrip(tmp_path_factory, elems):
    from oma_ray.sources.pbf import read_osm_pbf, write_pbf

    nodes, ways, rels = elems
    p = str(tmp_path_factory.mktemp("pbf") / "r.pbf")
    write_pbf(p, nodes, ways, rels)
    n2, w2, r2 = read_osm_pbf(p)
    assert _norm(n2) == _norm(nodes)
    assert _norm(w2) == _norm(ways)
    assert _norm(r2) == _norm(rels)


@settings(max_examples=25, deadline=None)
@given(_elements())
def test_o5m_random_roundtrip(tmp_path_factory, elems):
    from oma_ray.sources.o5m import read_osm_o5m, write_o5m

    nodes, ways, rels = elems
    p = str(tmp_path_factory.mktemp("o5m") / "r.o5m")
    write_o5m(p, nodes, ways, rels)
    n2, w2, r2 = read_osm_o5m(p)
    assert _norm(n2) == _norm(nodes)
    assert _norm(w2) == _norm(ways)
    assert _norm(r2) == _norm(rels)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**31),
)
def test_ppm_random_roundtrip(w, h, seed):
    from oma_ray.stages.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=50))
def test_oma_small_int_roundtrip(vals):
    # domain is a Java int: the escape arm is a 4-byte signed int
    # (OmaOutputStream.java:55-70)
    from oma_ray.functions.codec import OmaReader
    from oma_ray.sources.oma_write import OmaWriter

    w = OmaWriter()
    for v in vals:
        w.small_int(v)
    r = OmaReader(bytes(w.buf))
    assert [r.read_small_int() for _ in vals] == vals


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.tuples(
        st.integers(min_value=-1_800_000_000, max_value=1_800_000_000),
        st.integers(min_value=-900_000_000, max_value=900_000_000),
    ),
    max_size=50,
))
def test_oma_delta_coords_roundtrip(coords):
    from oma_ray.functions.codec import OmaReader
    from oma_ray.sources.oma_write import OmaWriter

    w = OmaWriter()
    for x, y in coords:
        w.delta_x(x)
        w.delta_y(y)
    r = OmaReader(bytes(w.buf))
    got = [(r.read_delta_x(), r.read_delta_y()) for _ in coords]
    assert got == coords


# --- jsonvec: the vectorized JSON wire-column builders ----------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_any_text = st.text(
    alphabet=st.characters(min_codepoint=0, max_codepoint=0x2FFF),
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_any_text, max_size=30))
def test_quote_strings_roundtrip(strings):
    import json

    import pyarrow as pa

    from oma_ray.functions.jsonvec import quote_strings

    lits = quote_strings(pa.array(strings, type=pa.string()))
    for orig, lit in zip(strings, lits.to_pylist()):
        assert json.loads(lit) == orig


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.tuples(_any_text, _any_text), max_size=6), max_size=10
    )
)
def test_tags_json_roundtrip(rows):
    import json

    import pyarrow as pa

    from oma_ray.functions.jsonvec import json_string_pair_lists

    keys = pa.array([[k for k, _ in r] for r in rows],
                    type=pa.list_(pa.string()))
    vals = pa.array([[v for _, v in r] for r in rows],
                    type=pa.list_(pa.string()))
    out = json_string_pair_lists(keys, vals)
    for r, s in zip(rows, out.to_pylist()):
        assert [tuple(p) for p in json.loads(s)] == list(r)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.integers(-2**62, 2**62), max_size=8),
                max_size=10))
def test_int_lists_roundtrip(rows):
    import json

    import pyarrow as pa

    from oma_ray.functions.jsonvec import json_int_lists

    out = json_int_lists(pa.array(rows, type=pa.list_(pa.int64())))
    for r, s in zip(rows, out.to_pylist()):
        assert json.loads(s) == r
