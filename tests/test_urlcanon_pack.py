"""URL canonicalization (stages/links.py) and sequence packing (q83)."""

import numpy as np
import pyarrow as pa

from oma_ray.stages.links import canonicalize_urls


def canon(u: str) -> str:
    return canonicalize_urls(pa.array([u])).to_pylist()[0]


def test_canonicalize_rules():
    assert canon("HTTPS://SITE7.EXAMPLE/p/3") == "https://site7.example/p/3"
    assert canon("https://a.example:443/x") == "https://a.example/x"
    assert canon("https://a.example/x#frag") == "https://a.example/x"
    assert canon("https://a.example/x/") == "https://a.example/x"
    assert canon("https://a.example/") == "https://a.example/"
    assert (canon("https://a.example/x?utm_source=s&utm_medium=m")
            == "https://a.example/x")
    assert (canon("https://a.example/x?a=1&utm_source=s&b=2")
            == "https://a.example/x?a=1&b=2")
    assert (canon("https://a.example/x?ref=feed") == "https://a.example/x")
    # :443 only strips as a PORT, not inside the path
    assert canon("https://a.example/p:443") == "https://a.example/p:443"
    # case of path is preserved (case-sensitive component)
    assert canon("https://A.Example/PaTh") == "https://a.example/PaTh"


def test_q83_packing_matches_brute_force():
    import ray.data as rd

    from oma_ray.pipelines.queries import QUERIES

    out = QUERIES["q83_seq_pack"]("/root/testdata/sf0.001").to_pandas()
    # brute force: per source, docs in id order, exclusive cumsum // 128
    for src, g in out.groupby("source"):
        g = g.sort_values("doc_id")
        cum = g["n_tok"].cumsum() - g["n_tok"]
        assert (g["seq_id"].to_numpy() == (cum // 128).to_numpy()).all(), src
    # packing is dense: seq ids run 0..max without gaps per source
    for src, g in out.groupby("source"):
        s = np.sort(g["seq_id"].unique())
        assert (np.diff(s) <= 1).all() and s[0] == 0


# --- property: Arrow rewrite chain == independent Python reference -----------

import re

from hypothesis import given, settings
from hypothesis import strategies as st


def _py_canon(u: str) -> str:
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)(.*)$", u, re.S)
    if not m:
        return ""
    scheme, hostport, rest = m.groups()
    host = re.sub(r":443$", "", hostport.lower())
    rest = re.sub(r"#.*$", "", rest, flags=re.S)
    rest = re.sub(r"(utm_[a-z]+|ref)=[^&#]*", "", rest)
    rest = re.sub(r"&&+", "&", rest)
    rest = re.sub(r"\?&", "?", rest)
    rest = re.sub(r"[?&]$", "", rest)
    rest = re.sub(r"^(.+)/$", r"\1", rest, flags=re.S)
    return scheme.lower() + "://" + host + rest


_seg = st.text(
    alphabet="abcXYZ059._-~", min_size=0, max_size=8)
_param = st.one_of(
    st.just("utm_source=x"), st.just("utm_medium=mm"), st.just("ref=r1"),
    st.sampled_from(["a=1", "b=2", "q=term", "page=3"]),
)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HtTpS"]))
    host = draw(st.sampled_from(
        ["Site7.Example", "a.example", "X.Y.example", "site0.example"]))
    port = draw(st.sampled_from(["", ":443", ":8080"]))
    path = "/" + "/".join(draw(st.lists(_seg, max_size=3)))
    params = draw(st.lists(_param, max_size=4))
    q = ("?" + "&".join(params)) if params else ""
    frag = draw(st.sampled_from(["", "#f", "#a/b?c"]))
    slash = draw(st.sampled_from(["", "/"]))
    return f"{scheme}://{host}{port}{path}{slash}{q}{frag}"


@settings(max_examples=300, deadline=None)
@given(st.lists(_urls(), min_size=1, max_size=10))
def test_canonicalize_matches_python_reference(urls):
    import pyarrow as pa

    got = canonicalize_urls(pa.array(urls)).to_pylist()
    assert got == [_py_canon(u) for u in urls]
