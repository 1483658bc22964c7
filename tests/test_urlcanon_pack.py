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
