"""Property tests for the round-5 operator wave (q258–q272 kernels):
Count-Min overestimate bound + mergeability, SCD2 timeline tiling,
Apriori downward closure, span-corruption invariants — each driven
through the SHIPPED query pipeline at sf0.001 where the property is
about the pipeline, and through the raw kernel where it is numeric."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9),
                min_size=1, max_size=400),
       st.integers(min_value=2, max_value=5))
def test_cms_overestimates_and_merges(keys, n_shards):
    """CMS estimate ≥ true count for EVERY key, and summing per-shard
    sketches equals the one-pass sketch (mergeable partials — the
    property q258's exchange relies on)."""
    from oma_ray.pipelines.queries import _CMS_H, _CMS_P, _CMS_W

    x = np.asarray(keys, dtype=np.int64)

    def sketch(arr):
        flat = np.zeros(len(_CMS_H) * _CMS_W, dtype=np.int64)
        for i, (a, b) in enumerate(_CMS_H):
            np.add.at(flat, i * _CMS_W + ((a * arr + b) % _CMS_P) % _CMS_W,
                      np.int64(1))
        return flat

    whole = sketch(x)
    merged = np.zeros_like(whole)
    for shard in np.array_split(x, n_shards):
        if len(shard):
            merged += sketch(shard)
    assert np.array_equal(whole, merged)

    uniq, true = np.unique(x, return_counts=True)
    est = np.min(np.stack([
        whole[i * _CMS_W + ((a * uniq + b) % _CMS_P) % _CMS_W]
        for i, (a, b) in enumerate(_CMS_H)]), axis=0)
    assert (est >= true).all()
    assert (est <= len(x)).all()


def test_scd2_tiles_every_user_timeline(ray_session):
    """q261 invariants on real data: per user, versions are 1..k with no
    gaps; valid_from strictly inside the previous interval's end (the
    half-open chain valid_to[i] == valid_from[i+1]); exactly one open
    interval (valid_to == -1) per user — the last; consecutive states
    differ."""
    from oma_ray.pipelines.queries import QUERIES

    df = (QUERIES["q261_scd2_intervals"](SF).to_pandas()
          .sort_values(["user_id", "version_n"]))
    assert len(df)
    for uid, g in df.groupby("user_id"):
        v = g["version_n"].to_numpy()
        assert (v == np.arange(1, len(g) + 1)).all()
        vf = g["valid_from_us"].to_numpy()
        vt = g["valid_to_us"].to_numpy()
        assert (vt[:-1] == vf[1:]).all()
        assert (vt[:-1] >= vf[:-1]).all()
        assert vt[-1] == -1 and (vt[:-1] != -1).all()
        s = g["state"].to_numpy()
        assert (s[1:] != s[:-1]).all()


def test_apriori_downward_closure_and_exactness(ray_session):
    """q260 on real data: every reported triple's support is the EXACT
    basket count (recomputed from raw lineitem), and each of its three
    member pairs has support ≥ the triple's (downward closure)."""
    import pyarrow.parquet as pq

    from oma_ray.pipelines.queries import QUERIES

    out = QUERIES["q260_apriori_triples"](SF).to_pandas()
    assert len(out)
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    li["it"] = li["l_partkey"] % 25
    sets = li.groupby("l_orderkey")["it"].agg(lambda s: frozenset(s))
    masks = np.array([sum(1 << int(i) for i in s) for s in sets],
                     dtype=np.uint64)

    def support(items):
        m = np.uint64(sum(1 << int(i) for i in items))
        return int(((masks & m) == m).sum())

    for _, r in out.iterrows():
        a, b, c, sup = int(r["ia"]), int(r["ib"]), int(r["ic"]), int(
            r["support"])
        assert a < b < c
        assert support((a, b, c)) == sup
        for pair in ((a, b), (a, c), (b, c)):
            assert support(pair) >= sup


def test_span_corruption_invariants(ray_session):
    """q272 on real data: spans in-bounds, ≥7 tokens apart within a doc,
    sentinel ids consecutive from 0, and span_text equals the actual
    tokens at [start, start+3) of the whitespace tokenization."""
    import pyarrow.parquet as pq

    from oma_ray.pipelines.queries import QUERIES

    df = (QUERIES["q272_span_corruption"](SF).to_pandas()
          .sort_values(["doc_id", "sentinel_id"]))
    assert len(df)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    text = dict(zip(docs["doc_id"], docs["text"]))
    for did, g in df.groupby("doc_id"):
        toks = [t for t in text[did].split() if t]
        s = g["start"].to_numpy()
        assert (g["sentinel_id"].to_numpy()
                == np.arange(len(g))).all()
        assert (np.diff(s) == 10).all() if len(s) > 1 else True
        assert s.min() >= 0 and s.max() + 3 <= len(toks)
        for st_, txt in zip(s, g["span_text"]):
            assert " ".join(toks[st_:st_ + 3]) == txt


def test_greedy_cover_trace_is_greedy(ray_session):
    """q269 on real data: gains are non-increasing and each round's gain
    equals the winner's true marginal bigram coverage recomputed from
    the raw corpus."""
    import pyarrow.parquet as pq

    from oma_ray.pipelines.queries import QUERIES

    out = (QUERIES["q269_greedy_cover"](SF).to_pandas()
           .sort_values("round"))
    assert len(out)
    gains = out["gain"].to_numpy()
    assert (np.diff(gains) <= 0).all()

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()

    def bigrams(t):
        w = [x for x in t.split() if x]
        return {f"{a} {b}" for a, b in zip(w, w[1:])}

    sets = {int(r["doc_id"]): bigrams(r["text"])
            for _, r in docs.iterrows()}
    covered: set = set()
    for _, r in out.iterrows():
        best = max(sets.items(),
                   key=lambda kv: (len(kv[1] - covered), -kv[0]))
        assert len(best[1] - covered) == int(r["gain"])
        assert len(sets[int(r["doc_id"])] - covered) == int(r["gain"])
        covered |= sets[int(r["doc_id"])]


def test_grouping_sets_matches_pandas(ray_session):
    """q273 on real data: every GROUPING SETS level matches a pandas
    groupby over the raw lineitem table, and grouping_id carries the
    ANSI bit convention (bit i set ⟺ keys[i] aggregated away)."""
    import pyarrow.parquet as pq

    from oma_ray.pipelines.queries import QUERIES, _cents

    out = QUERIES["q273_grouping_sets"](SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_returnflag", "l_linestatus",
                                "l_quantity"]).to_pandas()
    li["sum_qty_c"] = _cents(li["l_quantity"].to_numpy())

    fine = out[out["grouping_id"] == 0]
    exp = li.groupby(["l_returnflag", "l_linestatus"],
                     as_index=False).agg(sum_qty_c=("sum_qty_c", "sum"),
                                         n_items=("sum_qty_c", "size"))
    got = (fine[["l_returnflag", "l_linestatus", "sum_qty_c", "n_items"]]
           .sort_values(["l_returnflag", "l_linestatus"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, exp.sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True), check_dtype=False)

    # (l_linestatus) level: grouping_id = 0b10 (l_returnflag grouped away)
    mid = out[out["grouping_id"] == 2]
    assert mid["l_returnflag"].isna().all()
    exp_mid = li.groupby("l_linestatus")["sum_qty_c"].sum()
    got_mid = dict(zip(mid["l_linestatus"], mid["sum_qty_c"]))
    assert got_mid == exp_mid.to_dict()

    # () level: grouping_id = 0b11, one all-null row with the grand total
    tot = out[out["grouping_id"] == 3]
    assert len(tot) == 1
    assert tot["l_returnflag"].isna().all() and tot["l_linestatus"].isna().all()
    assert int(tot["sum_qty_c"].iloc[0]) == int(li["sum_qty_c"].sum())
    assert int(tot["n_items"].iloc[0]) == len(li)
    # the (l_returnflag) level is deliberately absent from the set list
    assert set(out["grouping_id"].unique()) == {0, 2, 3}


def test_keep_best_dedup_picks_canonical(ray_session):
    """q274 on real data: exactly one winner per distinct text, every
    winner is the non-mirror copy (rank 0), and its doc_id is the group
    minimum among rank-0 members."""
    import pyarrow.parquet as pq

    from oma_ray.pipelines.queries import QUERIES

    out = QUERIES["q274_keep_best_dedup"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    import hashlib

    docs["text_md5"] = [hashlib.md5(t.encode()).hexdigest()
                        for t in docs["text"]]
    assert out["text_md5"].is_unique
    assert set(out["text_md5"]) == set(docs["text_md5"])
    # mirrors (doc_id+1e6, rank 1) must never win
    assert (out["rank"] == 0).all()
    assert not out["source"].str.endswith("_mirror").any()
    exp_min = docs.groupby("text_md5")["doc_id"].min()
    got = dict(zip(out["text_md5"], out["doc_id"]))
    assert got == exp_min.to_dict()
