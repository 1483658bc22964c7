"""Rollup, exact grouped quantiles, HLL sketch, stratified sampling."""

import numpy as np
import pyarrow as pa


def test_disc_index_matches_sorted_selection():
    from oma_ray.stages.quantile import disc_index

    rng = np.random.default_rng(7)
    for n in [1, 2, 3, 10, 101]:
        vals = np.sort(rng.integers(0, 50, size=n))
        for num, den in [(1, 2), (9, 10), (99, 100), (1, 100), (1, 1)]:
            k = disc_index(n, num, den)
            assert 0 <= k < n
            # the ANSI percentile_disc element: first value whose
            # cumulative share >= p over the sorted multiset
            p = num / den
            expect = vals[int(np.ceil(n * p)) - 1]
            assert vals[k] == expect


def test_grouped_quantiles_multi_group(ray_session):
    import ray.data as rd

    from oma_ray.stages.quantile import grouped_quantiles

    rng = np.random.default_rng(11)
    g = rng.integers(0, 5, size=4000)
    v = rng.integers(0, 30, size=4000)
    ds = rd.from_arrow(pa.table({"g": g, "v": v})).repartition(8)
    out = (
        grouped_quantiles(ds, ["g"], "v", [("med", 1, 2), ("p90", 9, 10)])
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert len(out) == 5
    for gi in range(5):
        sv = np.sort(v[g == gi])
        row = out[out["g"] == gi].iloc[0]
        assert row["n"] == len(sv)
        assert row["med"] == sv[int(np.ceil(len(sv) * 0.5)) - 1]
        assert row["p90"] == sv[int(np.ceil(len(sv) * 0.9)) - 1]


def test_hll_accuracy_and_merge():
    from oma_ray.stages.sketch import hll_estimate, hll_partial

    rng = np.random.default_rng(3)
    for true_n in [100, 5_000, 200_000]:
        vals = rng.integers(0, 2**62, size=true_n)
        regs = hll_partial(vals, np.zeros(true_n, dtype=np.int64), 1)
        est = hll_estimate(regs)[0]
        assert abs(est - len(np.unique(vals))) / true_n < 0.05
    # merge associativity: two halves merged == one pass
    vals = rng.integers(0, 2**62, size=10_000)
    whole = hll_partial(vals, np.zeros(10_000, dtype=np.int64), 1)
    a = hll_partial(vals[:6_000], np.zeros(6_000, dtype=np.int64), 1)
    b = hll_partial(vals[6_000:], np.zeros(4_000, dtype=np.int64), 1)
    assert np.array_equal(np.maximum(a, b), whole)


def test_approx_ndistinct_dataset(ray_session):
    import ray.data as rd

    from oma_ray.stages.sketch import approx_ndistinct

    rng = np.random.default_rng(5)
    n = 50_000
    key = rng.integers(0, 3, size=n)
    # distinct pools of very different sizes per key
    val = np.where(key == 0, rng.integers(0, 50, n),
                   np.where(key == 1, rng.integers(0, 2_000, n),
                            rng.integers(0, 1_000_000, n)))
    ds = rd.from_arrow(pa.table({"k": key, "v": val})).repartition(8)
    out = approx_ndistinct(ds, ["k"], "v").to_pandas().set_index("k")["approx_n"]
    import pandas as pd

    exact = pd.DataFrame({"k": key, "v": val}).groupby("k")["v"].nunique()
    for k in range(3):
        assert abs(out[k] - exact[k]) / exact[k] < 0.05, (k, out[k], exact[k])


def test_stratified_sample_rates(ray_session):
    import ray.data as rd

    from oma_ray.stages.sample import stratified_sample

    n = 30_000
    ids = np.arange(n, dtype=np.int64)
    strata = np.where(ids % 3 == 0, "en", np.where(ids % 3 == 1, "fr", "de"))
    ds = rd.from_arrow(pa.table({"id": ids, "s": strata})).repartition(4)
    out = stratified_sample(ds, "s", "id", {"en": 10, "fr": 50}, 90).to_pandas()
    got = out.groupby("s")["id"].count()
    assert abs(got["en"] / 10_000 - 0.10) < 0.02
    assert abs(got["fr"] / 10_000 - 0.50) < 0.03
    assert abs(got["de"] / 10_000 - 0.90) < 0.03
    # deterministic: same predicate → same rows
    out2 = stratified_sample(ds, "s", "id", {"en": 10, "fr": 50}, 90).to_pandas()
    assert sorted(out2["id"]) == sorted(out["id"])


def test_kmeans_refine_recovers_blobs(ray_session):
    import ray.data as rd

    from oma_ray.stages.knn import _normalize, kmeans_refine

    rng = np.random.default_rng(23)
    d, n_blobs, per = 16, 6, 400
    centers = _normalize(rng.normal(size=(n_blobs, d)))
    pts = np.repeat(centers, per, axis=0) + 0.05 * rng.normal(
        size=(n_blobs * per, d)
    )
    tbl = pa.table(
        {
            "vec_id": np.arange(len(pts), dtype=np.int64),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(pts.ravel(), type=pa.float64()), d
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(8)
    # deliberately bad init: all centroids seeded from ONE blob's region
    init = centers[0] + 0.1 * rng.normal(size=(n_blobs, d))

    def inertia(c):
        m = _normalize(pts)
        return float((1 - (m @ _normalize(c).T).max(axis=1)).sum())

    refined = kmeans_refine(ds, init, iters=4, num_partitions=2)
    # Lloyd from a collapsed init guarantees monotone improvement and
    # recovers most blobs; nearby blobs can stay merged (a local minimum,
    # not a bug — init quality is the quantizer sample's job).
    assert inertia(refined) < inertia(init) * 0.5
    sims = _normalize(centers) @ refined.T
    assert (sims.max(axis=1) > 0.95).sum() >= n_blobs - 2
    # a good init converges onto every blob
    good = kmeans_refine(ds, centers + 0.02 * rng.normal(size=(n_blobs, d)),
                         iters=2, num_partitions=2)
    assert ((_normalize(centers) @ good.T).max(axis=1) > 0.99).all()


def test_heavy_hitters_guarantees(ray_session):
    import pandas as pd
    import ray.data as rd

    from oma_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(29)
    # skewed corpus: a few hot values over a long uniform tail
    hot = np.repeat(np.array([7, 13, 42]), [30_000, 20_000, 10_000])
    tail = rng.integers(1_000, 50_000, size=40_000)
    vals = np.concatenate([hot, tail])
    rng.shuffle(vals)
    n = len(vals)
    k = 64
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    out = heavy_hitters(ds, "v", k=k).to_pandas().set_index("value")["min_count"]
    true = pd.Series(vals).value_counts()
    # every value above the n/(k+1) frequency bound is guaranteed present
    for v in true[true > n // (k + 1)].index:
        assert v in out.index, v
    # reported counts are lower bounds on true counts
    for v, c in out.items():
        assert c <= true[v], (v, c, true[v])
    # the hot values dominate the summary
    assert out.loc[7] > 25_000 and out.loc[13] > 15_000 and out.loc[42] > 5_000


def test_bloom_semi_join_exact_and_selective(ray_session):
    import pandas as pd
    import ray.data as rd

    from oma_ray.stages.bloom import bloom_mask, bloom_semi_join, build_bloom

    rng = np.random.default_rng(31)
    # small right: 500 keys; big left: 50k rows, ~2% true matches
    rkeys = rng.choice(10**9, size=500, replace=False).astype(np.int64)
    lkeys = np.concatenate(
        [rng.choice(rkeys, 1_000), rng.choice(10**9, 49_000).astype(np.int64)]
    )
    rng.shuffle(lkeys)
    left = rd.from_arrow(
        pa.table({"k": lkeys, "lv": np.arange(len(lkeys), dtype=np.int64)})
    ).repartition(8)
    right = rd.from_arrow(
        pa.table({"k": rkeys, "rv": rkeys * 2})
    ).repartition(2).materialize()

    # no false negatives; false-positive rate small at this sizing
    bits = build_bloom(right, "k", n_bits=1 << 20)
    assert bloom_mask(rkeys, bits, 4).all()
    fp = bloom_mask(rng.choice(10**9, 20_000).astype(np.int64), bits, 4).mean()
    assert fp < 0.01, fp

    got = (
        bloom_semi_join(left, right, "k", num_partitions=4)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"k": lkeys, "lv": np.arange(len(lkeys), dtype=np.int64)})
        .merge(pd.DataFrame({"k": rkeys, "rv": rkeys * 2}), on="k")
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "lv", "rv"]], want[["k", "lv", "rv"]])


def test_kll_error_bound_across_merges():
    from oma_ray.stages.sketch import KLLSketch

    rng = np.random.default_rng(7)
    data = rng.random(200_000)
    parts = [KLLSketch(256).insert(c) for c in np.array_split(data, 32)]
    sk = parts[0]
    for p in parts[1:]:
        sk.merge(p)
    # documented bound: relative rank error <= levels/(2k); on uniform data
    # value error ~ rank error.  Assert with a 2x safety margin.
    bound = 2 * len(sk.levels) / (2 * 256)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    est = sk.quantiles(qs)
    true = np.quantile(data, qs, method="lower")
    assert np.abs(est - true).max() <= bound
    # sketch size stays O(k log(n/k)), nowhere near n
    assert sum(len(lv) for lv in sk.levels) < 256 * (len(sk.levels) + 2)
    # serialization round-trip preserves the level structure
    rt = KLLSketch.from_bytes(sk.to_bytes())
    assert all((a == b).all() for a, b in zip(rt.levels, sk.levels))
    assert (rt.quantiles(qs) == est).all()


def test_grouped_approx_quantiles_dataset(ray_session):
    import ray.data as rd

    from oma_ray.stages.sketch import grouped_approx_quantiles

    rng = np.random.default_rng(3)
    g = rng.integers(0, 4, size=40_000)
    v = rng.normal(loc=g * 10.0, scale=5.0)
    ds = rd.from_arrow(pa.table({"g": g, "v": v})).repartition(16)
    out = (
        grouped_approx_quantiles(ds, ["g"], "v", [0.25, 0.5, 0.75], k=256)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert len(out) == 4 and list(out.columns) == ["g", "p25", "p50", "p75"]
    for gi in range(4):
        sv = v[g == gi]
        row = out[out["g"] == gi].iloc[0]
        for q, c in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75")]:
            # rank-space check: the returned value's true rank is within
            # 2% of the requested quantile
            rank = (sv < row[c]).mean()
            assert abs(rank - q) < 0.02, (gi, c, rank)


def test_funnel_counts_strict_ordering_and_window():
    """Funnel edge semantics: a step-2 event AT t1 (not strictly after)
    doesn't count; one outside the window doesn't; users span blocks."""
    import ray.data as rd

    from oma_ray.stages.sessions import funnel_counts

    base = 1_700_000_000_000_000
    rows = []
    # u0: full funnel inside windows
    rows += [(0, base, "view"), (0, base + 10**6, "click"),
             (0, base + 2 * 10**6, "purchase")]
    # u1: click AT t1 exactly -> strict > excludes it
    rows += [(1, base, "view"), (1, base, "click")]
    # u2: click outside the 100s window
    rows += [(2, base, "view"), (2, base + 101_000_000, "click")]
    # u3: click before the first view -> not a funnel step
    rows += [(3, base + 50_000_000, "view"), (3, base, "click")]
    # u4: view only
    rows += [(4, base, "view")]
    # noise types must be ignored
    rows += [(0, base + 1, "error"), (2, base + 2, "signup")]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows]).cast(pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows]),
        }
    )
    out = (
        funnel_counts(rd.from_arrow(t).repartition(4),
                      ["view", "click", "purchase"], within_seconds=100)
        .to_pandas().set_index("step")["n_users"]
    )
    assert out.loc[1] == 5  # all users have a view
    assert out.loc[2] == 1  # only u0's click qualifies
    assert out.loc[3] == 1


def test_funnel_counts_no_matching_events_returns_zero_rows():
    """SQL parity: COUNT over an empty set is 0 — one row per step even
    when NO event matches any step type (empty-exchange path)."""
    import ray.data as rd

    from oma_ray.stages.sessions import funnel_counts

    t = pa.table(
        {
            "user_id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array([0, 1], type=pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(["error", "signup"]),
        }
    )
    out = (
        funnel_counts(rd.from_arrow(t), ["view", "click", "purchase"],
                      within_seconds=60)
        .to_pandas().set_index("step")["n_users"]
    )
    assert out.sort_index().tolist() == [0, 0, 0]


def test_weighted_sample_probability_is_size_biased():
    import ray.data as rd

    from oma_ray.stages.sample import KNUTH, weighted_sample

    n = 50_000
    ids = np.arange(n, dtype=np.int64)
    w = np.where(ids % 2 == 0, 100, 400).astype(np.int64)  # 10% vs 40%
    t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})
    out = weighted_sample(
        rd.from_arrow(t).repartition(4), "doc_id", "n_chars", rate_num=1000
    ).to_pandas()
    kept = out.groupby(out.doc_id % 2).size()
    # exact predicate check (deterministic)
    h = (ids * KNUTH) % (1 << 32) % 1_000_000
    want = h < np.minimum(w * 1000, 1_000_000)
    assert len(out) == want.sum()
    assert set(out["doc_id"]) == set(ids[want])
    # size bias: the heavy class keeps ~4x the light class
    ratio = kept.loc[1] / kept.loc[0]
    assert 3.0 < ratio < 5.0, ratio


def test_hash_sample_predicate_matches_duckdb_at_large_ids():
    """The 32-bit-masked Knuth predicate must agree with its SQL mirror
    even for ids >= 2^32 (where an unmasked int64 multiply would wrap in
    numpy but not in SQL) — the 10^12-id-scale contract."""
    import duckdb

    from oma_ray.stages.sample import KNUTH, _hash32, sql_sample_predicate

    ids = np.array(
        [0, 1, 12345, 2**32 - 1, 2**32, 5_000_000_000, 10**12, 2**62],
        dtype=np.int64,
    )
    engine = _hash32(ids, KNUTH) % 100 < 37
    got = next(iter(duckdb.sql(
        f"SELECT {sql_sample_predicate('id', 37)} "
        f"FROM (SELECT UNNEST({ids.tolist()}) AS id)"
    ).fetchnumpy().values()))
    assert (engine == got).all()


def test_broadcast_once_reuses_refs_within_session(ray_session):
    """Repeat pipeline calls must reuse the SAME ObjectRef (worker-side
    CachedStage keys on the ref hex — a fresh ref per call rebuilds every
    worker's state per run, the round-3 q21 regression)."""
    import ray

    from oma_ray.stages.taskcache import broadcast_once

    calls = []

    def factory():
        calls.append(1)
        return {"x": 42}

    r1 = broadcast_once("test_bo_slot", factory)
    r2 = broadcast_once("test_bo_slot", factory)
    assert r1 == r2 and len(calls) == 1
    assert ray.get(r1)["x"] == 42


def test_skyline_mask_matches_bruteforce():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oma_ray.pipelines.queries import _skyline_mask

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                    min_size=1, max_size=24))
    def check(pts):
        x = np.array([p[0] for p in pts], dtype=np.int64)
        y = np.array([p[1] for p in pts], dtype=np.int64)
        got = _skyline_mask(x, y)
        for i in range(len(pts)):
            dominated = any(
                x[j] >= x[i] and y[j] >= y[i]
                and (x[j] > x[i] or y[j] > y[i])
                for j in range(len(pts)))
            assert got[i] == (not dominated)

    check()


def test_manhattan_dt_matches_bruteforce():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oma_ray.pipelines.queries import _manhattan_dt

    @settings(max_examples=60, deadline=None)
    @given(st.integers(1, 9), st.integers(1, 9), st.integers(0, 2**31 - 1))
    def check(h, w, seed_int):
        rng = np.random.RandomState(seed_int)
        seed = rng.rand(h, w) < 0.2
        d = _manhattan_dt(seed)
        rr, cc = np.nonzero(seed)
        for r in range(h):
            for c in range(w):
                want = ((np.abs(rr - r) + np.abs(cc - c)).min()
                        if len(rr) else 1 << 20)
                assert d[r, c] == want

    check()


def test_radial_simplify_matches_bruteforce():
    """q183's SHIPPED kernel (functions.geo.radial_simplify) vs a direct
    reference walk, plus the shipped invariant checker vs a brute one —
    testing the importable helpers the pipeline actually calls (ADVICE
    r4: the old test validated an inline copy of the algorithm)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oma_ray.functions.geo import radial_invariant_ok, radial_simplify

    EPS2 = 2000 * 2000

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 10000), st.integers(0, 10000)),
                    min_size=1, max_size=40))
    def check(pts):
        x = np.array([p[0] for p in pts], dtype=np.int64)
        y = np.array([p[1] for p in pts], dtype=np.int64)
        kept = radial_simplify(x, y, EPS2)
        # brute reference walk
        kx, ky, want = x[0], y[0], [0]
        for i in range(1, len(x)):
            dx, dy = x[i] - kx, y[i] - ky
            if dx * dx + dy * dy >= EPS2:
                want.append(i)
                kx, ky = x[i], y[i]
        assert kept.tolist() == want
        # shipped invariant checker agrees with a brute invariant check
        assert radial_invariant_ok(x, y, kept, EPS2)
        last = 0
        for i in range(1, len(x)):
            if i in want:
                last = i
                continue
            d2 = (x[i] - x[last]) ** 2 + (y[i] - y[last]) ** 2
            assert d2 < EPS2
        # a corrupted kept set must FAIL the shipped checker
        if len(kept) > 1:
            assert not radial_invariant_ok(x, y, kept[1:], EPS2)
        dropped = sorted(set(range(len(x))) - set(want))
        if dropped and len(x) > 1:
            bad = np.sort(np.r_[kept, dropped[:1]])
            assert not radial_invariant_ok(x, y, bad, EPS2)

    check()


def test_hull_diameter_matches_bruteforce():
    """q166's mergeable-hull diameter vs the all-pairs brute maximum."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oma_ray.pipelines.queries import _hull_2d

    @settings(max_examples=80, deadline=None)
    @given(st.lists(st.tuples(st.integers(-10000, 10000),
                              st.integers(-10000, 10000)),
                    min_size=1, max_size=60))
    def check(pts):
        x = np.array([p[0] for p in pts], dtype=np.int64)
        y = np.array([p[1] for p in pts], dtype=np.int64)
        hull = _hull_2d(x, y)
        if len(hull) < 2:
            got = 0
        else:
            dx = hull[:, 0][:, None] - hull[:, 0][None, :]
            dy = hull[:, 1][:, None] - hull[:, 1][None, :]
            got = int((dx * dx + dy * dy).max())
        bx = x[:, None] - x[None, :]
        by = y[:, None] - y[None, :]
        want = int((bx * bx + by * by).max())
        assert got == want

    check()


def test_bit_length_vec_matches_python():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oma_ray.pipelines.queries import _bit_length_vec

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(0, 2**62), min_size=1, max_size=50))
    def check(vals):
        v = np.array(vals, dtype=np.int64)
        got = _bit_length_vec(v)
        for g, w in zip(got.tolist(), vals):
            assert g == int(w).bit_length()

    check()


def test_ipc_shards_deterministic(tmp_path, ray_session):
    """Same data -> byte-identical Arrow IPC shards on rerun."""
    import hashlib

    import pyarrow.parquet as pq
    import ray.data as rd

    from oma_ray.sources.arrowipc import read_ipc, write_ipc

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    sums = []
    for d in ("a", "b"):
        out = str(tmp_path / d)
        write_ipc(rd.from_arrow(t), out)
        names = sorted(p.name for p in (tmp_path / d).iterdir()
                       if p.name.endswith(".arrow"))
        h = hashlib.md5()
        for nm in names:
            h.update(nm.encode())
            h.update((tmp_path / d / nm).read_bytes())
        sums.append(h.hexdigest())
    assert sums[0] == sums[1]
    back = read_ipc(str(tmp_path / "a")).to_pandas()
    want = t.to_pandas()
    assert sorted(back["doc_id"]) == sorted(want["doc_id"])
    m = back.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("doc_id").reset_index(drop=True)
    assert (m["text"] == w["text"]).all()


def test_band_self_pairs_matches_brute(ray_session):
    """Banded theta self-join (resident/ghost bucketing): pair counts and
    summed |diff| per group match the quadratic brute force, including
    values straddling bucket boundaries and exact-band gaps."""
    import ray.data as rd

    from oma_ray.stages.join import band_self_pairs

    rng = np.random.default_rng(11)
    n = 400
    groups = np.array(["g0", "g1", "g2"])[rng.integers(0, 3, n)]
    # cluster values so bands are dense; include exact multiples of band
    vals = (rng.integers(0, 40, n) * 25).astype(np.int64)
    band = 100

    want = {}
    for g in np.unique(groups):
        v = vals[groups == g]
        diff = np.abs(v[:, None] - v[None, :])
        m = np.triu(diff <= band, k=1)
        want[g] = (int(m.sum()), int(diff[m].sum()))

    ds = rd.from_arrow(pa.table({"g": groups, "v": vals})).repartition(7)
    out = (band_self_pairs(ds, "g", "v", band)
           .to_pandas().set_index("g"))
    for g, (np_, sd) in want.items():
        assert int(out.loc[g, "n_pairs"]) == np_, g
        assert int(out.loc[g, "sum_diff"]) == sd, g
    assert len(out) == len(want)


def test_box_overlap_join_with_area_matches_brute(ray_session):
    """with_area=True: every overlapping pair carries the exact geometric
    intersection area (0 for edge-touching), still exactly once."""
    import ray.data as rd

    from oma_ray.stages.geo_join import box_overlap_join

    def boxes(n, seed):
        i = np.arange(n, dtype=np.int64)
        cx = (i * 48271 + seed) % 2_000_000_000 - 1_000_000_000
        cy = (i * 69621 + seed * 3) % 1_000_000_000 - 500_000_000
        hw = 50_000_000 + (i * 104729) % 250_000_000
        hh = 30_000_000 + (i * 7919) % 150_000_000
        return {"box_id": i, "minlon": cx - hw, "maxlon": cx + hw,
                "minlat": cy - hh, "maxlat": cy + hh}

    a, b = boxes(80, 7), boxes(90, 1234567)
    want = {}
    for i in range(80):
        for j in range(90):
            w = min(a["maxlon"][i], b["maxlon"][j]) - max(
                a["minlon"][i], b["minlon"][j])
            h = min(a["maxlat"][i], b["maxlat"][j]) - max(
                a["minlat"][i], b["minlat"][j])
            if w >= 0 and h >= 0:
                want[(i, j)] = int(w) * int(h)
    assert want

    def tab(d):
        return pa.table({k: pa.array(v) for k, v in d.items()})

    out = box_overlap_join(
        rd.from_arrow(tab(a)).repartition(3),
        rd.from_arrow(tab(b)).repartition(4),
        width=64, with_area=True,
    ).to_pandas()
    got = {(r.a_id, r.b_id): r.area for r in out.itertuples()}
    assert got == want


def test_hex_candidate_set_is_sufficient():
    """q235's 3×3 candidate window: the nearest hex-lattice center of any
    point in the world box is always inside the window (so the windowed
    argmin IS the global Voronoi assignment, ties to lower cell id)."""
    A, B = 40_000_000, 34_641_016
    rng = np.random.default_rng(35)
    x = rng.integers(0, 3_600_000_001, 4000).astype(np.int64)
    y = rng.integers(0, 1_800_000_001, 4000).astype(np.int64)

    def windowed(x, y):
        i0, j0 = x // A, y // (2 * B)
        di = np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], dtype=np.int64)
        dj = np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], dtype=np.int64)
        ii = i0[:, None] + di[None, :]
        jj = j0[:, None] + dj[None, :]
        cx = ii * A
        cy = (2 * jj + (ii & 1)) * B
        d2 = (x[:, None] - cx) ** 2 + (y[:, None] - cy) ** 2
        cell = ii * 100_000 + jj
        order = np.argsort(cell, axis=1, kind="stable")
        d2s = np.take_along_axis(d2, order, axis=1)
        cells = np.take_along_axis(cell, order, axis=1)
        pick = np.argmin(d2s, axis=1)
        return cells[np.arange(len(pick)), pick]

    # brute force over a generous ±3 window (superset of any plausible
    # winner: a center 3+ columns/rows away is farther than the in-window
    # best by construction of the pitches)
    def brute(x, y):
        i0, j0 = x // A, y // (2 * B)
        offs = [(i, j) for i in range(-3, 4) for j in range(-3, 4)]
        best_d = None
        best_c = None
        for di, dj in offs:
            ii = i0 + di
            jj = j0 + dj
            cx = ii * A
            cy = (2 * jj + (ii & 1)) * B
            d2 = (x - cx) ** 2 + (y - cy) ** 2
            cell = ii * 100_000 + jj
            if best_d is None:
                best_d, best_c = d2, cell
            else:
                better = (d2 < best_d) | ((d2 == best_d) & (cell < best_c))
                best_d = np.where(better, d2, best_d)
                best_c = np.where(better, cell, best_c)
        return best_c

    got, want = windowed(x, y), brute(x, y)
    assert (got == want).all(), int((got != want).sum())
