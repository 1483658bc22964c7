"""Curation-stage tests: window explode parity vs a naive reference,
decontamination / paragraph-dedup / repetition brute-force parity,
bloom anti-join exactness under a deliberately tiny (high-FP) filter,
and mix-to-budget rate math."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from oma_ray.stages.curation import (
    _pair_distinct,
    decontaminate_ngrams,
    paragraph_dedup_stats,
    repetition_stats,
    window_explode,
)


def _naive_windows(texts, ids, width, stride, full_only):
    rows = []
    for i, t in zip(ids, texts):
        toks = t.split()  # inputs below have no leading/trailing whitespace
        if full_only:
            n = 0 if len(toks) < width else (len(toks) - width) // stride + 1
        else:
            n = -(-len(toks) // width)
        for w in range(n):
            s = w * stride
            rows.append((i, w, " ".join(toks[s:s + width])))
    return rows


WORDS = np.array(list("abcdefgh"))


def _corpus(rng, n_docs, max_len=40):
    texts, ids = [], []
    for i in range(n_docs):
        ln = int(rng.integers(1, max_len))
        texts.append(" ".join(rng.choice(WORDS, ln)))
        ids.append(i * 7 + 3)  # non-contiguous, non-zero-based ids
    return texts, ids


@pytest.mark.parametrize("width,stride,full_only", [
    (8, 1, True), (3, 1, True), (16, 16, False), (5, 5, False),
])
def test_window_explode_matches_naive(width, stride, full_only):
    rng = np.random.default_rng(7)
    texts, ids = _corpus(rng, 50)
    batch = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "text": pa.array(texts)})
    out = window_explode(batch, text_col="text", id_col="doc_id",
                         width=width, stride=stride, full_only=full_only)
    got = list(zip(out.column("doc_id").to_pylist(),
                   out.column("win_idx").to_pylist(),
                   out.column("gram").to_pylist()))
    assert got == _naive_windows(texts, ids, width, stride, full_only)


def test_window_explode_empty_and_short_docs():
    batch = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                      "text": pa.array(["a b", "x"])})
    out = window_explode(batch, text_col="text", id_col="doc_id",
                         width=8, stride=1, full_only=True)
    assert out.num_rows == 0  # both docs shorter than the gram width
    out = window_explode(batch.slice(0, 0), text_col="text",
                         id_col="doc_id", width=4, stride=4,
                         full_only=False)
    assert out.num_rows == 0 and out.column_names == ["doc_id", "win_idx",
                                                      "gram"]


def test_pair_distinct_keeps_one_row_per_pair():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 5, 200)
    b = rng.integers(0, 4, 200)
    mask = _pair_distinct(a, b)
    kept = set(zip(a[mask], b[mask]))
    assert kept == set(zip(a, b))
    assert mask.sum() == len(kept)


def _brute_decontaminate(texts, ids, bench_pred, n):
    grams = {}
    for i, t in zip(ids, texts):
        toks = t.split()
        grams[i] = {" ".join(toks[s:s + n])
                    for s in range(max(0, len(toks) - n + 1))}
    bench = set().union(*(grams[i] for i in ids if bench_pred(i)))
    out = {}
    for i in ids:
        if bench_pred(i):
            continue
        hits = len(grams[i] & bench)
        if hits:
            out[i] = hits
    return out


def test_decontaminate_matches_brute(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    # short vocab + short grams → real cross-doc collisions
    texts, ids = _corpus(rng, 120, max_len=25)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                 "text": pa.array(texts)})).repartition(6)
    got = {r["doc_id"]: r["n_hits"]
           for r in decontaminate_ngrams(ds, lambda x: x % 5 == 0,
                                         n=3, num_partitions=4).take_all()}
    want = _brute_decontaminate(texts, ids, lambda i: i % 5 == 0, 3)
    assert got == want and len(want) > 5  # the fixture must actually bind


def test_paragraph_dedup_matches_brute(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(13)
    texts, ids = _corpus(rng, 40, max_len=30)
    # duplicate a third of the docs under new higher ids
    dup_ids = [max(ids) + 1 + k for k in range(0, len(ids), 3)]
    texts2 = texts + [texts[k] for k in range(0, len(ids), 3)]
    ids2 = ids + dup_ids
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids2, type=pa.int64()),
                                 "text": pa.array(texts2)})).repartition(5)
    got = {r["doc_id"]: (r["n_paras"], r["n_kept"])
           for r in paragraph_dedup_stats(ds, width=4,
                                          num_partitions=4).take_all()}

    paras = _naive_windows(texts2, ids2, 4, 4, False)
    first = {}
    for i, w, p in sorted(paras):
        first.setdefault(p, (i, w))
    want = {}
    for i, w, p in paras:
        n, k = want.get(i, (0, 0))
        want[i] = (n + 1, k + (first[p] == (i, w)))
    assert got == want
    # every duplicated doc must keep 0 paragraphs (its originals win)
    assert all(got[d][1] == 0 for d in dup_ids)


def test_repetition_stats_matches_brute(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(17)
    texts, ids = _corpus(rng, 80, max_len=35)
    # descending ids exercise the contiguity (not np.unique) segmenting
    ids = ids[::-1]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                 "text": pa.array(texts)})).repartition(4)
    got = {r["doc_id"]: (r["n_grams"], r["n_distinct"], r["dup_permille"])
           for r in repetition_stats(ds, n=2).take_all()}
    want = {}
    for i, t in zip(ids, texts):
        toks = t.split()
        grams = [" ".join(toks[s:s + 2]) for s in range(len(toks) - 1)]
        if not grams:
            continue
        ng, nd = len(grams), len(set(grams))
        want[i] = (ng, nd, (ng - nd) * 1000 // ng)
    assert got == want
    assert any(v[2] > 0 for v in want.values())  # repetition must occur


def test_bloom_anti_join_exact_under_forced_false_positives(ray_session):
    import ray.data as rd

    from oma_ray.stages.bloom import bloom_anti_join, bloom_mask, build_bloom

    hosts = np.array([f"h{i}.example" for i in range(400)], dtype=object)
    page_host = hosts[np.arange(2000) % 400]
    pages = rd.from_arrow(pa.table({
        "page_id": pa.array(np.arange(2000), type=pa.int64()),
        "host": pa.array(page_host),
    })).repartition(6)
    blocked = hosts[::5]
    blocklist = rd.from_arrow(pa.table({"host": pa.array(blocked)}))

    # string-keyed bloom: no false negatives even at a tiny filter
    bits = build_bloom(blocklist, "host", n_bits=1 << 8)
    assert bloom_mask(blocked, bits, 4).all()
    fp = bloom_mask(hosts, bits, 4).mean()
    assert fp > 0.3  # the tiny filter MUST false-positive heavily here

    schema = pa.schema([("page_id", pa.int64()), ("host", pa.string())])
    got = (bloom_anti_join(pages, blocklist, "host", page_schema=schema,
                           n_bits=1 << 8, num_partitions=4)
           .to_pandas().sort_values("page_id").reset_index(drop=True))
    keep = ~pd.Series(page_host).isin(set(blocked))
    want = pd.DataFrame({
        "page_id": np.arange(2000)[keep.to_numpy()],
        "host": page_host[keep.to_numpy()],
    }).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["page_id", "host"]], want)


def test_mix_to_budget_rates_and_predicate(ray_session):
    import ray.data as rd

    from oma_ray.stages.sample import _hash32, mix_to_budget

    rng = np.random.default_rng(19)
    n = 3000
    src = np.array([f"s{i % 6}" for i in range(n)], dtype=object)
    w = rng.integers(10, 200, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64) * 13
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids), "source": pa.array(src),
        "n_chars": pa.array(w),
    })).repartition(8)
    budget = 5000
    out = mix_to_budget(ds, "source", "doc_id", "n_chars", budget,
                        num_partitions=4).to_pandas()

    tot = pd.DataFrame({"source": src, "w": w}).groupby("source")["w"].sum()
    rates = {s: min(1000, budget * 1000 // int(t)) for s, t in tot.items()}
    h = _hash32(ids, 2654435761) % 1000
    keep = h < np.array([rates[s] for s in src])
    want = pd.DataFrame({"doc_id": ids[keep], "source": src[keep],
                         "n_chars": w[keep],
                         "rate_permille": [rates[s] for s in src[keep]]})
    got = out.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "source", "n_chars", "rate_permille"]],
        want.astype({"rate_permille": np.int64}),
    )
    # the cap must genuinely bind (some source sampled below 100%)
    assert any(v < 1000 for v in rates.values())


def test_gram_doc_freq_matches_brute(ray_session):
    import ray.data as rd

    from oma_ray.stages.curation import gram_doc_freq

    rng = np.random.default_rng(23)
    texts, ids = _corpus(rng, 60, max_len=20)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                 "text": pa.array(texts)})).repartition(5)
    got = {r["gram"]: r["doc_freq"]
           for r in gram_doc_freq(ds, n=2, min_docs=6,
                                  num_partitions=4).take_all()}
    from collections import Counter

    df = Counter()
    for t in texts:
        toks = t.split()
        df.update({" ".join(toks[s:s + 2]) for s in range(len(toks) - 1)})
    want = {g: c for g, c in df.items() if c >= 6}
    assert got == want and len(want) > 3  # threshold must actually select
