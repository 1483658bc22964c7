"""Dedup + text operator tests (sf0.001)."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_exact_dedup_keeps_min_id():
    import ray.data as rd

    from oma_ray.stages.dedup import exact_dedup

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    dup = docs.map_batches(
        lambda b: pa.table(
            {"doc_id": pa.compute.add(b.column("doc_id"), 10_000), "text": b.column("text")}
        ),
        batch_format="pyarrow",
    )
    out = exact_dedup(docs.union(dup)).to_pandas()
    assert len(out) == 500
    assert (out["doc_id"] < 10_000).all()  # survivor is always the original


def test_minhash_finds_planted_near_dups():
    from oma_ray.pipelines.queries import _docs_with_mutants
    from oma_ray.stages.dedup import minhash_candidate_pairs

    pairs = minhash_candidate_pairs(_docs_with_mutants(SF), threshold=0.5).to_pandas()
    planted = {(i, i + 1_000_000) for i in range(0, 500, 5)}
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    # appended-token mutants share almost all shingles — expect near-total recall
    recall = len(planted & found) / len(planted)
    assert recall > 0.95, recall


def test_simhash_banding_complete_vs_bruteforce():
    """4×16-bit banding must find EXACTLY the Hamming≤3 pairs (pigeonhole:
    d≤3 ⇒ some 16-bit band agrees), verified against an all-pairs scan."""
    import pyarrow.parquet as pq

    from oma_ray.functions.text import hamming64, simhash64
    from oma_ray.pipelines.queries import _docs_with_mutants
    from oma_ray.stages.dedup import simhash_pairs

    ds = _docs_with_mutants(SF)
    rows = ds.to_pandas()
    sigs = np.array([simhash64(t) for t in rows["text"]], dtype=np.uint64)
    ids = rows["doc_id"].to_numpy()
    a, b = np.triu_indices(len(ids), k=1)
    d = hamming64(sigs[a], sigs[b])
    keep = d <= 3
    lo = np.minimum(ids[a[keep]], ids[b[keep]])
    hi = np.maximum(ids[a[keep]], ids[b[keep]])
    want = set(zip(lo, hi)) - {(x, x) for x in ids}  # distinct ids only
    want = {(x, y) for x, y in want if x != y}

    pairs = simhash_pairs(ds, max_hamming=3).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert found == want, (len(found), len(want))


def test_keep_first_union_find():
    from oma_ray.stages.dedup import keep_first_from_pairs

    pairs = [
        {"id_a": 1, "id_b": 2},
        {"id_a": 2, "id_b": 3},
        {"id_a": 10, "id_b": 11},
    ]
    out = keep_first_from_pairs(pairs, np.array([1, 2, 3, 4, 10, 11]))
    assert out.tolist() == [1, 4, 10]


def test_knn_matches_full_numpy_oracle():
    import pyarrow.parquet as pq
    import ray.data as rd

    from oma_ray.stages.knn import _normalize, knn_cosine

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = _normalize(np.stack(t["embedding"].to_pylist()).astype(np.float64))
    qids = ids[:3]
    qm = m[:3]
    sims = np.round(m @ qm.T, 9)
    want = {}
    for j, qid in enumerate(qids):
        order = sorted(zip(-sims[:, j], ids), key=lambda x: (x[0], x[1]))
        want[qid] = [i for s, i in order if i != qid][:10]

    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = knn_cosine(ds, qids, np.stack(t["embedding"].to_pylist())[:3], k=10).to_pandas()
    for qid in qids:
        g = got[got["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert g == want[qid], qid


def test_ivf_knn_high_recall_vs_brute():
    import ray.data as rd

    from oma_ray.pipelines.queries import _query_vectors
    from oma_ray.stages.knn import ivf_knn_cosine, knn_cosine

    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids, mat = _query_vectors(SF, 3)
    brute = knn_cosine(ds, ids, mat, k=10).to_pandas()
    approx = ivf_knn_cosine(ds, ids, mat, k=10, n_centroids=8, nprobe=4).to_pandas()
    b = set(zip(brute["query_id"], brute["vec_id"]))
    a = set(zip(approx["query_id"], approx["vec_id"]))
    assert len(a & b) / len(b) >= 0.5  # nprobe=4 of 8 cells


def test_ivf_sample_unbiased_on_sorted_corpus(ray_session):
    """VERDICT r02 next-step #5: on a corpus SORTED by cluster (clustered
    storage), a first-N ``limit`` quantizer sample sees only the leading
    clusters and the centroids collapse there; the hash-Bernoulli sample
    (``id_col`` path) must place a centroid near every cluster."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from oma_ray.stages.knn import _normalize, build_ivf_centroids

    rng = np.random.default_rng(11)
    centers = _normalize(rng.standard_normal((8, 16)) * 10)
    # sorted by cluster: 2000 rows per cluster, cluster 0 first
    vecs = np.concatenate(
        [c + rng.standard_normal((2000, 16)) * 0.02 for c in centers]
    )
    df = pd.DataFrame(
        {"vec_id": np.arange(len(vecs)),
         "embedding": [v.tolist() for v in vecs]}
    )
    ds = rd.from_pandas(df).repartition(16)

    def coverage(cents):
        sims = _normalize(centers) @ cents.T  # (clusters, centroids)
        return (sims.max(axis=1) > 0.95).sum()

    # 16 centroids for 8 clusters — the sqrt-n over-provisioned regime
    biased = build_ivf_centroids(ds, 16, sample_rows=2048)
    unbiased = build_ivf_centroids(
        ds, 16, sample_rows=2048, id_col="vec_id", n_rows=len(vecs)
    )
    assert coverage(unbiased) == 8, coverage(unbiased)
    # the old path demonstrably misses most clusters on this layout
    assert coverage(biased) <= 4, coverage(biased)


def test_text_kernels():
    from oma_ray.functions.text import lang_id, simhash64, token_counts

    arr = pa.array(["Hello, world! foo_bar 12", "the cat and the dog of it"])
    assert token_counts(arr).to_pylist() == [6, 7]
    langs = lang_id(pa.array(["the quick and the dead of it",
                              "der hund und die katze ist da",
                              "xyzzy qwerty"]))
    assert list(langs) == ["en", "de", "und"]
    assert simhash64("a b c") == simhash64("a b c")
    assert simhash64("a b c") != simhash64("x y z")


def test_dup_cell_blocking_bounded_under_clustered_distribution(ray_session):
    """VERDICT r01 #6 done-criterion: under a heavily clustered corpus
    (3 tight clusters of ~700 vectors — the argmax-cell pile-up case the
    sqrt-n expected-size rule misses) the two-level blocking key keeps
    every bucket bounded, so per-bucket pair work stays O(target_cell**2)."""
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    from oma_ray.stages.knn import DupCellAssign, dup_cell_state

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((3, 32)) * 10
    vecs = np.concatenate(
        [c + rng.standard_normal((700, 32)) * 0.05 for c in centers]
    )
    df = pd.DataFrame(
        {"vec_id": np.arange(len(vecs)), "embedding": [v.tolist() for v in vecs]}
    )
    ds = rd.from_pandas(df)
    state = dup_cell_state(ds, n_rows=len(vecs))
    assigner = DupCellAssign(state, "vec_id", "embedding")
    import pyarrow as pa

    cells = []
    for batch in ds.iter_batches(batch_format="pyarrow"):
        cells.append(assigner(batch).column("ivf_cell").to_numpy())
    counts = pd.Series(np.concatenate(cells)).value_counts()
    from oma_ray.stages.dedup import MAX_LSH_BUCKET

    assert counts.max() <= MAX_LSH_BUCKET, counts.head()

    # and exact copies still share a block (blocking can't separate dups)
    dup = assigner(pa.table({
        "vec_id": pa.array([1, 2], type=pa.int64()),
        "embedding": pa.array([list(vecs[0]), list(vecs[0])]),
    }))
    c = dup.column("ivf_cell").to_numpy()
    assert c[0] == c[1]


def test_lsh_knn_recall_vs_brute():
    import ray.data as rd

    from oma_ray.pipelines.queries import _query_vectors
    from oma_ray.stages.knn import knn_cosine, lsh_knn_cosine

    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids, mat = _query_vectors(SF, 3)
    brute = knn_cosine(ds, ids, mat, k=10).to_pandas()
    approx = lsh_knn_cosine(ds, ids, mat, k=10, n_tables=32, n_bits=6).to_pandas()
    b = set(zip(brute["query_id"], brute["vec_id"]))
    a = set(zip(approx["query_id"], approx["vec_id"]))
    assert len(a & b) / len(b) >= 0.5, len(a & b) / len(b)
    # every returned candidate really shares a bucket with its query, and
    # within the candidate set ranks follow exact similarity (no dropped
    # better-ranked candidate): rank 1 must be the best bucket-mate
    assert (approx.groupby("query_id")["rank"].min() == 1).all()


def test_edit_distance_pairs_matches_brute_force():
    import itertools

    import ray.data as rd

    from oma_ray.stages.dedup import _lev_le_1, edit_distance_pairs

    # deterministic vocab with substitutions, deletions, insertions, and
    # far-apart words; spread across blocks
    words = sorted(
        {f"al{i%13}ha{i%7}" for i in range(60)}
        | {"alpha", "alpba", "alph", "xalpha", "beta", "betta", "gamma"}
    )
    t = pa.table({"word": pa.array(words * 2)})  # duplicates must not matter
    out = edit_distance_pairs(rd.from_arrow(t).repartition(5)).to_pandas()
    got = set(zip(out["a"], out["b"]))
    want = {
        (a, b) for a, b in itertools.combinations(words, 2) if _lev_le_1(a, b)
    }
    assert got == want and len(want) > 10
    # scalar kernel vs a reference DP levenshtein on every vocab pair
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    for a, b in itertools.combinations(words, 2):
        assert _lev_le_1(a, b) == (lev(a, b) <= 1), (a, b)
