"""Deduplication operators over a documents/pages table.

All variants follow the same distributed shape (SURVEY.md §2.8 + ray guide):

- exact:    content hash per batch (vectorized) → ``groupby(hash)`` keeping
            the minimum id — a single all-to-all on the 32-byte hash, never
            on the text payload.
- MinHash:  per-doc signature (sketch) → explode to (band, band_hash, id)
            rows → ``groupby`` bands → candidate pairs → signature-estimated
            Jaccard filter.  The shuffle moves signatures (512 B/doc), not
            documents.
- SimHash:  64-bit signature → 4×16-bit band blocking → Hamming-verified
            pairs.
- Embedding near-dup: see stages/knn.py (cosine ≥ τ pairs).

Cluster resolution (keep-first): candidate pairs → connected components via
iterative min-label propagation expressed as Ray groupbys; bounded rounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from oma_ray.cluster import default_partitions
from oma_ray.functions.text import (
    band_hashes_batch,
    minhash_signatures_batch,
    simhash64_batch,
)
from oma_ray.stages.textstage import Md5Hash


def ensure_hash_shuffle() -> None:
    """Keyed ``repartition(keys=...)`` requires the hash-shuffle strategy;
    set it on the process DataContext (the driver harness runs with Ray's
    default sort-based strategy, so library operators that need it opt in
    themselves).

    Also caps the shuffle aggregator-actor pool: each aggregator reserves a
    whole CPU (hash_shuffle.py:1198), and Ray's default cap is 64 — so a
    64-partition exchange on a 32-core node tries to provision 64 actors
    and the pipeline stalls on actor startup + CPU contention.  A pool of
    ~cores/4 actors serves any partition count (partitions are multiplexed
    onto aggregators) while leaving the cores to the map stages.

    The aggregators' LOGICAL CPU reservation must also be fractional: Ray
    2.49 sizes it as min(1, (CPU/2)/partitions) per partition
    (hash_shuffle.py:1007-1020), so a plan with several concurrent
    shuffle operators (multi-join DAGs re-execute shared lineage per
    consumer) can demand more logical CPUs in aggregator actors than the
    node has — actor creation pends and the executor deadlocks (observed:
    a 7-shuffle plan at num_cpus=4 hangs forever).  A small per-partition
    override (0.03) keeps every pool schedulable; aggregators still use
    real CPU when busy — the reservation only gates admission."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    from oma_ray.cluster import cluster_cpus

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = max(2, cluster_cpus() // 4)
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.03


_POOL_WARMED = False


def warm_shuffle_pool() -> None:
    """Session-scoped pre-provisioning of the hash-shuffle worker pool
    (VERDICT r4 #1): aggregators are per-execution actors
    (hash_shuffle.py AggregatorPool.start/shutdown), so what persists
    across jobs is the POOL OF WORKER PROCESSES they run in — and the
    first keyed exchange of a session pays process spawn + imports for
    all of them (measured 10-25 s at 32 cpus against a 3.5 s warm job;
    with this warm, two consecutive fresh-session write-included runs
    land within 1.05x of each other).  Entry points that time or
    correctness-compare jobs call this once after ``ray.init``;
    idempotent per process, no-op if Ray isn't initialised (the library
    never owns a session)."""
    global _POOL_WARMED
    if _POOL_WARMED:
        return
    import ray

    if not ray.is_initialized():
        return
    _POOL_WARMED = True
    import ray.data as rd

    from oma_ray.cluster import default_partitions

    ensure_hash_shuffle()
    n = default_partitions()
    tiny = rd.range(n * 4).map_batches(
        lambda b: pa.table({"k": pa.array(b["id"], type=pa.int64())}),
        batch_format="default",
    )
    (tiny.repartition(n, keys=["k"])
     .map_batches(lambda b: b, batch_format="pyarrow").count())


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                num_partitions: int | None = None):
    """Keep the smallest ``id_col`` per distinct text (md5-keyed).

    Returns (text_md5, <id_col>) — one row per distinct content.  Shape:
    hash per batch (vectorized) → within-batch pre-dedup (combiner) → keyed
    repartition on the 32-byte hash (never the text) → per-block min.
    """
    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()
    hashed = ds.map_batches(Md5Hash(text_col), batch_format="pyarrow")

    def local_min(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return batch
        agg = df.groupby("text_md5", as_index=False)[id_col].min()
        from oma_ray.sources.parquet import from_pandas_clean

        return from_pandas_clean(agg[["text_md5", id_col]])

    return (
        hashed.select_columns(["text_md5", id_col])
        .map_batches(local_min, batch_format="pyarrow")
        .repartition(num_partitions, keys=["text_md5"])
        .map_batches(local_min, batch_format="pyarrow")
    )


class MinHashStage:
    """Append ``minhash:list<uint64>[64]`` per document (one vectorized
    batch kernel — tokenize/hash/permute at C speed, no per-doc loop)."""

    def __init__(self, text_col: str = "text", k: int = 3):
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = minhash_signatures_batch(batch.column(self.text_col), self.k)
        n = len(sigs)
        arr = pa.ListArray.from_arrays(
            pa.array(np.arange(0, 64 * (n + 1), 64, dtype=np.int32)),
            pa.array(sigs.reshape(-1), type=pa.uint64()),
        )
        return batch.append_column("minhash", arr)


def _explode_bands(batch: pa.Table, id_col: str, bands: int) -> pa.Table:
    ids = batch.column(id_col).to_numpy()
    n = len(ids)
    sig_flat = np.asarray(
        batch.column("minhash").combine_chunks().flatten()
        if isinstance(batch.column("minhash"), pa.ChunkedArray)
        else batch.column("minhash").flatten(),
        dtype=np.uint64,
    ).reshape(n, -1)
    bh = band_hashes_batch(sig_flat, bands)
    idx = np.repeat(np.arange(n), bands)
    return pa.table(
        {
            id_col: pa.array(ids[idx], type=pa.int64()),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1), type=pa.int64()),
            "minhash": batch.column("minhash").take(pa.array(idx)),
        }
    )


#: Per-bucket row cap for LSH blocking.  A bucket of b rows emits O(b²)
#: candidate pairs; one degenerate key (e.g. thousands of empty documents
#: all hashing identically) would go quadratic.  Buckets above the cap are
#: dropped and logged — near-dup *pairs* inside a mega-bucket are better
#: handled by exact dedup (identical content) than by pairwise LSH.
MAX_LSH_BUCKET = 512


def _schema_anchor(out, empty: pa.Table | None):
    """Union a 0-row schema-carrying block onto ``out``: Ray's hash shuffle
    emits NO blocks for an empty exchange, so a fully-filtered pipeline
    would otherwise lose its schema (``schema() is None``) and break any
    downstream projection."""
    if empty is None:
        return out
    import ray.data as rd

    return out.union(rd.from_arrow(empty))


def pair_indices(segs: list[tuple[int, int]]) -> tuple[np.ndarray, np.ndarray]:
    """All within-bucket index pairs for the given [s, e) segments, as two
    flat row-index arrays — integer arithmetic only, so a block with
    thousands of tiny buckets costs microseconds, not a pandas slice each."""
    a_list, b_list = [], []
    for s, e in segs:
        a, b = np.triu_indices(e - s, k=1)
        a_list.append(a + s)
        b_list.append(b + s)
    if not a_list:
        z = np.empty(0, dtype=np.int64)
        return z, z
    return np.concatenate(a_list), np.concatenate(b_list)


def _bucketed_block_pairs(ds, key_cols: list[str], pair_fn,
                          num_partitions: int | None = None,
                          max_bucket: int = MAX_LSH_BUCKET,
                          empty: pa.Table | None = None):
    """Hash-partition rows by bucket key (``repartition(keys=..., sort=True)``
    co-locates and sorts each bucket in exactly one block), then emit pairs
    with ONE vectorized ``pair_fn(batch, segs)`` call per block: ``segs``
    are the bucket [start, end) segments, and the pair_fn compares all
    candidate pairs of the whole block in single array ops.  No per-group
    Python tasks (``map_groups`` schedules one call per group) and no
    per-bucket pandas slices (measured 0.76 s/block for ~6k two-row LSH
    buckets before this shape)."""
    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()
    part = ds.repartition(num_partitions, keys=key_cols, sort=True)

    def block_pairs(batch: pa.Table) -> pa.Table:
        import logging

        if not len(batch):
            return pair_fn(None, None)
        # rows arrive sorted by key_cols (repartition(sort=True)); bucket
        # boundary = any key column changing between neighbours
        change = np.zeros(len(batch) - 1, dtype=bool)
        for k in key_cols:
            v = batch.column(k).to_numpy(zero_copy_only=False)
            change |= v[1:] != v[:-1]
        bounds = np.concatenate([[0], np.nonzero(change)[0] + 1, [len(batch)]])
        sizes = bounds[1:] - bounds[:-1]
        dropped = int(((sizes > max_bucket)).sum())
        if dropped:
            logging.getLogger("oma_ray.dedup").warning(
                "LSH: dropped %d oversized bucket(s) (> %d rows) on keys %s",
                dropped, max_bucket, key_cols,
            )
        segs = [
            (int(s), int(e))
            for s, e, n in zip(bounds[:-1], bounds[1:], sizes)
            if 2 <= n <= max_bucket
        ]
        if not segs:
            return pair_fn(None, None)
        return pair_fn(batch, segs)

    return _schema_anchor(
        part.map_batches(block_pairs, batch_format="pyarrow"), empty
    )


def minhash_candidate_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
):
    """MinHash-LSH near-duplicate pairs: (id_a, id_b, est_jaccard), id_a<id_b.

    shingle→minhash per batch, explode to band rows, groupby (band,
    band_hash), pairs within each bucket filtered by signature-estimated
    Jaccard ≥ threshold.  Pair dedup via a final groupby on (id_a, id_b).
    """
    sigs = ds.map_batches(MinHashStage(text_col, k), batch_format="pyarrow")
    bandrows = sigs.select_columns([id_col, "minhash"]).map_batches(
        lambda b: _explode_bands(b, id_col, bands), batch_format="pyarrow"
    )

    def bucket_pairs(batch: pa.Table | None, segs) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "est_jaccard": pa.array([], type=pa.float64()),
            }
        )
        if batch is None:
            return empty
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mh = batch.column("minhash")
        flat = (
            mh.combine_chunks().flatten()
            if isinstance(mh, pa.ChunkedArray) else mh.flatten()
        )
        sig = np.asarray(flat, dtype=np.uint64).reshape(len(batch), -1)
        a_idx, b_idx = pair_indices(segs)
        est = (sig[a_idx] == sig[b_idx]).mean(axis=1)
        keep = est >= threshold
        ia, ib = ids[a_idx[keep]], ids[b_idx[keep]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        m = lo != hi  # guard against duplicate ids within one bucket
        return pa.table(
            {
                "id_a": pa.array(lo[m], type=pa.int64()),
                "id_b": pa.array(hi[m], type=pa.int64()),
                "est_jaccard": pa.array(est[keep][m].round(6), type=pa.float64()),
            }
        )

    pairs = _bucketed_block_pairs(bandrows, ["band", "band_hash"], bucket_pairs)
    # same pair can surface from multiple bands — dedup with the same
    # co-locate-by-key trick (all copies land in one block)
    empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "est_jaccard": pa.array([], type=pa.float64()),
        }
    )
    return _dedup_pairs(pairs, extra_cols={"est_jaccard": "max"}, empty=empty)


def _dedup_pairs(pairs, extra_cols: dict[str, str],
                 num_partitions: int | None = None,
                 empty: pa.Table | None = None):
    """Global pair dedup: co-locate each (id_a, id_b) via keyed repartition
    (no sort needed — the per-block pandas groupby doesn't require sorted
    input, and sorted finalize breaks on the schema-less empty blocks a
    fully-filtered upstream produces), then one groupby per block
    (within-block dedup == global dedup).  ``empty`` fixes the output schema
    when a block carries no rows."""
    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()
    part = pairs.repartition(num_partitions, keys=["id_a", "id_b"])

    def dedup_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return empty if empty is not None else batch
        agg = df.groupby(["id_a", "id_b"], as_index=False).agg(extra_cols)
        from oma_ray.sources.parquet import from_pandas_clean

        return from_pandas_clean(agg)

    return _schema_anchor(
        part.map_batches(dedup_block, batch_format="pyarrow"), empty
    )


class SimHashStage:
    """Append ``simhash:uint64`` per document (vectorized batch kernel)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = simhash64_batch(batch.column(self.text_col))
        return batch.append_column("simhash", pa.array(vals, type=pa.uint64()))


def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3):
    """SimHash near-dup pairs via 4×16-bit band blocking: two docs within
    Hamming distance ≤3 of a 64-bit signature agree exactly on ≥1 of 4
    16-bit bands (pigeonhole), so blocking on each band finds all of them."""
    from oma_ray.functions.text import hamming64

    sigs = ds.map_batches(SimHashStage(text_col), batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        out_id = np.repeat(ids, 4)
        out_band = np.tile(np.arange(4, dtype=np.int32), n)
        shr = np.repeat(sh, 4)
        shift = (np.tile(np.arange(4, dtype=np.uint64), n)) * np.uint64(16)
        out_key = ((shr >> shift) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "band_key": pa.array(out_key, type=pa.int64()),
                "simhash": pa.array(shr, type=pa.uint64()),
            }
        )

    def bucket_pairs(batch: pa.Table | None, segs) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
        if batch is None:
            return empty
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        a, b = pair_indices(segs)
        d = hamming64(sh[a], sh[b])
        keep = d <= max_hamming
        ia, ib = ids[a[keep]], ids[b[keep]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        m = lo != hi  # guard against duplicate ids within one bucket
        return pa.table(
            {
                "id_a": pa.array(lo[m], type=pa.int64()),
                "id_b": pa.array(hi[m], type=pa.int64()),
                "hamming": pa.array(d[keep][m], type=pa.int64()),
            }
        )

    bandrows = sigs.select_columns([id_col, "simhash"]).map_batches(
        explode, batch_format="pyarrow"
    )
    pairs = _bucketed_block_pairs(bandrows, ["band", "band_key"], bucket_pairs)
    empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "hamming": pa.array([], type=pa.int64()),
        }
    )
    return _dedup_pairs(pairs, extra_cols={"hamming": "min"}, empty=empty)


def keep_first_from_pairs(pair_rows: list[dict], all_ids: np.ndarray) -> np.ndarray:
    """Union-find over candidate pairs → surviving (minimum) id per cluster.

    Driver-side: the pair set is the *output* of LSH blocking and is orders
    of magnitude smaller than the corpus; for pathological pair explosions
    the distributed upgrade is iterative min-label propagation (repeat:
    join labels over pairs, take min) — same fixed point.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in pair_rows:
        a, b = find(int(r["id_a"])), find(int(r["id_b"]))
        if a != b:
            if a > b:
                a, b = b, a
            parent[b] = a
    drop = {x for x in parent if find(x) != x}
    return np.array([i for i in all_ids if int(i) not in drop], dtype=np.int64)


# --- edit-distance similarity join (FastSS deletion-neighborhood) ------------

def _lev_le_1(a: str, b: str) -> bool:
    """Exact levenshtein(a, b) <= 1 for a != b (verify kernel)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a+1 chars: one deletion from b must give a
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit_distance_pairs(ds, col: str = "word",
                        num_partitions: int | None = None,
                        max_bucket: int = 256,
                        strict: bool = False):
    """All distinct-string pairs with levenshtein distance ≤ 1 —
    FastSS-style: each word is indexed under itself and each of its
    single-character deletions; two words within distance 1 necessarily
    share a key (equal / deletion / substitution ⇒ common deletion), so
    candidates come from ONE keyed exchange on the deletion keys, are
    verified with the exact kernel per block, and pair-deduped by a second
    (a, b)-keyed exchange (a pair can share several keys).

    Same skeleton as the MinHash/SimHash pair miners: buckets above
    ``max_bucket`` are truncated (logged) so a degenerate key (e.g. every
    word sharing a deletion) cannot go quadratic.  At corpus scale the
    input should already be the DISTINCT vocabulary (one dedup exchange
    upstream); per-batch distinct here only bounds duplicate keys.

    ``strict=True`` (the oracle-checked q58 path) RAISES on any truncation
    instead of logging: a silently-dropped bucket would diverge from the
    exact levenshtein oracle, so dropped coverage must be loud there.
    """
    import pandas as pd

    from oma_ray.cluster import default_partitions
    from oma_ray.sources.parquet import from_pandas_clean

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()

    def keys(batch: pa.Table) -> pa.Table:
        words = pd.unique(
            batch.column(col).to_numpy(zero_copy_only=False)
        )
        ks, ws = [], []
        for w in words:
            ks.append(w)
            ws.append(w)
            for i in range(len(w)):
                ks.append(w[:i] + w[i + 1:])
                ws.append(w)
        return pa.table(
            {"key": pa.array(ks, type=pa.string()),
             col: pa.array(ws, type=pa.string())}
        )

    part = ds.map_batches(keys, batch_format="pyarrow").repartition(
        num_partitions, keys=["key"]
    )

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out_a, out_b = [], []
        if len(df):
            df = df.drop_duplicates()
            for _key, grp in df.groupby("key"):
                ws = sorted(grp[col].unique())
                if len(ws) > max_bucket:
                    if strict:
                        raise ValueError(
                            f"edit_distance_pairs: bucket {_key!r} has "
                            f"{len(ws)} words > max_bucket={max_bucket}; "
                            "refusing to truncate in strict (oracle-checked)"
                            " mode — raise max_bucket or pre-filter the key"
                        )
                    import logging

                    logging.getLogger(__name__).warning(
                        "edit_distance_pairs: truncating bucket %r (%d words)",
                        _key, len(ws),
                    )
                    ws = ws[:max_bucket]
                for i in range(len(ws)):
                    for j in range(i + 1, len(ws)):
                        if _lev_le_1(ws[i], ws[j]):
                            out_a.append(ws[i])
                            out_b.append(ws[j])
        return pa.table(
            {"a": pa.array(out_a, type=pa.string()),
             "b": pa.array(out_b, type=pa.string())}
        )

    pairs = part.map_batches(bucket_pairs, batch_format="pyarrow").repartition(
        num_partitions, keys=["a", "b"]
    )

    def distinct(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return from_pandas_clean(df)

    return _schema_anchor(
        pairs.map_batches(distinct, batch_format="pyarrow"),
        pa.table(
            {"a": pa.array([], type=pa.string()),
             "b": pa.array([], type=pa.string())}
        ),
    )


def keep_best_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                    rank_col: str = "rank", carry: tuple = (),
                    num_partitions: int | None = None):
    """Canonical selection: keep the BEST duplicate per distinct text —
    min ``(rank_col, id_col)`` per md5 group — rather than exact_dedup's
    keep-first.  ``carry`` columns ride along with the winner.  Shape is
    exact_dedup's: vectorized md5 per batch → within-batch argmin
    (combiner) → ONE keyed exchange on the 32-B hash (text + carried
    payload of the per-batch winners only) → per-block argmin."""
    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()
    cols = ["text_md5", rank_col, id_col, *carry]
    hashed = ds.map_batches(Md5Hash(text_col), batch_format="pyarrow")

    def local_best(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df) or "text_md5" not in df.columns:
            return batch
        from oma_ray.sources.parquet import from_pandas_clean

        best = (df.sort_values(["text_md5", rank_col, id_col],
                               kind="stable")
                .drop_duplicates("text_md5"))
        return from_pandas_clean(best[cols])

    return (hashed.select_columns(cols)
            .map_batches(local_best, batch_format="pyarrow")
            .repartition(num_partitions, keys=["text_md5"])
            .map_batches(local_best, batch_format="pyarrow"))
