"""Bloom-filter semi-join prefilter (engine addition — SURVEY §2.6; the
reference's only membership structure is the in-RAM reunify map).

At fact-table scale the expensive part of ``small ⋈ huge`` is exchanging
the huge side.  A Bloom filter built over the small side's keys is a few
MB of mergeable bits: broadcast once (``ray.put``), it filters the fact
side batch-by-batch with zero exchanges — false positives only, so
``bloom_semi_join`` (prefilter + exact hash join on the survivors) stays
EXACT while the exchange moves only the matching fraction.

Construction is itself distributed and pre-aggregated: each batch emits
its DISTINCT bit positions (≤ keys×k ints, not a bit array per batch),
one non-keyed collapse dedups them, and the driver packs the final bit
array (n_bits/8 bytes — the canonical small result).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from oma_ray.stages.knn import _mix64


def _as_hash_keys(keys: np.ndarray) -> np.ndarray:
    """Integer keys pass through; string/object keys get one vectorized
    64-bit content hash (``pd.util.hash_array``) so the same bloom
    machinery serves host/url/gram columns."""
    if keys.dtype.kind in "iu":
        return keys.astype(np.int64)
    import pandas as pd

    return pd.util.hash_array(np.asarray(keys, dtype=object)).view(np.int64)


def _positions(keys: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(keys), n_hashes) bit positions via double hashing: the classic
    Kirsch-Mitzenmacher g_i = h1 + i·h2 construction."""
    h = _mix64(_as_hash_keys(keys))
    h1 = (h % np.uint64(n_bits)).astype(np.int64)
    h2 = ((h >> np.uint64(33)) | np.uint64(1)).astype(np.int64) % n_bits
    i = np.arange(n_hashes, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % n_bits


def build_bloom(ds, key_col: str, n_bits: int = 1 << 23,
                n_hashes: int = 4) -> np.ndarray:
    """Packed uint8 bit array over ``ds[key_col]`` (default 1 MiB / 8M bits:
    ~2.3% false positives at 1M keys)."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        pos = np.unique(_positions(keys, n_bits, n_hashes))
        return pa.table({"pos": pa.array(pos, type=pa.int64())})

    def collapse(batch: pa.Table) -> pa.Table:
        pos = np.unique(batch.column("pos").to_numpy(zero_copy_only=False))
        return pa.table({"pos": pa.array(pos, type=pa.int64())})

    pos = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(collapse, batch_format="pyarrow")
        .to_pandas()["pos"]
        .to_numpy()
    )
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
    return bits


def bloom_mask(keys: np.ndarray, bits: np.ndarray, n_hashes: int) -> np.ndarray:
    """True where ALL k positions are set — no false negatives."""
    n_bits = len(bits) * 8
    pos = _positions(keys, n_bits, n_hashes)
    hit = (bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
    return hit.all(axis=1)


class BloomFilterStage:
    """Per-batch prefilter against a broadcast bloom (task-cache friendly:
    resolves the ref once per worker).  ``keep_members=False`` inverts the
    mask (keep only the definitely-NOT-members — the anti-join fast
    path)."""

    def __init__(self, bits_ref, key_col: str, n_hashes: int = 4,
                 keep_members: bool = True):
        import ray

        self.bits = (
            ray.get(bits_ref) if isinstance(bits_ref, ray.ObjectRef) else bits_ref
        )
        self.key_col = key_col
        self.n_hashes = n_hashes
        self.keep_members = keep_members

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False)
        mask = bloom_mask(keys, self.bits, self.n_hashes)
        return batch.filter(pa.array(mask if self.keep_members else ~mask))


def bloom_semi_join(left, right, on: str, right_on: str | None = None,
                    n_bits: int = 1 << 23, n_hashes: int = 4,
                    est_bytes: int | None = None, **join_kwargs):
    """EXACT inner join with a bloom prefilter on the left: right keys build
    the filter, the left side drops non-members batch-locally (zero
    exchange), false positives die in the exact ``hash_join`` that follows —
    whose exchange now moves only ~match-fraction of the left side.  Right
    side must be re-consumable (a read or materialized dataset: it is
    executed twice — once for bits, once for the join)."""
    import ray

    from oma_ray.stages.join import hash_join
    from oma_ray.stages.taskcache import CachedStage

    bits = build_bloom(right, right_on or on, n_bits, n_hashes)
    bref = ray.put(bits)
    pre = left.map_batches(
        CachedStage(BloomFilterStage, bref, on, n_hashes),
        batch_format="pyarrow",
    )
    return hash_join(pre, right, on, right_on=right_on,
                     est_bytes=est_bytes, **join_kwargs)


def bloom_anti_join(pages, blocklist, key_col: str, *,
                    page_schema: "pa.Schema | None" = None,
                    n_bits: int = 1 << 23, n_hashes: int = 4,
                    num_partitions: int | None = None):
    """EXACT anti-semijoin ``pages ⋉̸ blocklist`` — the web-crawl blocklist
    shape: drop every page whose ``key_col`` (e.g. host) appears in a
    blocklist too large to broadcast as an exact hash set.

    The blocklist folds into a bloom (``build_bloom`` — per-block DISTINCT
    bit positions, one collapse, driver packs ``n_bits/8`` bytes) and
    broadcasts once per session; pages then split on the bloom test:

    - bloom-NEGATIVE rows are *definitely* unblocked (no false negatives)
      and pass straight through — zero shuffle for ~99% of the corpus at a
      realistic false-positive rate;
    - bloom-POSITIVE rows (true hits + false positives) are the only rows
      paying a keyed exchange: a tagged union with the blocklist
      co-locates each candidate key with the authoritative entries and an
      exact in-block set test rescues the false positives.

    The bloom only ROUTES rows, never decides membership, so the output
    is value-exact at any filter size (tests force a tiny filter to prove
    it).  ``page_schema``: pass it when ``pages`` is a transform chain
    (same convention as join.py / pip.py — ``.schema()`` on a lazy chain
    executes a block).

    Note the two consumers of ``pages``: Ray re-executes the upstream
    chain once per consumer; at production scale the negative stream
    feeds the sink directly while the positive stream (a tiny fraction)
    re-reads only its key column."""
    import hashlib

    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import ensure_hash_shuffle
    from oma_ray.stages.taskcache import CachedStage, broadcast_once

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()
    bits = build_bloom(blocklist, key_col, n_bits, n_hashes)
    digest = hashlib.sha1(bits.tobytes()).hexdigest()[:16]
    ref = broadcast_once(f"bloom:{key_col}:{digest}", lambda: bits)

    schema = page_schema if page_schema is not None else pages.schema()
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))

    def tag_block(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch.column(key_col)}
        for name in names:
            if name != key_col:
                cols[name] = pa.nulls(batch.num_rows, type=types[name])
        cols["_blocked"] = pa.array(np.ones(batch.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_page(batch: pa.Table) -> pa.Table:
        cols = {name: batch.column(name) for name in batch.column_names}
        cols["_blocked"] = pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        return pa.table(cols)

    empty = pa.table({name: pa.array([], type=types[name]) for name in names})

    def confirm(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or key_col not in batch.column_names:
            return empty
        import pandas as pd

        df = batch.to_pandas()
        blocked = set(df.loc[df["_blocked"] == 1, key_col])
        keep = df[(df["_blocked"] == 0) & ~df[key_col].isin(blocked)]
        return pa.table({name: pa.array(keep[name].to_numpy(),
                                        type=types[name])
                         for name in names})

    neg = pages.map_batches(
        CachedStage(BloomFilterStage, ref, key_col, n_hashes, False),
        batch_format="pyarrow",
    )
    pos = (
        pages.map_batches(
            CachedStage(BloomFilterStage, ref, key_col, n_hashes, True),
            batch_format="pyarrow",
        )
        .map_batches(tag_page, batch_format="pyarrow")
        .union(blocklist.map_batches(tag_block, batch_format="pyarrow"))
        .repartition(num_partitions, keys=[key_col])
        .map_batches(confirm, batch_format="pyarrow")
    )
    return neg.union(pos)
