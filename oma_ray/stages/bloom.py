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


def _positions(keys: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(keys), n_hashes) bit positions via double hashing: the classic
    Kirsch-Mitzenmacher g_i = h1 + i·h2 construction."""
    h = _mix64(keys.astype(np.int64))
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
    resolves the ref once per worker)."""

    def __init__(self, bits_ref, key_col: str, n_hashes: int = 4):
        import ray

        self.bits = (
            ray.get(bits_ref) if isinstance(bits_ref, ray.ObjectRef) else bits_ref
        )
        self.key_col = key_col
        self.n_hashes = n_hashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(bloom_mask(keys, self.bits, self.n_hashes)))


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
