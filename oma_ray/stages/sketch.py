"""Mergeable sketches: HyperLogLog distinct counting, Misra-Gries heavy
hitters, and a KLL-style quantile sketch (engine additions — the reference
counts only exactly and in-heap; SURVEY §2.6).  At planet scale a
COUNT(DISTINCT) is a full exchange of every distinct value; an HLL register
vector is a fixed 2^p bytes per group, mergeable with an elementwise max,
so cardinality estimation moves O(groups) regardless of input size.

Layout (Flajolet et al. 2007, the standard 64-bit variant):
  hash → top ``p`` bits pick a register, rank = leading-zero count of the
  remaining ``64−p`` bits + 1, register keeps the max rank.  Estimate is
  the bias-corrected harmonic mean, with linear counting for the small
  range.  With p=12 (4096 one-byte registers) the standard error is
  ~1.04/√4096 ≈ 1.6%.

Partials are computed per batch with ``np.maximum.at`` over a (groups ×
registers) matrix, merged tree-style through a keyed exchange — the same
shape as queries._grouped_sums, with max instead of sum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from oma_ray.stages.knn import _mix64


def _ranks(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash — vectorized leading-zero count via
    frexp (exact: the low 64−p ≤ 52 bits fit a double's mantissa)."""
    reg = (hashes >> np.uint64(64 - p)).astype(np.int64)
    low = (hashes & np.uint64((1 << (64 - p)) - 1)).astype(np.float64)
    _, exp = np.frexp(low)  # bit_length of the low part (0 for low == 0)
    rank = (64 - p + 1 - exp).astype(np.uint8)
    return reg, rank


def hll_partial(values: np.ndarray, group_ids: np.ndarray, n_groups: int,
                p: int = 12) -> np.ndarray:
    """(n_groups, 2^p) uint8 register matrix for int64 ``values`` assigned
    to ``group_ids`` (0..n_groups-1)."""
    if p > 12:
        raise ValueError("p > 12 breaks the exact-frexp rank path (64-p < 52)")
    m = 1 << p
    regs = np.zeros((n_groups, m), dtype=np.uint8)
    reg, rank = _ranks(_mix64(values), p)
    np.maximum.at(regs, (group_ids, reg), rank)
    return regs


def hll_estimate(regs: np.ndarray, p: int = 12) -> np.ndarray:
    """Cardinality estimates for a (groups, 2^p) register matrix."""
    m = 1 << p
    regs = regs.astype(np.float64)
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.power(2.0, -regs).sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (raw < 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        linear = m * np.log(m / np.maximum(zeros, 1))
    est = np.where(small, linear, raw)
    return np.rint(est).astype(np.int64)


def approx_ndistinct(ds, keys: list[str], val_col: str, p: int = 12,
                     num_partitions: int | None = None):
    """Approximate per-group COUNT(DISTINCT val_col) as a Dataset of
    ``keys + [approx_n]``.  Register vectors ride the exchange as
    fixed-size binary — 2^p bytes per group per upstream batch."""
    from oma_ray.cluster import default_partitions
    from oma_ray.sources.parquet import from_pandas_clean
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = max(1, default_partitions() // 2)
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys).to_pandas()
        gid, uniq = pd.factorize(
            pd.MultiIndex.from_frame(df) if len(keys) > 1 else df[keys[0]]
        )
        vals = batch.column(val_col).to_numpy(zero_copy_only=False)
        regs = hll_partial(vals.astype(np.int64), gid, len(uniq), p)
        out = (
            pd.DataFrame(list(uniq), columns=keys)
            if len(keys) > 1
            else pd.DataFrame({keys[0]: np.asarray(uniq)})
        )
        out["regs"] = [r.tobytes() for r in regs]
        return from_pandas_clean(out)

    def merge(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return batch
        out_keys, out_est = [], []
        for gkey, g in df.groupby(keys, sort=False):
            stack = np.frombuffer(
                b"".join(g["regs"].tolist()), dtype=np.uint8
            ).reshape(len(g), m)
            merged = stack.max(axis=0)[None, :]
            out_keys.append(gkey if isinstance(gkey, tuple) else (gkey,))
            out_est.append(hll_estimate(merged, p)[0])
        out = pd.DataFrame(out_keys, columns=keys)
        out["approx_n"] = np.asarray(out_est, dtype=np.int64)
        return from_pandas_clean(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(num_partitions, keys=keys)
        .map_batches(merge, batch_format="pyarrow")
    )


# --- Misra-Gries heavy hitters ----------------------------------------------

def mg_partial(values: np.ndarray, k: int) -> pd.Series:
    """Misra-Gries summary of one batch: value → lower-bound count, at most
    ``k`` entries.  Guarantee: any value with true frequency > n/(k+1) is
    present, and every kept count undercounts by at most (n − Σcounts)/(k+1).
    Per batch this is one C-speed value_counts + a decrement step."""
    vc = pd.Series(values).value_counts()
    if len(vc) <= k:
        return vc
    # decrement by the (k+1)-th largest count: all smaller entries vanish,
    # survivors keep (count − dec) — the classic batched MG decrement
    dec = int(vc.iloc[k])
    vc = vc.iloc[:k] - dec
    return vc[vc > 0]


def mg_merge(parts: list[pd.Series], k: int) -> pd.Series:
    """Merge MG summaries (Agarwal et al. 2013 mergeable-summaries rule):
    sum counts, then decrement by the (k+1)-th largest so at most ``k``
    survive.  Error bounds add across merges."""
    total = pd.concat(parts).groupby(level=0).sum().sort_values(ascending=False)
    if len(total) <= k:
        return total
    dec = int(total.iloc[k])
    total = total.iloc[:k] - dec
    return total[total > 0]


def heavy_hitters(ds, val_col: str, k: int = 64,
                  num_partitions: int | None = None):
    """Approximate top-k frequent values of a column as a Dataset of
    (value, min_count): per-batch MG summaries (≤ k rows each) ride ONE
    value-keyed exchange where same-value entries sum, then a single-block
    merge applies the global decrement.  Counts are LOWER bounds; any value
    with frequency above n/(k+1) of the corpus is guaranteed present.
    Exchange moves O(batches × k) rows, never the corpus."""
    from oma_ray.sources.parquet import from_pandas_clean
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = 4

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(val_col).to_numpy(zero_copy_only=False)
        s = mg_partial(vals, k)
        return from_pandas_clean(
            pd.DataFrame({"value": s.index.to_numpy(), "cnt": s.to_numpy()})
        )

    def presum(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return batch
        out = df.groupby("value", as_index=False)["cnt"].sum()
        return from_pandas_clean(out)

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return batch
        s = mg_merge(
            [df.set_index("value")["cnt"]], k
        ).astype(np.int64)
        return from_pandas_clean(
            pd.DataFrame({"value": s.index.to_numpy(), "min_count": s.to_numpy()})
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(num_partitions, keys=["value"])
        .map_batches(presum, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow")
    )

# --- KLL-style quantile sketch ----------------------------------------------

def _kll_compact_once(levels: list[np.ndarray], i: int, k: int,
                      flip: list[int]) -> None:
    """Compact level ``i`` (weight 2^i items) into level ``i+1``: sort,
    keep every other item (alternating start offset per compaction so the
    kept set is unbiased over repeated compactions), odd leftover stays.
    Each compaction perturbs any rank by at most 2^i — the standard
    compactor-stack argument (Karnin, Lang & Liberty 2016, simplified to a
    uniform per-level capacity: with ≤ n/(k·2^i) compactions at level i the
    total relative rank error is ≤ levels/(2k))."""
    lv = np.sort(levels[i])
    if len(lv) % 2:
        keep_back, lv = lv[:1], lv[1:]
    else:
        keep_back = lv[:0]
    off = flip[i] & 1
    flip[i] += 1
    promoted = lv[off::2]
    levels[i] = keep_back
    if i + 1 == len(levels):
        levels.append(promoted)
        flip.append(0)
    else:
        levels[i + 1] = np.concatenate([levels[i + 1], promoted])


class KLLSketch:
    """Mergeable quantile sketch over float64 values.

    ``levels[i]`` holds items of weight ``2^i``, each level capped at ``k``
    items; overflow sorts + halves into the level above.  Size is
    O(k·log(n/k)) regardless of input; relative rank error ≤ levels/(2k)
    (≈1.2% at k=512, n=10^9), and merging sketches is concatenation +
    re-compaction, so partials ride a keyed exchange as small blobs.
    Compaction offsets alternate deterministically — same input, same
    sketch, reproducible tests."""

    def __init__(self, k: int = 512):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._flip: list[int] = [0]

    def _settle(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                _kll_compact_once(self.levels, i, self.k, self._flip)
            else:
                i += 1

    def insert(self, values: np.ndarray) -> "KLLSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._settle()
        return self

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        for i, items in enumerate(other.levels):
            while i >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self._flip.append(0)
            self.levels[i] = np.concatenate([self.levels[i], items])
        self._settle()
        return self

    def weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate(self.levels) if self.levels else np.empty(0)
        wts = np.concatenate(
            [np.full(len(lv), 1 << i, dtype=np.int64)
             for i, lv in enumerate(self.levels)]
        ) if self.levels else np.empty(0, dtype=np.int64)
        return vals, wts

    def quantiles(self, qs) -> np.ndarray:
        """Value at each quantile q: the first item whose cumulative weight
        exceeds q·(W−1) in value order (= numpy 'lower' interpolation on
        the weighted multiset)."""
        vals, wts = self.weighted_items()
        if not len(vals):
            return np.full(len(np.atleast_1d(qs)), np.nan)
        order = np.argsort(vals, kind="mergesort")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        targets = np.asarray(qs, dtype=np.float64) * (cum[-1] - 1)
        idx = np.searchsorted(cum, targets, side="right")
        return vals[np.minimum(idx, len(vals) - 1)]

    def to_bytes(self) -> bytes:
        import struct

        parts = [struct.pack("<ii", self.k, len(self.levels))]
        for lv in self.levels:
            parts.append(struct.pack("<i", len(lv)))
            parts.append(np.ascontiguousarray(lv, dtype=np.float64).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLLSketch":
        import struct

        k, n_levels = struct.unpack_from("<ii", blob, 0)
        off = 8
        s = cls(k)
        s.levels, s._flip = [], []
        for _ in range(n_levels):
            (n,) = struct.unpack_from("<i", blob, off)
            off += 4
            s.levels.append(
                np.frombuffer(blob, dtype=np.float64, count=n, offset=off
                              ).copy()
            )
            s._flip.append(0)
            off += 8 * n
        if not s.levels:
            s.levels, s._flip = [np.empty(0, dtype=np.float64)], [0]
        return s


def grouped_approx_quantiles(ds, keys: list[str], val_col: str,
                             qs: list[float], k: int = 512,
                             num_partitions: int | None = None):
    """Per-group approximate quantiles as a Dataset of
    ``keys + [p<q> ...]`` (float64): per-batch KLL partials (one
    O(k·log) blob per group per batch) ride ONE keyed exchange and merge
    per group — the corpus itself never shuffles, unlike the exact
    value-count path (stages/quantile.py) whose exchange grows with the
    number of distinct values."""
    from oma_ray.cluster import default_partitions
    from oma_ray.sources.parquet import from_pandas_clean
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = max(1, default_partitions() // 2)
    qcols = [f"p{int(round(q * 100)):02d}" for q in qs]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys).to_pandas()
        gid, uniq = pd.factorize(
            pd.MultiIndex.from_frame(df) if len(keys) > 1 else df[keys[0]]
        )
        vals = batch.column(val_col).to_numpy(zero_copy_only=False)
        blobs = []
        for g in range(len(uniq)):
            blobs.append(KLLSketch(k).insert(vals[gid == g]).to_bytes())
        out = (
            pd.DataFrame(list(uniq), columns=keys)
            if len(keys) > 1
            else pd.DataFrame({keys[0]: np.asarray(uniq)})
        )
        out["sketch"] = blobs
        return from_pandas_clean(out)

    def merge(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return batch
        rows_keys, rows_q = [], []
        for gkey, g in df.groupby(keys, sort=False):
            sk = KLLSketch(k)
            for blob in g["sketch"]:
                sk.merge(KLLSketch.from_bytes(blob))
            rows_keys.append(gkey if isinstance(gkey, tuple) else (gkey,))
            rows_q.append(sk.quantiles(qs))
        out = pd.DataFrame(rows_keys, columns=keys)
        for j, c in enumerate(qcols):
            out[c] = np.asarray([r[j] for r in rows_q], dtype=np.float64)
        return from_pandas_clean(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(num_partitions, keys=keys)
        .map_batches(merge, batch_format="pyarrow")
    )
