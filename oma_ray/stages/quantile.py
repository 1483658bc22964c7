"""Exact distributed grouped quantiles via value-count histograms (engine
addition — the reference computes no order statistics; SURVEY §2.6).

Strategy: per-batch (key, value) → count partials, keyed exchange on the
GROUP key moving O(groups × distinct-values) rows, then an exact selection
over each group's sorted histogram.  This is exact whenever the value
domain's distinct-count is bounded (quantities, prices in cents, durations
in ms, token counts — the common telemetry shapes); for genuinely unbounded
real domains, quantize first or use sketch.approx_ndistinct-style bounds —
the histogram the exchange moves must stay small, and we log nothing
silently: the histogram IS the full distribution, so the result is exact,
only the exchange size grows with distinct-count.

Selection rule matches ANSI/DuckDB ``quantile_disc``/``percentile_disc``:
the element at 0-based index ``ceil(n·p) − 1`` of the sorted multiset.
``p`` is taken as an exact rational (num, den) so the index is integer
arithmetic — no float-rounding divergence from the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def disc_index(n: int, num: int, den: int) -> int:
    """0-based ``quantile_disc`` index: ceil(n·num/den) − 1, integers only."""
    return (n * num + den - 1) // den - 1


def grouped_quantiles(ds, keys: list[str], val_col: str,
                      quantiles: list[tuple[str, int, int]],
                      num_partitions: int | None = None):
    """Exact per-group discrete quantiles of an integer column.

    ``quantiles`` is a list of (output_name, num, den) — e.g.
    ``[("median_c", 1, 2), ("p90_c", 9, 10)]``.  Returns a Dataset with
    ``keys + [n] + [name for name, _, _ in quantiles]`` (n = group size).
    """
    from oma_ray.cluster import default_partitions
    from oma_ray.sources.parquet import from_pandas_clean
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = max(1, default_partitions() // 2)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + [val_col]).to_pandas()
        df["cnt"] = np.int64(1)
        return from_pandas_clean(
            df.groupby(keys + [val_col], as_index=False)["cnt"].sum()
        )

    def select(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return batch
        # merge histogram partials from different upstream batches, then a
        # fully-vectorized per-group selection: the global cumulative count
        # is nondecreasing, and each group's target rank lands inside its
        # own segment, so ONE searchsorted answers every group at once.
        hist = df.groupby(keys + [val_col], as_index=False)["cnt"].sum()
        hist = hist.sort_values(keys + [val_col], kind="mergesort")
        gid = hist.groupby(keys, sort=False).ngroup().to_numpy()
        cnt = hist["cnt"].to_numpy()
        vals = hist[val_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        cum = cnt.cumsum()
        before = np.r_[0, cum[:-1]][starts]          # count before each group
        n_g = np.add.reduceat(cnt, starts)           # group sizes
        out = {
            k: hist[k].to_numpy()[starts] for k in keys
        }
        out["n"] = n_g.astype(np.int64)
        for name, num, den in quantiles:
            k_g = (n_g * num + den - 1) // den - 1   # disc_index, vectorized
            idx = np.searchsorted(cum, before + k_g + 1)
            out[name] = vals[idx]
        return from_pandas_clean(pd.DataFrame(out))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(num_partitions, keys=keys)
        .map_batches(select, batch_format="pyarrow")
    )
