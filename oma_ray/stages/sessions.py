"""Stream-shaped operators over the events table.

Ray Data has no event-time windows; the engine treats events as a
partitioned log — partition by key (``groupby``), order by ts *within* the
group, window with pandas inside ``map_groups`` (ray guide "streaming-shaped
workloads").  The ordering assumption (per-key, in-group sort) is local to
each group, so no global sort is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sessionize_counts(ds, gap_seconds: int = 1800, user_col: str = "user_id",
                      ts_col: str = "ts"):
    """Per-user session count: a new session starts when the gap to the
    previous event exceeds ``gap_seconds``.  Returns (user_id, n_sessions).

    Ties on ts are gap=0 regardless of ordering, so the result is
    deterministic without a stable tie-break."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64))
        gaps = np.diff(ts) / 1_000_000.0
        n = 1 + int((gaps > gap_seconds).sum())
        return pd.DataFrame({user_col: [g[user_col].iloc[0]], "n_sessions": [n]})

    return ds.groupby(user_col).map_groups(per_user, batch_format="pandas")


def tumbling_window_agg(ds, window_seconds: int = 3600, key_col: str = "event_type",
                        ts_col: str = "ts", value_col: str = "value"):
    """Tumbling-window aggregate: (key, window_start_epoch) → count + integer
    value-cents sum.  Pre-aggregated inside map_batches (partial per batch)
    before the groupby, so the shuffle moves O(keys × windows)."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[us]").astype(np.int64) // 1_000_000
        win = (epoch // window_seconds) * window_seconds
        key = batch.column(key_col).to_numpy(zero_copy_only=False)
        val = batch.column(value_col).to_numpy(zero_copy_only=False)
        cents = np.round(val * 100).astype(np.int64)
        df = pd.DataFrame({key_col: key, "window_start": win, "c": 1, "v": cents})
        agg = df.groupby([key_col, "window_start"], as_index=False).agg(
            n_events=("c", "sum"), value_cents=("v", "sum")
        )
        from oma_ray.sources.parquet import from_pandas_clean
        return from_pandas_clean(agg)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )
