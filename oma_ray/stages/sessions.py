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

    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    part = ds.repartition(default_partitions(), keys=[user_col])

    def block_sessions(batch) -> "pd.DataFrame":
        import pyarrow as pa

        df = batch.to_pandas()
        if not len(df):
            return pa.table(
                {user_col: pa.array([], type=pa.int64()),
                 "n_sessions": pa.array([], type=pa.int64())}
            )
        df = df.sort_values([user_col, ts_col])
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        user = df[user_col].to_numpy()
        new_user = np.ones(len(df), dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        gap = np.zeros(len(df))
        gap[1:] = (ts[1:] - ts[:-1]) / 1_000_000.0
        new_session = new_user | (gap > gap_seconds)
        out = pd.DataFrame({user_col: user, "s": new_session.astype(np.int64)})
        agg = out.groupby(user_col, as_index=False)["s"].sum()
        agg = agg.rename(columns={"s": "n_sessions"})
        from oma_ray.sources.parquet import from_pandas_clean

        return from_pandas_clean(agg)

    # every row of a user is in exactly one block (keyed repartition), so
    # per-block sessionization == global sessionization
    return part.map_batches(block_sessions, batch_format="pyarrow")


def tumbling_window_agg(ds, window_seconds: int = 3600, key_col: str = "event_type",
                        ts_col: str = "ts", value_col: str = "value"):
    """Tumbling-window aggregate: (key, window_start_epoch) → count + integer
    value-cents sum.  Pre-aggregated inside map_batches (partial per batch)
    before the groupby, so the shuffle moves O(keys × windows)."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[us]").astype(np.int64) // 1_000_000
        win = (epoch // window_seconds) * window_seconds
        key = batch.column(key_col).to_numpy(zero_copy_only=False)
        val = batch.column(value_col).to_numpy(zero_copy_only=False)
        cents = np.floor(val * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({key_col: key, "window_start": win, "c": 1, "v": cents})
        agg = df.groupby([key_col, "window_start"], as_index=False).agg(
            n_events=("c", "sum"), value_cents=("v", "sum")
        )
        from oma_ray.sources.parquet import from_pandas_clean
        return from_pandas_clean(agg)

    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return batch
        agg = df.groupby([key_col, "window_start"], as_index=False)[
            ["n_events", "value_cents"]
        ].sum()
        from oma_ray.sources.parquet import from_pandas_clean

        return from_pandas_clean(agg)

    from oma_ray.cluster import default_partitions

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(default_partitions(), keys=[key_col, "window_start"])
        .map_batches(combine, batch_format="pyarrow")
    )
