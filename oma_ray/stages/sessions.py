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


def funnel_counts(ds, steps: list[str], within_seconds: int,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  num_partitions: int | None = None):
    """Ordered event-pattern matching (funnel): per user, step i+1 must
    occur STRICTLY after the user's earliest completion of step i and
    within ``within_seconds`` of it; returns (step, n_users) with 1-based
    step numbers (classic earliest-completion funnel, deterministic).

    Shape: one user-keyed exchange (each user's events land in exactly one
    block — the sessionize contract), then a fully vectorized per-block
    pass: step-1 times are a grouped min, each later step filters its
    event type against the previous step's per-user time via one merge +
    mask + grouped min.  The exchange moves (user, ts, type) triples of
    the step types only.
    """
    import pyarrow as pa

    from oma_ray.cluster import default_partitions
    from oma_ray.sources.parquet import from_pandas_clean
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()
    within_us = within_seconds * 1_000_000
    step_set = list(steps)

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.is_in(batch.column(type_col), value_set=pa.array(step_set))
        b = batch.filter(m)
        return pa.table(
            {
                user_col: b.column(user_col),
                ts_col: b.column(ts_col),
                type_col: b.column(type_col),
            }
        )

    part = ds.map_batches(project, batch_format="pyarrow").repartition(
        num_partitions, keys=[user_col]
    )

    def block_funnel(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):  # typed empty: untyped pandas would emit doubles
            return pa.table(
                {"step": pa.array([], type=pa.int64()),
                 "n_users": pa.array([], type=pa.int64())}
            )
        out_step, out_n = [], []
        if len(df):
            ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            df = pd.DataFrame(
                {"u": df[user_col].to_numpy(), "t": ts,
                 "k": df[type_col].to_numpy()}
            )
            cur = df[df["k"] == step_set[0]].groupby("u")["t"].min()
            out_step.append(1)
            out_n.append(len(cur))
            for i, nxt in enumerate(step_set[1:], start=2):
                cand = df[df["k"] == nxt].copy()
                # .map, not merge: an empty-left merge with right_index
                # names the result's index 'u' and poisons the groupby.
                # tp becomes float64 where unmatched (NaN) — exact for
                # microsecond epochs (< 2^53)
                cand["tp"] = cand["u"].map(cur)
                cand = cand[
                    cand["tp"].notna()
                    & (cand["t"] > cand["tp"])
                    & (cand["t"] <= cand["tp"] + within_us)
                ]
                cur = cand.groupby("u")["t"].min()
                out_step.append(i)
                out_n.append(len(cur))
        return pa.table(
            {"step": pa.array(out_step, type=pa.int64()),
             "n_users": pa.array(out_n, type=pa.int64())}
        )

    # per-block partial counts → one tiny combine (sum per step).  The
    # constant zero floor guarantees one row per step even when NO events
    # match any step type (the SQL shape: COUNT over an empty set is 0,
    # and an empty keyed exchange would otherwise emit nothing at all).
    import ray.data as rd

    zeros = rd.from_arrow(
        pa.table(
            {"step": pa.array(range(1, len(step_set) + 1), type=pa.int64()),
             "n_users": pa.array([0] * len(step_set), type=pa.int64())}
        )
    )
    partials = part.map_batches(block_funnel, batch_format="pyarrow").union(zeros)

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return batch
        return from_pandas_clean(
            df.groupby("step", as_index=False)["n_users"].sum()
        )

    return (
        partials.repartition(max(1, len(step_set)), keys=["step"])
        .map_batches(combine, batch_format="pyarrow")
    )
