"""Stream-shaped operators over the events table.

Ray Data has no event-time windows; the engine treats events as a
partitioned log — partition by key (keyed repartition), order by ts
*within* the block, window with vectorized numpy kernels (ray guide
"streaming-shaped workloads").  The ordering assumption (per-key,
in-block sort) is local to each block, so no global sort is needed.

Block kernels are Arrow→numpy lexsort/reduceat throughout (no pandas
conversion — the osm_dist idiom): a ``to_pandas`` inside a keyed block is
bounded but copies the whole block every batch.
"""

from __future__ import annotations

import numpy as np


def _grouped_min(users: np.ndarray, times: np.ndarray):
    """(sorted unique users, per-user min time) via one lexsort."""
    if len(users) == 0:
        return users[:0], times[:0]
    order = np.lexsort((times, users))
    us, ts = users[order], times[order]
    new = np.ones(len(us), dtype=bool)
    new[1:] = us[1:] != us[:-1]
    starts = np.nonzero(new)[0]
    return us[starts], ts[starts]


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

    def block_sessions(batch) -> "pa.Table":
        import pyarrow as pa

        if not len(batch):
            return pa.table(
                {user_col: pa.array([], type=pa.int64()),
                 "n_sessions": pa.array([], type=pa.int64())}
            )
        user = batch.column(user_col).to_numpy(zero_copy_only=False)
        ts = (
            batch.column(ts_col).to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        order = np.lexsort((ts, user))
        user, ts = user[order], ts[order]
        new_user = np.ones(len(user), dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        gap_us = np.zeros(len(user), dtype=np.int64)
        gap_us[1:] = ts[1:] - ts[:-1]
        new_session = new_user | (gap_us > gap_seconds * 1_000_000)
        starts = np.nonzero(new_user)[0]
        n_sessions = np.add.reduceat(new_session.astype(np.int64), starts)
        return pa.table(
            {user_col: pa.array(user[starts]),
             "n_sessions": pa.array(n_sessions, type=pa.int64())}
        )

    # every row of a user is in exactly one block (keyed repartition), so
    # per-block sessionization == global sessionization
    return part.map_batches(block_sessions, batch_format="pyarrow")


def tumbling_window_agg(ds, window_seconds: int = 3600, key_col: str = "event_type",
                        ts_col: str = "ts", value_col: str = "value"):
    """Tumbling-window aggregate: (key, window_start_epoch) → count + integer
    value-cents sum.  Pre-aggregated inside map_batches (partial per batch)
    before the groupby, so the shuffle moves O(keys × windows)."""
    import pyarrow as pa

    def _window_sums(key, win, n_events, value_cents) -> pa.Table:
        """Grouped int sums over (key, window_start): one lexsort + two
        reduceats — no pandas block copy."""
        uk, ki = np.unique(key, return_inverse=True)
        order = np.lexsort((win, ki))
        ki_s, win_s = ki[order], win[order]
        new = np.ones(len(ki_s), dtype=bool)
        new[1:] = (ki_s[1:] != ki_s[:-1]) | (win_s[1:] != win_s[:-1])
        starts = np.nonzero(new)[0]
        return pa.table(
            {
                key_col: pa.array(uk[ki_s[starts]]),
                "window_start": pa.array(win_s[starts], type=pa.int64()),
                "n_events": pa.array(
                    np.add.reduceat(n_events[order], starts), type=pa.int64()
                ),
                "value_cents": pa.array(
                    np.add.reduceat(value_cents[order], starts), type=pa.int64()
                ),
            }
        )

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[us]").astype(np.int64) // 1_000_000
        win = (epoch // window_seconds) * window_seconds
        key = batch.column(key_col).to_numpy(zero_copy_only=False)
        val = batch.column(value_col).to_numpy(zero_copy_only=False)
        cents = np.floor(val * 100.0 + 0.5).astype(np.int64)
        return _window_sums(key, win, np.ones(len(batch), np.int64), cents)

    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()

    def combine(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return batch
        return _window_sums(
            batch.column(key_col).to_numpy(zero_copy_only=False),
            batch.column("window_start").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            batch.column("n_events").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            batch.column("value_cents").to_numpy(zero_copy_only=False)
            .astype(np.int64),
        )

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
    pass: step-1 times are a grouped min (lexsort), each later step looks
    up the previous step's per-user time by searchsorted against the
    sorted user vector, masks, and grouped-mins again.  The exchange moves
    (user, ts, type) triples of the step types only.
    """
    import pyarrow as pa

    from oma_ray.cluster import default_partitions
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
        if not len(batch):  # typed empty keeps the exchange schema intact
            return pa.table(
                {"step": pa.array([], type=pa.int64()),
                 "n_users": pa.array([], type=pa.int64())}
            )
        u = batch.column(user_col).to_numpy(zero_copy_only=False)
        t = (
            batch.column(ts_col).to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        k = batch.column(type_col).to_numpy(zero_copy_only=False)
        out_step, out_n = [], []
        m = k == step_set[0]
        cur_u, cur_t = _grouped_min(u[m], t[m])  # sorted users → searchsorted
        out_step.append(1)
        out_n.append(len(cur_u))
        for i, nxt in enumerate(step_set[1:], start=2):
            m = k == nxt
            cu, ct = u[m], t[m]
            if len(cur_u) and len(cu):
                pos = np.searchsorted(cur_u, cu)
                pos_c = np.minimum(pos, len(cur_u) - 1)
                tp = cur_t[pos_c]
                ok = (cur_u[pos_c] == cu) & (ct > tp) & (ct <= tp + within_us)
                cur_u, cur_t = _grouped_min(cu[ok], ct[ok])
            else:
                cur_u, cur_t = cu[:0], ct[:0]
            out_step.append(i)
            out_n.append(len(cur_u))
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
        if not len(batch):
            return batch
        step = batch.column("step").to_numpy(zero_copy_only=False)
        n = batch.column("n_users").to_numpy(zero_copy_only=False)
        us, inv = np.unique(step, return_inverse=True)
        sums = np.zeros(len(us), dtype=np.int64)
        np.add.at(sums, inv, n)
        return pa.table(
            {"step": pa.array(us, type=pa.int64()),
             "n_users": pa.array(sums, type=pa.int64())}
        )

    return (
        partials.repartition(max(1, len(step_set)), keys=["step"])
        .map_batches(combine, batch_format="pyarrow")
    )
