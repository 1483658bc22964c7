"""1D interval (range) joins — the IP-geolocation / validity-period /
maintenance-window lookup family.

Two regimes, mirroring the join-family convention (stages/join.py and the
box-join BOX_INDEX regimes):

- **broadcast** (interval table is a dimension): the sorted interval table
  rides the object store once; each probe batch runs ONE vectorized
  two-pointer pass (bounded by max interval length), so no shuffle ever
  touches probe rows.  Overlapping intervals are supported — a probe emits
  one row per containing interval.
- **distributed** (interval table too big to broadcast — think per-IP-block
  geolocation at 10^9 rows): intervals register under every fixed-width
  SLOT they overlap and probes key by their slot, so a single slot-keyed
  exchange co-locates each probe with exactly the intervals that can
  contain it.  Replication per interval is ``len/slot_width + 1`` — the
  partitioning assumption: pick ``slot_width`` ≈ the typical interval
  length so replication stays O(1) while no slot collects the whole table.

Intervals are half-open ``[lo, hi)`` int64 throughout.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

log = logging.getLogger(__name__)

#: Interval tables at or below this many rows broadcast; larger ones take
#: the slot-keyed exchange.  Tests force 0 to exercise the distributed path.
INTERVAL_BROADCAST_MAX = 1_000_000


def match_pairs(
    ts: np.ndarray, los: np.ndarray, his: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All (probe_idx, interval_idx) pairs with ``los[j] <= ts[i] < his[j]``.

    ``los`` must be sorted ascending (ties fine); overlap allowed.  One
    vectorized two-pointer pass: candidates per probe are the intervals
    with ``lo`` in ``(ts - max_len, ts]`` — at most (max interval length /
    min interval spacing) per probe, then the exact ``hi`` check filters.
    """
    if not len(ts) or not len(los):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    max_len = int((his - los).max())
    start = np.searchsorted(los, ts - max_len, side="left")
    stop = np.searchsorted(los, ts, side="right")
    counts = np.maximum(stop - start, 0)
    probe = np.repeat(np.arange(len(ts), dtype=np.int64), counts)
    # per-pair interval index: start[probe] + intra-run offset
    offs = np.arange(len(probe), dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    ivl = start[probe] + offs
    ok = (los[ivl] <= ts[probe]) & (ts[probe] < his[ivl])
    return probe[ok], ivl[ok]


class _BroadcastProbe:
    """map_batches callable: probe batch → (carry cols ..., id_col)."""

    def __init__(self, windows_ref, ts_col, id_col, carry_cols):
        import ray

        w = ray.get(windows_ref) if isinstance(windows_ref, ray.ObjectRef) else windows_ref
        order = np.argsort(w["lo"], kind="stable")
        self.los = np.asarray(w["lo"], np.int64)[order]
        self.his = np.asarray(w["hi"], np.int64)[order]
        self.ids = np.asarray(w["id"], np.int64)[order]
        self.ts_col = ts_col
        self.id_col = id_col
        self.carry_cols = carry_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = batch.column(self.ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        probe, ivl = match_pairs(ts, self.los, self.his)
        cols = {
            c: pa.array(
                batch.column(c).to_numpy(zero_copy_only=False)[probe])
            for c in self.carry_cols
        }
        cols[self.id_col] = pa.array(self.ids[ivl], pa.int64())
        return pa.table(cols)


def interval_join(
    probes,
    ts_col: str,
    windows: dict,
    *,
    id_col: str = "window_id",
    carry_cols: list[str] | None = None,
    broadcast_max: int = INTERVAL_BROADCAST_MAX,
    slot_width: int | None = None,
    partitions: int | None = None,
):
    """Inner interval join: one output row per (probe row, containing
    interval).  ``windows`` is ``{"id", "lo", "hi"}`` numpy arrays (the
    driver- or manifest-resident form; a huge interval table would arrive
    as a Dataset and register slots via flat_map — same kernel).  Output
    columns: ``carry_cols + [id_col]``.
    """
    import ray

    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import ensure_hash_shuffle
    from oma_ray.stages.taskcache import CachedStage, broadcast_once

    carry_cols = list(carry_cols or [])
    n_windows = len(windows["id"])
    if n_windows <= broadcast_max:
        sig = (n_windows,
               int(windows["lo"][0]) if n_windows else 0,
               int(windows["hi"][-1]) if n_windows else 0)
        ref = broadcast_once(
            f"interval_join:{id_col}:{sig}",
            lambda: {k: np.asarray(v, np.int64) for k, v in windows.items()},
        )
        return probes.map_batches(
            CachedStage(_BroadcastProbe, ref, ts_col, id_col, carry_cols),
            batch_format="pyarrow",
        )

    # --- distributed regime: slot-keyed tagged co-located union ---------
    ensure_hash_shuffle()
    los = np.asarray(windows["lo"], np.int64)
    his = np.asarray(windows["hi"], np.int64)
    ids = np.asarray(windows["id"], np.int64)
    if slot_width is None:
        slot_width = max(int(np.median(his - los)), 1)
    sw = np.int64(slot_width)
    # register each interval under every slot it overlaps ([lo, hi) slots)
    s0 = los // sw
    s1 = (his - 1) // sw
    reps = (s1 - s0 + 1).astype(np.int64)
    if reps.max(initial=1) > 64:
        log.warning(
            "interval_join: an interval spans %d slots — raise slot_width",
            int(reps.max()),
        )
    w_slot = np.repeat(s0, reps) + (
        np.arange(int(reps.sum()), dtype=np.int64)
        - np.repeat(np.cumsum(reps) - reps, reps)
    )
    widx = np.repeat(np.arange(len(ids), dtype=np.int64), reps)
    zeros = {c: np.zeros(len(widx), np.int64) for c in carry_cols}
    w_tab = pa.table({
        "slot": pa.array(w_slot), "kind": pa.array(np.zeros(len(widx), np.int8)),
        "ts": pa.array(los[widx]), "hi": pa.array(his[widx]),
        "wid": pa.array(ids[widx]),
        **{c: pa.array(v) for c, v in zeros.items()},
    })
    w_ds = ray.data.from_arrow(w_tab)

    def tag_probe(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64())
        n = len(batch)
        return pa.table({
            "slot": pa.array(
                ts.to_numpy(zero_copy_only=False) // sw),
            "kind": pa.array(np.ones(n, np.int8)),
            "ts": ts,
            "hi": pa.array(np.zeros(n, np.int64)),
            "wid": pa.array(np.full(n, -1, np.int64)),
            **{
                c: batch.column(c).cast(pa.int64()) for c in carry_cols
            },
        })

    union = w_ds.union(probes.map_batches(tag_probe, batch_format="pyarrow"))

    def block_probe(batch: pa.Table) -> pa.Table:
        kind = batch.column("kind").to_numpy(zero_copy_only=False)
        ts_all = batch.column("ts").to_numpy(zero_copy_only=False)
        w = kind == 0
        wlos = ts_all[w]
        whis = batch.column("hi").to_numpy(zero_copy_only=False)[w]
        wids = batch.column("wid").to_numpy(zero_copy_only=False)[w]
        # a multi-slot interval's copies can land in ONE hash partition —
        # dedupe by id so a probe matches each interval at most once (the
        # exact containment check already makes cross-slot matches correct)
        _, first = np.unique(wids, return_index=True)
        order = first[np.argsort(wlos[first], kind="stable")]
        blos = wlos[order]
        bhis = whis[order]
        bids = wids[order]
        p = np.flatnonzero(~w)
        probe, ivl = match_pairs(ts_all[p], blos, bhis)
        cols = {
            c: pa.array(
                batch.column(c).to_numpy(zero_copy_only=False)[p][probe])
            for c in carry_cols
        }
        cols[id_col] = pa.array(bids[ivl], pa.int64())
        return pa.table(cols)

    return union.repartition(
        partitions or default_partitions(), keys=["slot"]
    ).map_batches(block_probe, batch_format="pyarrow")
