"""Distributed as-of join (most-recent-at-or-before match).

The reference engine has no as-of operator; this is one of the
"operations a large-scale training-data pipeline needs" (per the build
brief — e.g. attaching the latest model-version row, price snapshot or
prior user action to every observation).  Semantics match DuckDB's
``ASOF JOIN`` (inner variant): each left row attaches the LAST right row
with the same key whose timestamp is at or before the left row's
timestamp; timestamp ties count as "before" (inclusive); unmatched lefts
drop.

Shape: tag each side, union, ONE keyed repartition co-locating every
key's full two-sided history, then a per-block vectorized kernel:

- ``np.lexsort`` by (key, ts, side) with rights ordered before lefts on
  timestamp ties (inclusivity);
- a running maximum over right positions (``np.maximum.accumulate``)
  gives each left the last right at-or-before it in that order;
- a key-equality check replaces per-key segment resets: in (key, ts)
  order, the last preceding right either shares the left's key or the
  left has no match in its key at all.

Partitioning assumption (documented per the brief): each KEY's full
history fits one block — the same bound as sessionization
(stages/sessions.py).  Hot keys bound block size; salt-splitting does
not apply (an as-of needs the key's whole right history), so a key whose
history outgrows a block would need time-range chunking with boundary
carry-over, which this engine does not implement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def asof_join(
    left_ds,
    right_ds,
    *,
    on: str,
    ts: str = "ts",
    right_out_ts: str,
    left_payload: list[tuple],
    right_payload: list[tuple],
    num_partitions: int | None = None,
):
    """→ Dataset with columns ``[on, ts, *left_payload, right_out_ts,
    *right_payload]``.

    Both inputs must carry the key as ``on`` and the timestamp as ``ts``
    (same arrow type on both sides); ``left_payload`` / ``right_payload``
    are ``(name, pa.DataType)`` lists naming each side's carried columns
    (disjoint names).  The matched right row's timestamp lands in
    ``right_out_ts``.
    """
    import ray.data as rd

    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()

    lnames = [n for n, _t in left_payload]
    rnames = [n for n, _t in right_payload]

    def _tag(side_val: int, own: list[tuple], other: list[tuple]):
        def tag(b: pa.Table) -> pa.Table:
            n = len(b)
            cols = {
                on: b.column(on),
                "_ts": b.column(ts),
                "_side": pa.array(
                    np.full(n, side_val, dtype=np.int8), type=pa.int8()
                ),
            }
            for name, typ in left_payload + right_payload:
                in_own = any(name == o for o, _ in own)
                cols[name] = b.column(name) if in_own else pa.nulls(
                    n, type=typ
                )
            return pa.table(cols)

        return tag

    tagged = left_ds.map_batches(
        _tag(1, left_payload, right_payload), batch_format="pyarrow"
    ).union(
        right_ds.map_batches(
            _tag(0, right_payload, left_payload), batch_format="pyarrow"
        )
    )

    def _out_cols(b: pa.Table, lsel: np.ndarray, rsel: np.ndarray) -> dict:
        li = pa.array(lsel, type=pa.int64())
        ri = pa.array(rsel, type=pa.int64())
        cols = {
            on: b.column(on).take(li),
            ts: b.column("_ts").take(li),
        }
        for name in lnames:
            cols[name] = b.column(name).take(li)
        cols[right_out_ts] = b.column("_ts").take(ri)
        for name in rnames:
            cols[name] = b.column(name).take(ri)
        return cols

    def kernel(b: pa.Table) -> pa.Table:
        if not len(b):
            return pa.table(
                _out_cols(b, np.empty(0, np.int64), np.empty(0, np.int64))
            )
        b = b.combine_chunks()
        k = b.column(on).to_numpy(zero_copy_only=False)
        t = b.column("_ts").to_numpy(zero_copy_only=False)
        side = b.column("_side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, t, k))
        k_s, side_s = k[order], side[order]
        rightpos = np.where(
            side_s == 0, np.arange(len(order)), -1
        )
        ff = np.maximum.accumulate(rightpos)
        lpos = np.nonzero(side_s == 1)[0]
        m = ff[lpos]
        valid = (m >= 0) & (k_s[np.maximum(m, 0)] == k_s[lpos])
        return pa.table(
            _out_cols(b, order[lpos[valid]], order[m[valid]])
        )

    return tagged.repartition(num_partitions, keys=[on]).map_batches(
        kernel, batch_format="pyarrow"
    )
