"""Join strategies, Ray-Data-first.

Two deliberate paths (SURVEY.md §2.5):

- ``broadcast_join`` — the small side (dimension table, polygon attrs,
  vocab) is ``ray.put`` once and joined per batch inside ``map_batches``.
  No shuffle; the replacement for the reference's windowed multi-pass
  node/way lookups (Reunify.java:434-531) whenever the lookup side fits in
  a worker's heap.
- ``hash_join`` — both sides large: Ray Data's hash-partitioned
  ``Dataset.join`` (an explicit all-to-all).  ``num_partitions`` should be
  ~2-4× cluster cores; callers pick the partition count because it is a
  scale knob, not a detail.

The per-batch probe uses ``pyarrow.Table.join`` (Acero hash join) — the
build side is re-hashed per batch, which is fine when |small| ≲ |batch|;
for heavy reuse, pass an actor-pool stage so the small table deserializes
once per actor.
"""

from __future__ import annotations

import pyarrow as pa


class BroadcastJoiner:
    """``map_batches`` callable: left batch ⟕ broadcast small table."""

    def __init__(
        self,
        small_or_ref,
        keys: list[str] | str,
        right_keys: list[str] | str | None = None,
        join_type: str = "left outer",
        small_columns: list[str] | None = None,
    ):
        import ray

        small = (
            ray.get(small_or_ref)
            if isinstance(small_or_ref, ray.ObjectRef)
            else small_or_ref
        )
        if isinstance(small, dict):
            small = pa.table(small)
        if small_columns:
            small = small.select(small_columns)
        self.small = small
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        rk = right_keys if right_keys is not None else keys
        self.right_keys = [rk] if isinstance(rk, str) else list(rk)
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(
            self.small,
            keys=self.keys,
            right_keys=self.right_keys,
            join_type=self.join_type,
        )


def broadcast_join(ds, small_table, keys, right_keys=None, join_type="left outer",
                   batch_size=None):
    """Broadcast hash join as a fused task stage (small side fetched once
    per worker from the object store via the task cache — fuses with the
    surrounding task chain, unlike an actor pool)."""
    import ray

    ref = (
        small_table
        if isinstance(small_table, ray.ObjectRef)
        else ray.put(small_table)
    )
    from oma_ray.stages.taskcache import CachedStage

    return ds.map_batches(
        CachedStage(BroadcastJoiner, ref, keys, right_keys, join_type),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def hash_join(left, right, on, right_on=None, join_type="inner",
              num_partitions=None, **kwargs):
    """Hash-shuffle join of two large Datasets (all-to-all exchange)."""
    from oma_ray.cluster import default_partitions

    if num_partitions is None:
        num_partitions = default_partitions()
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (
        on if right_on is None
        else ((right_on,) if isinstance(right_on, str) else tuple(right_on))
    )
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
        **kwargs,
    )
