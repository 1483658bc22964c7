"""Salted-key skew handling for hot-cell shuffles (north_rule requirement).

The pages distribution is deliberately skewed (three hot cells hold ~30% of
rows — synth.py).  Any keyed exchange — ``repartition(keys=['cell_id'])``,
per-cell grouped processing, partitioned writes — then produces one giant
partition that serializes the stage.  The standard fix, expressed
Ray-Data-first:

1. a cheap counting pass (per-batch partials → tree combine; moves O(keys))
   finds keys above a share threshold;
2. the hot-key set is broadcast and a ``salt`` column is added per batch —
   ``hash(row) % n_salts`` for hot keys, 0 otherwise;
3. the exchange keys on ``(key, salt)`` so a hot key spreads over
   ``n_salts`` partitions; mergeable aggregations combine the salted
   partials afterwards (same tree-combine), and partitioned writes emit
   ``key=<k>/salt=<s>`` files that read back as one logical partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def key_counts(ds, key_col: str, num_partitions: int | None = None):
    """Per-key row counts as a Dataset of (key, n) — partial-per-batch, tree
    combine (never shuffles rows)."""
    import pandas as pd

    from oma_ray.pipelines.queries import _grouped_sums

    def partial(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: batch.column(key_col).to_numpy(zero_copy_only=False),
                "n": np.ones(len(batch), dtype=np.int64),
            }
        )

    return _grouped_sums(ds, [key_col], partial, ["n"], num_partitions)


def find_hot_keys(ds, key_col: str, hot_share: float = 0.01) -> set:
    """Keys holding more than ``hot_share`` of all rows (driver-side result:
    bounded by 1/hot_share entries by construction)."""
    df = key_counts(ds, key_col).to_pandas()
    # Empty input → the hash shuffle emits zero blocks and the result frame
    # has no columns at all (key dtype is unknown here, so no static anchor).
    if "n" not in df.columns:
        return set()
    total = int(df["n"].sum())
    if total == 0:
        return set()
    return set(df.loc[df["n"] > total * hot_share, key_col].tolist())


class AddSalt:
    """Append ``salt:int32``: deterministic per-row hash modulo ``n_salts``
    for hot keys, 0 for everything else.  Hot-key set rides the object store
    (ray.put) and resolves once per worker via the task cache."""

    def __init__(self, hot_ref, key_col: str, n_salts: int, row_col: str):
        import ray

        self.hot = (
            ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
        )
        self.key_col = key_col
        self.n_salts = n_salts
        self.row_col = row_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False)
        rows = batch.column(self.row_col).to_numpy(zero_copy_only=False)
        is_hot = np.isin(keys, list(self.hot)) if self.hot else np.zeros(len(batch), bool)
        salt = np.where(
            is_hot, (rows.astype(np.int64) * 2654435761 % self.n_salts), 0
        ).astype(np.int32)
        return batch.append_column("salt", pa.array(salt, type=pa.int32()))


def salted_repartition(
    ds,
    key_col: str,
    row_col: str,
    *,
    num_partitions: int | None = None,
    n_salts: int = 8,
    hot_share: float = 0.01,
    hot_keys: set | None = None,
):
    """Keyed repartition with hot keys split across ``n_salts`` sub-keys.

    Returns (dataset, hot_keys).  Downstream per-partition logic must treat
    (key, salt) groups of the same key as partials of one logical group and
    merge them (all our grouped sums are mergeable; partitioned writes emit
    extra files per hot key that read back as one logical partition).

    Pass ``hot_keys`` to skip the counting pass — callers with a cheap
    proxy for the key distribution (a deterministic sample, a prior
    summary, replicate-1 synth input) should count THERE instead of
    re-executing this dataset's whole upstream pipeline."""
    import ray

    from oma_ray.stages.dedup import ensure_hash_shuffle
    from oma_ray.stages.taskcache import CachedStage

    from oma_ray.cluster import default_partitions

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()
    hot = hot_keys if hot_keys is not None else find_hot_keys(
        ds, key_col, hot_share
    )
    ds2 = ds.map_batches(
        CachedStage(AddSalt, ray.put(hot), key_col, n_salts, row_col),
        batch_format="pyarrow",
    )
    return ds2.repartition(num_partitions, keys=[key_col, "salt"]), hot
