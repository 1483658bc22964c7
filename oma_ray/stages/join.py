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

import numpy as np
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


def hash_join_native(left, right, on, right_on=None, join_type="inner",
                     num_partitions=None, **kwargs):
    """Ray's built-in hash-partitioned ``Dataset.join``.  CAUTION: in Ray
    2.49 the join aggregator feeds pyarrow a SCHEMA-LESS empty table for any
    partition that received zero rows on one side, and the Acero join then
    fails with "No match for FieldRef" — so this path is only safe when both
    sides are dense enough that every partition is non-empty.  Use
    ``hash_join`` (colocated) for anything sparse."""
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


def lookup_join(left, right, on: str, right_on: str | None = None,
                num_partitions=None, left_schema=None, right_schema=None,
                est_bytes: int | None = None):
    """Left-outer colocated join for a UNIQUE-keyed right side, merged per
    block with numpy searchsorted instead of Acero — the path for left
    payloads Acero rejects (nested list/struct columns, pyarrow 16).

    Same exchange shape as ``hash_join`` (tag sides → union → ONE keyed
    exchange), but the per-block merge is sort + binary-search: right keys
    must be unique per key (geometry lookups, membership maps — dimension
    shapes), misses yield nulls in the right payload columns.  Single
    int64 key only."""
    import pyarrow.compute as pc

    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import ensure_hash_shuffle

    if num_partitions is None:
        from oma_ray.cluster import fact_partitions

        num_partitions = fact_partitions(est_bytes)
    right_on = right_on or on
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    lnames = list(lschema.names)
    rkeep = [c for c in rschema.names if c != right_on]
    overlap = set(lnames) & set(rkeep)
    if overlap:
        raise ValueError(f"join sides share non-key columns: {overlap}")
    out_names = lnames + rkeep

    def pad_left(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "__side", pa.array(np.zeros(len(batch), dtype=np.int8))
        )
        for c in rkeep:
            batch = batch.append_column(c, pa.nulls(len(batch), type=rtypes[c]))
        return batch

    def pad_right(batch: pa.Table) -> pa.Table:
        cols = {on: batch.column(right_on)}
        for c in rkeep:
            cols[c] = batch.column(c)
        t = pa.table(cols)
        for c in lnames:
            if c != on:
                t = t.append_column(c, pa.nulls(len(t), type=ltypes[c]))
        t = t.append_column("__side", pa.array(np.ones(len(t), dtype=np.int8)))
        return t.select([*lnames, "__side", *rkeep])

    lp = left.map_batches(pad_left, batch_format="pyarrow")
    rp = right.map_batches(pad_right, batch_format="pyarrow")
    ensure_hash_shuffle()
    both = lp.union(rp).repartition(num_partitions, keys=[on])

    def block_merge(batch: pa.Table) -> pa.Table:
        side = batch.column("__side")
        lt = batch.filter(pc.equal(side, 0)).select(lnames)
        rt = batch.filter(pc.equal(side, 1)).select([on, *rkeep])
        if not len(rt):
            out = lt
            for c in rkeep:
                out = out.append_column(c, pa.nulls(len(lt), type=rtypes[c]))
            return out
        rkeys = rt.column(on).to_numpy(zero_copy_only=False)
        order = np.argsort(rkeys, kind="stable")
        rkeys = rkeys[order]
        lkeys = lt.column(on).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(rkeys, lkeys)
        pos_c = np.minimum(pos, len(rkeys) - 1)
        found = rkeys[pos_c] == lkeys
        take_idx = pa.array(
            np.where(found, order[pos_c], -1), type=pa.int64()
        )
        # take with -1 → null is not a pyarrow contract; mask explicitly
        take_idx = pc.if_else(
            pa.array(found), take_idx, pa.scalar(None, type=pa.int64())
        )
        out = lt
        for c in rkeep:
            out = out.append_column(c, rt.column(c).take(take_idx))
        return out

    return both.map_batches(block_merge, batch_format="pyarrow")


def hash_join(left, right, on, right_on=None, join_type="inner",
              num_partitions=None, dedup_right=False,
              left_schema=None, right_schema=None,
              est_bytes: int | None = None):
    """Hash-shuffle join of two large Datasets, colocated-union style:
    both sides are tagged, unioned under one padded schema, exchanged ONCE
    by key, and joined per block with pyarrow (Acero).

    Every row of a key lands in exactly one block, so per-block join ==
    global join for inner/left_outer.  Moves the same bytes as a two-sided
    shuffle join but tolerates arbitrarily sparse sides (empty partitions
    simply produce no block — no schema-less-table pitfall, unlike
    ``Dataset.join`` in Ray 2.49).  Right key columns are renamed onto the
    left key names; output columns = left schema + non-key right columns.

    ``dedup_right=True`` keeps one right row per key, applied per block
    AFTER the exchange (co-location makes within-block dedup global) — a
    semi-join existence probe without a separate distinct exchange.  NOTE:
    planning calls ``.schema()`` on both sides, and Ray executes a side's
    whole plan for that if it contains an all-to-all (limit(1) can't stop
    a shuffle) — feed joins map-chain or materialized inputs, or pass the
    side's ``pyarrow.Schema`` explicitly via ``left_schema``/
    ``right_schema`` (chained joins: the caller knows its own output
    schema; re-executing an upstream exchange just to read it is the
    expensive way to find out).
    """
    import pyarrow as pa

    from oma_ray.cluster import default_partitions

    if join_type not in ("inner", "left_outer"):
        return hash_join_native(left, right, on, right_on, join_type,
                                num_partitions)
    if num_partitions is None:
        # joins exchange RAW rows (not pre-aggregated partials): the count
        # must grow with data so per-partition blocks stay bounded (VERDICT
        # r02 "What's wrong" #3) — sized from the caller's byte estimate,
        # floored at cores/2 (see cluster.fact_partitions for the measured
        # per-partition overhead that rules out a blanket multiplier)
        from oma_ray.cluster import fact_partitions

        num_partitions = fact_partitions(est_bytes)
    on = [on] if isinstance(on, str) else list(on)
    right_on = (
        on if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )

    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    lnames = list(lschema.names)
    rkeep = [c for c in rschema.names if c not in right_on]
    overlap = set(lnames) & set(rkeep)
    if overlap:
        raise ValueError(f"join sides share non-key columns: {overlap}")
    out_names = lnames + rkeep

    def pad_left(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "__side", pa.array(np.zeros(len(batch), dtype=np.int8))
        )
        for c in rkeep:
            batch = batch.append_column(c, pa.nulls(len(batch), type=rtypes[c]))
        return batch

    def pad_right(batch: pa.Table) -> pa.Table:
        missing = [c for c in (*right_on, *rkeep) if c not in batch.column_names]
        if missing:
            raise ValueError(
                f"pad_right schema drift: batch has {batch.column_names}, "
                f"expected right_on={right_on} rkeep={rkeep} "
                f"(lnames={lnames}, on={on})"
            )
        cols = {lk: batch.column(rk) for lk, rk in zip(on, right_on)}
        for c in rkeep:
            cols[c] = batch.column(c)
        t = pa.table(cols)
        for c in lnames:
            if c not in on:
                t = t.append_column(c, pa.nulls(len(t), type=ltypes[c]))
        t = t.append_column(
            "__side", pa.array(np.ones(len(t), dtype=np.int8))
        )
        return t.select([*lnames, "__side", *rkeep])

    lp = left.map_batches(pad_left, batch_format="pyarrow")
    rp = right.map_batches(pad_right, batch_format="pyarrow")
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    both = lp.union(rp).repartition(num_partitions, keys=on)

    pa_join = {"inner": "inner", "left_outer": "left outer"}[join_type]

    def block_join(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = batch.column("__side")
        lt = batch.filter(pc.equal(side, 0)).select(lnames)
        rt = batch.filter(pc.equal(side, 1)).select(on + rkeep)
        if dedup_right and len(rt):
            from oma_ray.sources.parquet import from_pandas_clean

            rt = from_pandas_clean(
                rt.to_pandas().drop_duplicates(subset=on)
            )
        joined = lt.join(rt, keys=on, join_type=pa_join)
        return joined.select(out_names)

    return both.map_batches(block_join, batch_format="pyarrow")


def sort_merge_join(left, right, on: str, right_on: str | None = None,
                    num_partitions: int | None = None,
                    left_schema=None, right_schema=None,
                    sample_pct: int = 10):
    """RANGE-partitioned sort-merge inner join — the alternative physical
    plan to :func:`hash_join` for int64 keys: range boundaries come from
    a deterministic hash sample of the LEFT side's keys (the q161
    sampled-splits strategy), both sides exchange by range id (keys stay
    CONTIGUOUS per block, unlike a hash exchange), and the per-block
    kernel is a vectorized sorted merge (argsort + searchsorted bounds +
    repeat/gather — no hash table).  Output columns = left schema +
    non-key right columns.

    Where it wins over hash_join: the output inherits key-sortedness
    within each range block (downstream sort-within-tile writes and
    merge consumers skip a re-sort), and range blocks spill/compress
    better under key locality.  Where it loses: a skewed key sample
    skews block sizes (never correctness — the q161 argument)."""
    import pyarrow as pa

    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import ensure_hash_shuffle
    from oma_ray.stages.sample import hash_sample_mask

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()
    right_on = right_on or on

    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    lnames = list(lschema.names)
    rkeep = [c for c in rschema.names if c != right_on]
    overlap = set(lnames) & set(rkeep)
    if overlap:
        raise ValueError(f"join sides share non-key columns: {overlap}")
    out_names = lnames + rkeep

    def sample_keys(batch: pa.Table) -> pa.Table:
        k = batch.column(on).to_numpy(zero_copy_only=False)
        keep = hash_sample_mask(k, sample_pct)
        return pa.table({"k": pa.array(k[keep], pa.int64())})

    sample = np.sort(left.map_batches(
        sample_keys, batch_format="pyarrow").to_pandas()["k"]
        .to_numpy(np.int64))  # bounded driver pull (sample_pct %)
    cuts = (sample[np.linspace(0, len(sample) - 1, num_partitions,
                               dtype=np.int64)[1:]]
            if len(sample) else np.array([], dtype=np.int64))

    def pad_left(batch: pa.Table) -> pa.Table:
        k = batch.column(on).to_numpy(zero_copy_only=False)
        batch = batch.append_column(
            "__rng", pa.array(np.searchsorted(cuts, k, side="right")
                              .astype(np.int64)))
        batch = batch.append_column(
            "__side", pa.array(np.zeros(len(k), dtype=np.int8)))
        for c in rkeep:
            batch = batch.append_column(
                c, pa.nulls(len(k), type=rtypes[c]))
        return batch.select([*lnames, "__rng", "__side", *rkeep])

    def pad_right(batch: pa.Table) -> pa.Table:
        k = batch.column(right_on).to_numpy(zero_copy_only=False)
        cols = {on: batch.column(right_on)}
        for c in rkeep:
            cols[c] = batch.column(c)
        t = pa.table(cols)
        for c in lnames:
            if c != on:
                t = t.append_column(c, pa.nulls(len(t), type=ltypes[c]))
        t = t.append_column(
            "__rng", pa.array(np.searchsorted(cuts, k, side="right")
                              .astype(np.int64)))
        t = t.append_column(
            "__side", pa.array(np.ones(len(t), dtype=np.int8)))
        return t.select([*lnames, "__rng", "__side", *rkeep])

    both = (left.map_batches(pad_left, batch_format="pyarrow")
            .union(right.map_batches(pad_right, batch_format="pyarrow"))
            .repartition(num_partitions, keys=["__rng"]))

    def merge_block(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if not batch.num_rows or "__side" not in batch.column_names:
            return pa.table({c: pa.array(
                [], ltypes.get(c, rtypes.get(c)))
                for c in out_names})
        side = batch.column("__side")
        lt = batch.filter(pc.equal(side, 0))
        rt = batch.filter(pc.equal(side, 1))
        lk = lt.column(on).to_numpy(zero_copy_only=False)
        rk = rt.column(on).to_numpy(zero_copy_only=False)
        lo = np.argsort(lk, kind="stable")
        ro = np.argsort(rk, kind="stable")
        slk, srk = lk[lo], rk[ro]
        beg = np.searchsorted(srk, slk, side="left")
        end = np.searchsorted(srk, slk, side="right")
        cnt = end - beg
        l_idx = np.repeat(lo, cnt)
        # right gather: for each left row, its run beg..end in sorted right
        r_pos = (np.repeat(beg, cnt)
                 + (np.arange(int(cnt.sum()))
                    - np.repeat(np.cumsum(cnt) - cnt, cnt)))
        r_idx = ro[r_pos]
        lt2 = lt.take(pa.array(l_idx, pa.int64())).select(lnames)
        rt2 = rt.take(pa.array(r_idx, pa.int64())).select(rkeep)
        out = lt2
        for c in rkeep:
            out = out.append_column(c, rt2.column(c))
        return out.select(out_names)

    return both.map_batches(merge_block, batch_format="pyarrow")


def band_self_pairs(ds, group_col: str, value_col: str, band: int,
                    num_partitions: int | None = None):
    """Banded non-equi SELF-join aggregate: per ``group_col``, the number
    of unordered row pairs whose integer ``value_col`` differ by at most
    ``band``, plus the summed |difference| — the theta-band join regime
    (price-within-ε, timestamp-within-Δ) the equi-join family can't
    express.

    Scale shape: each row keys to bucket ``v // band`` and ships twice —
    as RESIDENT of its own bucket and as GHOST to ``bucket - 1`` — so any
    in-band pair is co-located in exactly one block: same-bucket pairs in
    their shared bucket, cross-bucket pairs in the LOWER bucket (a ghost's
    value strictly exceeds every co-blocked resident's, so no pair is seen
    twice and no self-pair forms).  ONE keyed exchange on
    ``(group, bucket)`` moves 2 rows per input row; the per-block kernel
    is sort + ``searchsorted`` + prefix sums — O(n log n), never the n²
    cross product a naive theta join costs.  Output is O(groups) partial
    rows folded by a second tiny exchange-free combine.

    Returns a Dataset of ``(group, n_pairs, sum_diff)`` int64 rows.
    """
    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import _schema_anchor, ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()

    def scatter(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        b = v // band
        return pa.table({
            group_col: pa.array(np.concatenate([g, g])),
            "bucket": pa.array(np.concatenate([b, b - 1])),
            "v": pa.array(np.concatenate([v, v])),
            "ghost": pa.array(np.concatenate(
                [np.zeros(len(v), np.int8), np.ones(len(v), np.int8)])),
        })

    def block_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], pa.string()),
                          "n_pairs": pa.array([], pa.int64()),
                          "sum_diff": pa.array([], pa.int64())})
        if not batch.num_rows or "bucket" not in batch.column_names:
            return empty
        import pandas as pd

        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        bk = batch.column("bucket").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        gh = batch.column("ghost").to_numpy(zero_copy_only=False)
        out_g, out_n, out_s = [], [], []
        df = pd.DataFrame({"g": g, "bk": bk})
        for (gg, bb), idx in df.groupby(["g", "bk"]).indices.items():
            m_r = gh[idx] == 0
            r = np.sort(v[idx][m_r])
            if not len(r):
                continue
            n_p = np.int64(0)
            s_d = np.int64(0)
            # resident×resident: j > i with r[j] - r[i] <= band
            pref = np.concatenate([[0], np.cumsum(r)])
            hi = np.searchsorted(r, r + band, side="right")
            i = np.arange(len(r))
            cnt = hi - i - 1
            n_p += cnt.sum()
            s_d += ((pref[hi] - pref[i + 1]) - cnt * r).sum()
            # resident×ghost: ghost bucket == bb+1, value strictly > resident
            gvals = np.sort(v[idx][~m_r])
            if len(gvals):
                gpref = np.concatenate([[0], np.cumsum(gvals)])
                gc = np.searchsorted(gvals, r + band, side="right")
                n_p += gc.sum()
                s_d += (gpref[gc] - gc * r).sum()
            if n_p:
                out_g.append(gg)
                out_n.append(n_p)
                out_s.append(s_d)
        if not out_g:
            return empty
        return pa.table({group_col: pa.array(out_g),
                         "n_pairs": pa.array(out_n, pa.int64()),
                         "sum_diff": pa.array(out_s, pa.int64())})

    def combine(batch: pa.Table) -> pa.Table:
        import pandas as pd

        if not batch.num_rows or group_col not in batch.column_names:
            return batch
        df = (batch.to_pandas()
              .groupby(group_col, as_index=False)[["n_pairs", "sum_diff"]]
              .sum())
        return pa.table({group_col: pa.array(df[group_col].to_numpy(object)),
                         "n_pairs": pa.array(
                             df["n_pairs"].to_numpy(np.int64)),
                         "sum_diff": pa.array(
                             df["sum_diff"].to_numpy(np.int64))})

    anchor = pa.table({group_col: pa.array([], pa.string()),
                       "n_pairs": pa.array([], pa.int64()),
                       "sum_diff": pa.array([], pa.int64())})
    return _schema_anchor(
        ds.map_batches(scatter, batch_format="pyarrow")
        .repartition(num_partitions, keys=[group_col, "bucket"])
        .map_batches(block_pairs, batch_format="pyarrow")
        .repartition(max(1, num_partitions // 4), keys=[group_col])
        .map_batches(combine, batch_format="pyarrow"),
        anchor,
    )
