"""ROLLUP-style hierarchical grouped sums (engine addition — the reference
has single-level grouping only: ChunkGenerator/TypeAnalysis group once by
(type, tile) and once by key; SURVEY §2.6).

``rollup_sums`` reads the input ONCE at the finest grouping level, then
derives every coarser level by re-aggregating the finer *aggregate* — one
row per key combination — so each extra level's exchange moves O(groups),
never O(rows).  Levels are unioned with grouped-out key columns set to
null, exactly the ANSI ``GROUP BY ROLLUP`` shape, which keeps the whole
operator value-oracleable against DuckDB.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _null_filled(batch: pa.Table, keys: list[str], key_types: dict,
                 sum_cols: list[str]) -> pa.Table:
    """Project ``batch`` to keys + sum_cols in canonical order, adding
    all-null columns for keys the level grouped out."""
    cols = []
    for k in keys:
        if k in batch.column_names:
            cols.append(batch.column(k).cast(key_types[k]))
        else:
            cols.append(pa.nulls(batch.num_rows, type=key_types[k]))
    for c in sum_cols:
        cols.append(batch.column(c))
    return pa.table(dict(zip(keys + sum_cols, cols)))




def _reagg(sub: list[str], sum_cols: list[str]):
    """Partial fn re-aggregating a finer AGGREGATE at key subset ``sub``."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        return batch.select(list(sub) + sum_cols).to_pandas()

    return partial


def _total_partial(sum_cols: list[str]):
    """Partial fn for the grand total (constant grouping key)."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(sum_cols).to_pandas()
        df["_all"] = 0
        return df

    return partial


def _union_levels(levels, keys, key_types, sum_cols):
    """Null-fill grouped-out keys and union all levels (ANSI shape)."""
    out = None
    for lvl in levels:
        norm = lvl.map_batches(
            lambda b: _null_filled(b, keys, key_types, sum_cols),
            batch_format="pyarrow",
        )
        out = norm if out is None else out.union(norm)
    return out


def rollup_sums(ds, keys: list[str], partial_fn, sum_cols: list[str],
                key_types: dict, num_partitions: int | None = None):
    """``GROUP BY ROLLUP(keys...)`` over integer sums.

    ``partial_fn``/``sum_cols`` are as in queries._grouped_sums (the fine
    level IS a _grouped_sums call).  ``key_types`` maps each key to its
    Arrow type so null-filled levels union cleanly.  Coarser exchanges use
    few partitions: their inputs are already one row per finer group.
    """
    from oma_ray.cluster import default_partitions
    from oma_ray.pipelines.queries import _grouped_sums

    coarse_parts = max(1, default_partitions() // 4)

    levels = []
    # Each level is BOTH an output branch and the next level's input; Ray
    # re-executes shared lineage per consumer, so materialize each level —
    # it is an aggregate, one row per group combination, exactly the
    # "small result" case where materialization is correct.
    cur = _grouped_sums(ds, keys, partial_fn, sum_cols, num_partitions).materialize()
    levels.append(cur)
    for n in range(len(keys) - 1, 0, -1):
        sub = keys[:n]
        cur = _grouped_sums(
            cur, sub, _reagg(sub, sum_cols), sum_cols, coarse_parts
        ).materialize()
        levels.append(cur)
    levels.append(
        _grouped_sums(
            cur, ["_all"], _total_partial(sum_cols), sum_cols, 1
        ).drop_columns(["_all"])
    )
    return _union_levels(levels, keys, key_types, sum_cols)


def cube_sums(ds, keys: list[str], partial_fn, sum_cols: list[str],
              key_types: dict, num_partitions: int | None = None):
    """``GROUP BY CUBE(keys...)``: every subset of the key set.

    Derivation order: the finest level reads the input once; every proper
    subset re-aggregates the SMALLEST materialized superset already built
    (fewest groups in, always O(groups) moved).  2^n levels — intended for
    the 2-3 dimension reporting shapes, like ANSI CUBE itself.
    """
    from itertools import combinations

    from oma_ray.cluster import default_partitions
    from oma_ray.pipelines.queries import _grouped_sums

    coarse_parts = max(1, default_partitions() // 4)

    full = tuple(keys)
    done: dict[tuple, "object"] = {
        full: _grouped_sums(ds, keys, partial_fn, sum_cols,
                            num_partitions).materialize()
    }
    subsets = [
        tuple(c)
        for n in range(len(keys) - 1, 0, -1)
        for c in combinations(keys, n)
    ]
    for sub in subsets:
        parent = min(
            (p for p in done if set(sub) < set(p)),
            key=lambda p: len(p),
        )
        done[sub] = _grouped_sums(
            done[parent], list(sub), _reagg(list(sub), sum_cols), sum_cols,
            coarse_parts,
        ).materialize()

    smallest = done[min(done, key=len)]
    total = _grouped_sums(
        smallest, ["_all"], _total_partial(sum_cols), sum_cols, 1,
    ).drop_columns(["_all"])
    return _union_levels([*done.values(), total], keys, key_types, sum_cols)


def grouping_sets_sums(ds, keys: list[str], sets: list[tuple],
                       partial_fn, sum_cols: list[str], key_types: dict,
                       num_partitions: int | None = None):
    """``GROUP BY GROUPING SETS(sets...)`` with an ANSI ``grouping_id``
    column (bit i set ⟺ keys[i] grouped away — DuckDB's GROUPING()
    convention) — the general form rollup/cube specialize.

    Derivation mirrors ``cube_sums``: the finest REQUESTED set reads the
    input once; every other set re-aggregates the smallest materialized
    superset among (input ∪ built sets); the empty set folds whichever
    aggregate is smallest.  Each exchange past the first moves
    O(groups)."""
    from oma_ray.cluster import default_partitions
    from oma_ray.pipelines.queries import _grouped_sums

    coarse_parts = max(1, default_partitions() // 4)
    sets = sorted({tuple(s) for s in sets}, key=len, reverse=True)
    done: dict[tuple, "object"] = {}
    levels = []
    for sub in sets:
        if sub:
            parents = [p for p in done if set(sub) < set(p)]
            if parents:
                parent = min(parents, key=len)
                lvl = _grouped_sums(done[parent], list(sub),
                                    _reagg(list(sub), sum_cols), sum_cols,
                                    coarse_parts).materialize()
            else:
                lvl = _grouped_sums(ds, list(sub), partial_fn, sum_cols,
                                    num_partitions).materialize()
            done[sub] = lvl
        else:
            src = (done[min(done, key=len)] if done else
                   _grouped_sums(ds, list(keys), partial_fn, sum_cols,
                                 num_partitions).materialize())
            lvl = _grouped_sums(src, ["_all"], _total_partial(sum_cols),
                                sum_cols, 1).drop_columns(["_all"])
        gid = sum(1 << (len(keys) - 1 - i)
                  for i, k in enumerate(keys) if k not in sub)

        def tag(batch: pa.Table, gid=gid) -> pa.Table:
            out = _null_filled(batch, keys, key_types, sum_cols)
            return out.append_column(
                "grouping_id",
                pa.array([gid] * out.num_rows, pa.int64()))

        levels.append(lvl.map_batches(tag, batch_format="pyarrow"))
    out = None
    for lvl in levels:
        out = lvl if out is None else out.union(lvl)
    return out
