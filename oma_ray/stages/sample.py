"""Deterministic sampling (engine addition — SURVEY §2.7 notes the
reference has none).

Hash-based Bernoulli sampling: a row survives iff
``(id · KNUTH) mod 2³² mod 100 < pct``.  Unlike ``Dataset.random_sample``
this is reproducible across runs, machines and engines — the exact same
predicate evaluates in SQL, so sampled pipelines stay value-oracled — and
it needs no coordination: pure per-batch filter, fuses into the task chain.
Stratification falls out per key because the hash is independent of any
grouping column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH = 2654435761  # Knuth's multiplicative hash constant


def _hash32(ids: np.ndarray, salt: int) -> np.ndarray:
    """(id & 0xffffffff) · salt mod 2³², in uint64 (never overflows: the
    masked id and the salt are both <2³²).  The 32-bit mask keeps the
    kernel and its SQL mirror identical for ids ≥ ~3.5·10⁹, where an
    unmasked int64 multiply would silently wrap in numpy but overflow-error
    (or diverge) in DuckDB — the predicate must stay SQL-mirrorable at
    10¹²-id scale.  Returns int64 values in [0, 2³²)."""
    masked = ids.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    return ((masked * np.uint64(salt)) % np.uint64(1 << 32)).astype(np.int64)


def hash_sample_mask(ids: np.ndarray, pct: int, salt: int = KNUTH,
                     base: int = 100) -> np.ndarray:
    """Row survives iff hash(id) mod ``base`` < ``pct`` — ``base=100`` is
    percent; pass a larger base (e.g. 1_000_000) for sub-percent rates
    (sampling 4096 quantizer rows out of 10^9)."""
    return _hash32(ids, salt) % base < pct


def hash_sample(ds, id_col: str, pct: int, salt: int = KNUTH,
                base: int = 100):
    """Keep ~pct/base of rows, deterministically by ``id_col``."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(hash_sample_mask(ids, pct, salt, base)))

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_sample_predicate(id_col: str, pct: int, salt: int = KNUTH,
                         base: int = 100) -> str:
    """The identical predicate for a DuckDB oracle."""
    return (
        f"((CAST(({id_col} & 4294967295) AS HUGEINT) * {salt})"
        f" % 4294967296) % {base} < {pct}"
    )


def stratified_sample(ds, strata_col: str, id_col: str,
                      rates: dict[str, int], default_pct: int,
                      salt: int = KNUTH, base: int = 100):
    """Per-stratum deterministic Bernoulli sampling: each row's survival
    threshold comes from its stratum (e.g. keep 5% of English but 50% of
    low-resource languages — the usual corpus-rebalancing shape).  Same
    hash predicate as ``hash_sample`` so the whole thing stays
    SQL-mirrorable; pure per-batch filter, no exchange, fuses."""
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        strata = pd.Series(batch.column(strata_col).to_numpy(zero_copy_only=False))
        pcts = strata.map(rates).fillna(default_pct).to_numpy(dtype=np.int64)
        h = _hash32(ids, salt) % base
        return batch.filter(pa.array(h < pcts))

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_stratified_predicate(strata_col: str, id_col: str,
                             rates: dict[str, int], default_pct: int,
                             salt: int = KNUTH, base: int = 100) -> str:
    """The identical per-stratum predicate for a DuckDB oracle."""
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(rates.items())
    )
    case = f"CASE {strata_col} {whens} ELSE {default_pct} END"
    return (
        f"((CAST(({id_col} & 4294967295) AS HUGEINT) * {salt})"
        f" % 4294967296) % {base} < {case}"
    )


def weighted_sample(ds, id_col: str, weight_col: str, rate_num: int,
                    base: int = 1_000_000, salt: int = KNUTH):
    """Size-biased deterministic sampling: a row survives with probability
    ``min(1, weight · rate_num / base)`` — the corpus-curation shape
    "sample proportional to document length" (upsampling long documents
    relative to uniform Bernoulli).  Same hash predicate family as
    ``hash_sample`` (so it stays SQL-mirrorable via
    ``sql_weighted_predicate``), pure per-batch filter, no exchange.
    Integer weights only; thresholds clamp at ``base`` (certain keep)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        thresh = np.minimum(w * rate_num, base)
        h = _hash32(ids, salt) % base
        return batch.filter(pa.array(h < thresh))

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_weighted_predicate(id_col: str, weight_col: str, rate_num: int,
                           base: int = 1_000_000, salt: int = KNUTH) -> str:
    """The identical weighted predicate for a DuckDB oracle."""
    return (
        f"((CAST(({id_col} & 4294967295) AS HUGEINT) * {salt})"
        f" % 4294967296) % {base} "
        f"< LEAST({weight_col} * {rate_num}, {base})"
    )


def mix_to_budget(ds, source_col: str, id_col: str, weight_col: str,
                  budget: int, *, base: int = 1000, salt: int = KNUTH,
                  num_partitions: int | None = None):
    """Dataset mixing to a per-source budget — the corpus-assembly shape:
    cap every source's contribution at ``budget`` weight units (chars/
    tokens) by sampling each source at
    ``rate = min(base, budget·base // source_total)`` per mille.

    Two stages: an O(sources) keyed sum (partial-per-batch, one small
    exchange — the per-source totals table is bounded by the number of
    sources, which is the small side by definition), the rates map rides
    to every task as a broadcast dict, then the same deterministic
    ``_hash32`` Bernoulli predicate as the rest of the sampling family —
    so the whole operator stays SQL-mirrorable (``sql_mix_query``
    recomputes the rates with identical integer arithmetic in a CTE).

    Output: input columns + ``rate_permille``."""
    import pandas as pd

    from oma_ray.pipelines.queries import _grouped_sums
    from oma_ray.stages.taskcache import broadcast_once

    def partial(batch: pa.Table) -> "pd.DataFrame":
        return pd.DataFrame({
            source_col: batch.column(source_col).to_numpy(zero_copy_only=False),
            "_tot": batch.column(weight_col).to_numpy(
                zero_copy_only=False).astype(np.int64),
        })

    totals = _grouped_sums(ds, [source_col], partial, ["_tot"],
                           num_partitions=num_partitions)
    rates = {
        r[source_col]: min(base, budget * base // int(r["_tot"]))
        for r in totals.take_all()
    }
    import hashlib

    digest = hashlib.sha1(repr(sorted(rates.items())).encode()).hexdigest()[:16]
    ref = broadcast_once(f"mix_rates:{source_col}:{budget}:{base}:{digest}",
                         lambda: rates)

    def fn(batch: pa.Table) -> pa.Table:
        import ray

        rmap = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        src = pd.Series(batch.column(source_col).to_numpy(zero_copy_only=False))
        rate = src.map(rmap).fillna(0).to_numpy(dtype=np.int64)
        h = _hash32(ids, salt) % base
        out = batch.append_column("rate_permille",
                                  pa.array(rate, type=pa.int64()))
        return out.filter(pa.array(h < rate))

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_mix_query(table: str, source_col: str, id_col: str,
                  weight_col: str, budget: int, select_cols: list[str],
                  *, base: int = 1000, salt: int = KNUTH) -> str:
    """DuckDB mirror of ``mix_to_budget``: recomputes the per-source
    totals and rates with the same integer arithmetic, then applies the
    identical hash predicate."""
    cols = ", ".join(f"d.{c}" for c in select_cols)
    return f"""
WITH s AS (
  SELECT {source_col}, CAST(SUM({weight_col}) AS BIGINT) AS tot
  FROM {table} GROUP BY {source_col}),
r AS (
  SELECT {source_col},
         LEAST({base}, (CAST({budget} AS BIGINT) * {base}) // tot) AS rate
  FROM s)
SELECT {cols}, CAST(r.rate AS BIGINT) AS rate_permille
FROM {table} d JOIN r USING ({source_col})
WHERE ((CAST((d.{id_col} & 4294967295) AS HUGEINT) * {salt})
       % 4294967296) % {base} < r.rate
"""
