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
