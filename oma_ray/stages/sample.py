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


def hash_sample_mask(ids: np.ndarray, pct: int, salt: int = KNUTH,
                     base: int = 100) -> np.ndarray:
    """Row survives iff hash(id) mod ``base`` < ``pct`` — ``base=100`` is
    percent; pass a larger base (e.g. 1_000_000) for sub-percent rates
    (sampling 4096 quantizer rows out of 10^9)."""
    return ((ids.astype(np.int64) * salt) % (1 << 32)) % base < pct


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
    return f"(({id_col} * {salt}) % 4294967296) % {base} < {pct}"
