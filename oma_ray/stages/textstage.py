"""Text-analysis Dataset stages (documents / pages payload)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from oma_ray.functions.text import (
    char_counts,
    content_fingerprints,
    lang_id,
    quality_scores,
    token_counts,
    upper_counts,
    word_counts,
)


class TextStats:
    """Append n_chars / n_words / n_tokens / n_upper (+ optional quality /
    fingerprint / predicted language) — all Arrow-vectorized counts."""

    def __init__(self, text_col: str = "text", extended: bool = False):
        self.text_col = text_col
        self.extended = extended

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.column(self.text_col)
        batch = batch.append_column("n_chars", pa.array(
            char_counts(t).to_numpy(zero_copy_only=False).astype(np.int64)))
        batch = batch.append_column("n_words", pa.array(
            word_counts(t).to_numpy(zero_copy_only=False).astype(np.int64)))
        batch = batch.append_column("n_tokens", pa.array(
            token_counts(t).to_numpy(zero_copy_only=False).astype(np.int64)))
        batch = batch.append_column("n_upper", pa.array(
            upper_counts(t).to_numpy(zero_copy_only=False).astype(np.int64)))
        if self.extended:
            batch = batch.append_column("quality", pa.array(quality_scores(t)))
            batch = batch.append_column(
                "fingerprint", pa.array(content_fingerprints(t), type=pa.int64())
            )
            batch = batch.append_column("lang_pred", pa.array(lang_id(t)))
        return batch


class Md5Hash:
    """Append ``text_md5:string`` (hex) — matches DuckDB ``md5(text)`` so the
    exact-dedup oracle can compare hash-for-hash."""

    def __init__(self, text_col: str = "text", out_col: str = "text_md5"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [
            hashlib.md5(s.encode()).hexdigest()
            for s in batch.column(self.text_col).to_pylist()
        ]
        return batch.append_column(self.out_col, pa.array(vals, type=pa.string()))
