"""Text-analysis kernels for the web-page payload: token counting, quality
stats, language ID, fingerprints, shingles / MinHash / SimHash.

Counting kernels are Arrow-vectorized (``pyarrow.compute``
``count_substring_regex`` / ``utf8_length``); signature kernels (MinHash /
SimHash) loop over documents in Python but do all per-document math in
numpy / zlib.crc32 (C speed) — documents are the unit of work, shingles the
hot axis.

``TOKEN_RE`` is chosen to evaluate identically under Python ``re``, Arrow
RE2 and DuckDB RE2 so the DuckDB oracle can mirror token counts exactly.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"  # word runs or single punctuation
WORD_RE = r"\S+"

# deterministic universal-hash parameters for 64 MinHash permutations
_MERSENNE = (1 << 61) - 1
_MH_A = (np.arange(1, 65, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
_MH_B = np.arange(1, 65, dtype=np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)

_STOPWORDS = {
    "en": r"\b(the|and|of|to|a|in|is|that|it|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|zu|mit|auf)\b",
    "fr": r"\b(le|la|les|et|est|un|une|des|que|pour)\b",
    "es": r"\b(el|la|los|las|es|un|una|que|por|para)\b",
}


def token_counts(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Number of TOKEN_RE matches per row (vectorized, RE2)."""
    return pc.count_substring_regex(texts, TOKEN_RE)


def word_counts(texts) -> pa.Array:
    return pc.count_substring_regex(texts, WORD_RE)


def char_counts(texts) -> pa.Array:
    return pc.utf8_length(texts)


def upper_counts(texts) -> pa.Array:
    return pc.count_substring_regex(texts, "[A-Z]")


def quality_scores(texts) -> np.ndarray:
    """Heuristic quality in [0,1]: penalize very short docs, high punctuation
    density and low word diversity proxies.  Internal metric (not
    SQL-mirrored); deterministic."""
    n_chars = char_counts(texts).to_numpy(zero_copy_only=False).astype(np.float64)
    n_words = word_counts(texts).to_numpy(zero_copy_only=False).astype(np.float64)
    n_punct = (
        pc.count_substring_regex(texts, r"[^\w\s]")
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    len_score = np.clip(n_chars / 500.0, 0.0, 1.0)
    punct_pen = np.clip(1.0 - 4.0 * n_punct / np.maximum(n_words, 1.0), 0.0, 1.0)
    wlen = n_chars / np.maximum(n_words, 1.0)
    wlen_score = np.clip(1.0 - np.abs(wlen - 5.5) / 10.0, 0.0, 1.0)
    return (0.4 * len_score + 0.3 * punct_pen + 0.3 * wlen_score).round(6)


def lang_id(texts) -> list[str]:
    """n-gram/stopword-heuristic language ID over {en,de,fr,es}; 'und' when
    no stopwords hit.  Vectorized: one RE2 count pass per language."""
    scores = np.stack(
        [
            pc.count_substring_regex(texts, pat)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            for pat in _STOPWORDS.values()
        ],
        axis=1,
    )
    langs = list(_STOPWORDS.keys())
    best = np.argmax(scores, axis=1)
    hit = scores.max(axis=1) > 0
    return [langs[b] if h else "und" for b, h in zip(best, hit)]


def crc_fingerprints(texts) -> np.ndarray:
    """Per-document rolling fingerprint: crc32 over the normalized
    (lowercased, whitespace-collapsed) text.  uint32 → int64 column."""
    norm = pc.replace_substring_regex(pc.utf8_lower(texts), r"\s+", " ")
    return np.fromiter(
        (zlib.crc32(s.encode()) for s in norm.to_pylist()),
        dtype=np.int64,
        count=len(norm),
    )


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word-k-gram shingle hash set (uint64) for one document."""
    toks = text.split()
    if len(toks) < k:
        return np.array(
            [zlib.crc32(" ".join(toks).encode())], dtype=np.uint64
        )
    return np.unique(
        np.fromiter(
            (
                zlib.crc32(" ".join(toks[i : i + k]).encode())
                for i in range(len(toks) - k + 1)
            ),
            dtype=np.uint64,
            count=len(toks) - k + 1,
        )
    )


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """64-permutation MinHash signature (uint64[64]) of word-k-gram shingles.

    h_i(x) = (a_i * x + b_i) mod 2^61-1 with fixed odd multipliers; min over
    the document's shingle set per permutation.  Signatures are mergeable
    (elementwise min), hence usable as a distributed sketch.
    """
    sh = _shingle_hashes(text, k)
    # (S, 64) universal hashes; uint64 wrap-around then mod Mersenne prime
    hv = (sh[:, None] * _MH_A[None, :] + _MH_B[None, :]) % np.uint64(_MERSENNE)
    return hv.min(axis=0)


def band_hashes(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """LSH band keys: crc32 of each band's rows (bands × rows = 64)."""
    rows = len(sig) // bands
    return np.fromiter(
        (
            zlib.crc32(sig[b * rows : (b + 1) * rows].tobytes())
            for b in range(bands)
        ),
        dtype=np.int64,
        count=bands,
    )


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((np.asarray(sig_a) == np.asarray(sig_b)).mean())


def simhash64(text: str) -> np.uint64:
    """64-bit SimHash over word features (crc32-seeded per-word 64-bit
    hashes, unweighted)."""
    toks = text.split()
    if not toks:
        return np.uint64(0)
    hv = np.fromiter(
        (zlib.crc32(t.encode()) for t in toks), dtype=np.uint64, count=len(toks)
    )
    # expand 32-bit crc to 64 bits with a fixed odd multiplier
    hv = hv * np.uint64(0x9E3779B97F4A7C15)
    bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] >= 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(np.asarray(a, np.uint64), np.asarray(b, np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt
