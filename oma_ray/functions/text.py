"""Text-analysis kernels for the web-page payload: token counting, quality
stats, language ID, fingerprints, shingles / MinHash / SimHash.

Counting kernels are Arrow-vectorized (``pyarrow.compute``
``count_substring_regex`` / ``utf8_length``); signature kernels (MinHash /
SimHash / fingerprints) are vectorized end-to-end as well: Arrow C++
whitespace split → one flat SipHash pass over every token in the batch →
numpy segment folds (``reduceat``).  No per-document Python anywhere on
the hot axis.

``TOKEN_RE`` is chosen to evaluate identically under Python ``re``, Arrow
RE2 and DuckDB RE2 so the DuckDB oracle can mirror token counts exactly.
"""

from __future__ import annotations

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


def lang_id(texts) -> np.ndarray:
    """n-gram/stopword-heuristic language ID over {en,de,fr,es}; 'und' when
    no stopwords hit.  Vectorized end-to-end: one RE2 count pass per
    language, then a numpy select (no per-row Python)."""
    scores = np.stack(
        [
            pc.count_substring_regex(texts, pat)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            for pat in _STOPWORDS.values()
        ],
        axis=1,
    )
    langs = np.asarray(list(_STOPWORDS.keys()))
    best = np.argmax(scores, axis=1)
    hit = scores.max(axis=1) > 0
    return np.where(hit, langs[best], "und")


def content_fingerprints(texts) -> np.ndarray:
    """Per-document 64-bit content fingerprint over the normalized
    (lowercased, whitespace-collapsed) text: SipHash-1-3
    (``pd.util.hash_array``) in ONE vectorized pass over the flat batch —
    no per-row Python.  Top bit cleared → non-negative int64, so the value
    round-trips parquet/SQL dtypes cleanly."""
    import pandas as pd

    norm = pc.replace_substring_regex(pc.utf8_lower(texts), r"\s+", " ")
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    h = pd.util.hash_array(norm.to_numpy(zero_copy_only=False))
    return (h.astype(np.uint64) >> np.uint64(1)).astype(np.int64)


_POLY = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for rolling combine


def _token_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a whole batch and hash every token in one vectorized pass.

    ``texts`` is an Arrow string Array/ChunkedArray (preferred: the split
    runs in Arrow C++, so no Python-level ``str.split`` per document) or a
    Python list (tests/convenience).  Boundary empties that Arrow's
    whitespace split emits are filtered out, so token streams and per-doc
    counts are identical to ``str.split()``.

    Returns (flat uint64 token hashes, per-doc token counts).  Hashing is
    pandas' SipHash-1-3 (``pd.util.hash_array`` with its fixed default key)
    — ONE C pass over the flat token array, deterministic across processes.
    """
    import pandas as pd

    if isinstance(texts, list):
        texts = pa.array(texts, type=pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    lists = pc.utf8_split_whitespace(texts)
    lens = (
        pc.list_value_length(lists)
        .fill_null(0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = lists.flatten()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)[keep]
    counts = np.bincount(doc_idx, minlength=n).astype(np.int64)
    toks = flat.to_numpy(zero_copy_only=False)[keep]
    if len(toks) == 0:
        return np.empty(0, dtype=np.uint64), counts
    hashes = pd.util.hash_array(toks)
    return hashes.astype(np.uint64), counts


def shingle_hash_batch(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Word-k-gram shingle hashes for a BATCH of documents, fully vectorized.

    Shingle hash = polynomial combine of k consecutive token hashes
    (h = ((t0·P + t1)·P + t2)… with uint64 wraparound), computed on the
    flat token-hash array with boundary positions masked out.  Docs with
    <k tokens contribute one fallback shingle (combine of all their
    tokens, or a fixed constant for empty docs).

    Returns (flat uint64 shingle hashes, per-doc shingle counts ≥1).
    """
    th, counts = _token_hashes(texts)
    n = len(counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n_sh = np.maximum(counts - k + 1, 1)

    # rolling polynomial over the flat array (positions crossing a doc
    # boundary are produced but discarded by the gather below)
    total = len(th)
    if total >= k:
        roll = th[: total - k + 1].copy()
        for j in range(1, k):
            roll = roll * _POLY + th[j : total - k + 1 + j]
    else:
        roll = np.empty(0, dtype=np.uint64)

    # short docs: fold ALL their tokens (0 tokens → constant)
    short = counts < k
    short_vals = np.full(int(short.sum()), np.uint64(0x9E3779B9), dtype=np.uint64)
    if short_vals.size:
        mask64 = (1 << 64) - 1
        for si, di in enumerate(np.nonzero(short)[0]):
            s, c = starts[di], counts[di]
            v = 0x9E3779B9
            for t in th[s : s + c]:
                v = (v * int(_POLY) + int(t)) & mask64
            short_vals[si] = v

    # gather: for each doc, its n_sh shingles starting at starts[di]
    out = np.empty(int(n_sh.sum()), dtype=np.uint64)
    out_starts = np.concatenate([[0], np.cumsum(n_sh)[:-1]])
    long_idx = np.nonzero(~short)[0]
    if long_idx.size:
        # flat gather indices: starts[di] + arange(n_sh[di]) per long doc
        reps = n_sh[long_idx]
        base = np.repeat(starts[long_idx], reps)
        offs = np.concatenate([np.arange(r) for r in reps]) if reps.size else np.empty(0, np.int64)
        dest = np.repeat(out_starts[long_idx], reps) + offs
        out[dest] = roll[base + offs]
    si = 0
    for di in np.nonzero(short)[0]:
        out[out_starts[di]] = short_vals[si]
        si += 1
    return out, n_sh


def minhash_signatures_batch(texts, k: int = 3) -> np.ndarray:
    """64-permutation MinHash signatures, (n_docs, 64) uint64, vectorized
    over the whole batch (shingle hashing + permutation mins at C speed;
    ``np.minimum.reduceat`` folds per-doc segments).

    h_i(x) = (a_i·x + b_i) mod 2^61−1 with fixed odd multipliers; min over
    the document's shingle set per permutation.  Signatures are mergeable
    (elementwise min), hence usable as a distributed sketch.
    """
    sh, n_sh = shingle_hash_batch(texts, k)
    n = len(n_sh)
    if n == 0:
        return np.empty((0, 64), dtype=np.uint64)
    seg = np.concatenate([[0], np.cumsum(n_sh)[:-1]])
    out = np.empty((n, 64), dtype=np.uint64)
    # chunk permutations to bound the (S_total × perms) temporary
    for p0 in range(0, 64, 16):
        a = _MH_A[p0 : p0 + 16]
        b = _MH_B[p0 : p0 + 16]
        hv = (sh[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
        out[:, p0 : p0 + 16] = np.minimum.reduceat(hv, seg, axis=0)
    return out


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """Single-document convenience wrapper over the batch kernel."""
    return minhash_signatures_batch([text], k)[0]


def band_hashes_batch(sigs: np.ndarray, bands: int = 16) -> np.ndarray:
    """LSH band keys for a (n_docs, 64) signature matrix → (n_docs, bands)
    int64; polynomial fold of each band's rows, vectorized over docs."""
    sigs = np.asarray(sigs, dtype=np.uint64)
    n, width = sigs.shape
    rows = width // bands
    banded = sigs.reshape(n, bands, rows)
    acc = np.full((n, bands), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    for r in range(rows):
        acc = acc * _POLY + banded[:, :, r]
    return acc.view(np.int64)


def band_hashes(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """Single-signature convenience wrapper (bands × rows = 64)."""
    return band_hashes_batch(np.asarray(sig, dtype=np.uint64)[None, :], bands)[0]


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((np.asarray(sig_a) == np.asarray(sig_b)).mean())


def simhash64_batch(texts) -> np.ndarray:
    """64-bit SimHash per document, (n_docs,) uint64, vectorized: one
    tokenize+hash pass for the batch, per-doc bit votes folded with
    ``np.add.reduceat``.  Empty documents hash to 0."""
    th, counts = _token_hashes(texts)
    n = len(counts)
    out = np.zeros(n, dtype=np.uint64)
    nonempty = np.nonzero(counts > 0)[0]
    if nonempty.size == 0:
        return out
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    pm = (
        2 * ((th[:, None] >> shifts) & np.uint64(1)).astype(np.int64) - 1
    )
    votes = np.add.reduceat(pm, starts[nonempty], axis=0)
    sig = (
        (votes >= 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
    ).sum(axis=1, dtype=np.uint64)
    out[nonempty] = sig
    return out


def simhash64(text: str) -> np.uint64:
    """Single-document convenience wrapper over the batch kernel."""
    return simhash64_batch([text])[0]


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(np.asarray(a, np.uint64), np.asarray(b, np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt
