"""Charset detection + transcoding for binary payloads — fully vectorized.

Crawl payloads lie about their encoding; the standard recovery (WHATWG
fallback) is: bytes that validate as UTF-8 ARE UTF-8, anything else is
decoded as Latin-1.  Both halves here are numpy kernels over the Arrow
binary column's flat byte buffer — no per-row Python, no codecs module in
the hot path:

- ``utf8_valid_mask``: full UTF-8 structural validation (lead/continuation
  coverage, sequence-length satisfaction, no cross-document straddling)
  via shifted masks + continuation cumulative sums over ALL bytes of the
  batch at once.
- ``latin1_to_utf8``: branch-free expansion transcoder — every byte maps
  to 1 (ASCII) or 2 (0xC2/0xC3 + continuation) output bytes; positions via
  one exclusive cumsum, result rebuilt as an Arrow string array from raw
  buffers.

Validation is exact RFC 3629 — overlong forms (C0/C1 leads, E0/F0
first-continuation ranges), surrogates (ED A0-BF) and > U+10FFFF (F4
90+, F5+) are rejected — property-tested against Python's own UTF-8
decoder over random byte strings (tests/test_charset.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _flat_bytes(col) -> tuple[np.ndarray, np.ndarray]:
    """(bytes:uint8[], offsets:int64[n+1]) of a binary/string column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.cast(pa.binary())
    # normalize to a zero-offset array so buffer slicing is direct
    if col.offset != 0:
        col = pa.concat_arrays([col])
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int32,
                            count=len(col) + 1).astype(np.int64)
    data = col.buffers()[2]
    b = (np.frombuffer(data, dtype=np.uint8, count=int(offsets[-1]))
         if data is not None else np.empty(0, dtype=np.uint8))
    return b, offsets


def utf8_valid_mask(col) -> np.ndarray:
    """bool[n] — True where the row's bytes are structurally valid UTF-8."""
    b, off = _flat_bytes(col)
    n_docs = len(off) - 1
    if not len(b):
        return np.ones(n_docs, dtype=bool)
    n = len(b)
    doc_of = np.searchsorted(off, np.arange(n), side="right") - 1

    cont = (b & 0xC0) == 0x80
    need = np.zeros(n, dtype=np.int8)
    need[(b & 0xE0) == 0xC0] = 1
    need[(b & 0xF0) == 0xE0] = 2
    need[(b & 0xF8) == 0xF0] = 3
    # RFC 3629: C0/C1 (overlong 2-byte) and ≥F5 (beyond U+10FFFF) are
    # never valid leads
    bad_lead = (b == 0xC0) | (b == 0xC1) | (b >= 0xF5)

    # first-continuation range restrictions (overlong 3/4-byte forms,
    # surrogates, > U+10FFFF): E0→[A0,BF], ED→[80,9F], F0→[90,BF],
    # F4→[80,8F].  When the next byte is missing or in another document,
    # the sequence-satisfaction check below already rejects the lead.
    nxt = np.zeros(n, dtype=np.uint8)
    nxt[:-1] = b[1:]
    bad_first = (
        ((b == 0xE0) & (nxt < 0xA0))
        | ((b == 0xED) & (nxt > 0x9F))
        | ((b == 0xF0) & (nxt < 0x90))
        | ((b == 0xF4) & (nxt > 0x8F))
    )

    # every continuation byte must be covered by a recent lead's need,
    # within the same document
    cov = np.zeros(n, dtype=bool)
    for k in (1, 2, 3):
        cov[k:] |= (need[:-k] >= k) & (doc_of[k:] == doc_of[:-k])
    orphan_cont = cont & ~cov

    # every lead must be followed by exactly `need` continuations (same doc)
    ccs = np.concatenate([[0], np.cumsum(cont, dtype=np.int64)])
    unsat = np.zeros(n, dtype=bool)
    for k in (1, 2, 3):
        lead = need == k
        idx = np.flatnonzero(lead)
        if not len(idx):
            continue
        end = idx + k
        ok = end < n
        got = np.zeros(len(idx), dtype=np.int64)
        got[ok] = ccs[end[ok] + 1] - ccs[idx[ok] + 1]
        same_doc = np.zeros(len(idx), dtype=bool)
        same_doc[ok] = doc_of[end[ok]] == doc_of[idx[ok]]
        unsat[idx] = ~(ok & (got == k) & same_doc)

    bad = bad_lead | bad_first | orphan_cont | unsat
    if not bad.any():
        return np.ones(n_docs, dtype=bool)
    bad_docs = np.unique(doc_of[bad])
    out = np.ones(n_docs, dtype=bool)
    out[bad_docs] = False
    return out


def latin1_to_utf8(col, rows: np.ndarray | None = None) -> pa.Array:
    """Decode the column's bytes AS LATIN-1 into a UTF-8 Arrow string array
    (all rows, or only ``rows`` when given — returned in that order)."""
    b, off = _flat_bytes(col)
    if rows is not None:
        lens = np.diff(off)[rows]
        starts = off[:-1][rows]
        gather = (np.repeat(starts, lens)
                  + np.arange(int(lens.sum()))
                  - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]),
                              lens))
        b = b[gather] if len(gather) else b[:0]
        off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    high = b >= 0x80
    out_per = 1 + high.astype(np.int64)
    starts = np.cumsum(out_per) - out_per
    total = int(starts[-1] + out_per[-1]) if len(b) else 0
    out = np.empty(total, dtype=np.uint8)
    out[starts] = np.where(high, 0xC0 | (b >> 6), b)
    hi_pos = starts[high] + 1
    out[hi_pos] = 0x80 | (b[high] & 0x3F)
    # per-row output offsets: bytes + number of high bytes per row
    hcs = np.concatenate([[0], np.cumsum(high, dtype=np.int64)])
    new_off = off + hcs[off]
    return pa.Array.from_buffers(
        pa.utf8(), len(off) - 1,
        [None, pa.py_buffer(new_off.astype(np.int32).tobytes()),
         pa.py_buffer(out.tobytes())],
    )


def detect_and_decode(col) -> tuple[np.ndarray, pa.Array]:
    """(is_utf8:bool[n], text:utf8 Array) — WHATWG fallback decode."""
    import pyarrow.compute as pc

    valid = utf8_valid_mask(col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if valid.all():
        return valid, pc.cast(col, pa.string())
    bad = np.flatnonzero(~valid)
    decoded_bad = latin1_to_utf8(col, rows=bad)
    # splice: take utf8 rows as-is, latin1 rows from the decoded array
    texts = pc.cast(col.filter(pa.array(valid)), pa.string())
    order = np.empty(len(valid), dtype=np.int64)
    order[valid] = np.arange(int(valid.sum()))
    order[~valid] = int(valid.sum()) + np.arange(len(bad))
    merged = pa.concat_arrays([texts.combine_chunks()
                               if isinstance(texts, pa.ChunkedArray)
                               else texts, decoded_bad])
    return valid, merged.take(pa.array(order))
