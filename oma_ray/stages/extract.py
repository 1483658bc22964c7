"""Main-content text extraction from raw page HTML.

The north-star per-row invariant for this engine (BASELINE.json
input_hint) is *byte-identical extracted text per url*: the pipeline must
be able to recover the original document text from the raw HTML payload,
exactly.  This stage does the extraction — strip everything before
``<body>``, drop anchor chrome, strip the trailing close tags — as three
chained Arrow ``replace_substring_regex`` kernels over the whole batch
(RE2, ``(?s)`` so payload newlines can't break the match).  No per-row
Python; the stage is a pure map and fuses.

``verify_extraction`` pairs the extracted text against a reference column
and returns a per-row match flag — the oracle for q80 pins every flag to
1, so any drift in the extraction (or in the HTML synthesis) fails the
value hash, which is exactly the reference differential the invariant
asks for (reference: the .oma output preserves element tags byte-exactly;
here the preserved payload is the text).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_HEAD = r"(?s)^.*?<body>"
_ANCHOR = r'<a href="[^"]*">[^<]*</a>'
_TAIL = r"(?s)</body></html>$"


def _s(col) -> pa.Array:
    col = pc.cast(col, pa.string())
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def extract_text(html) -> pa.Array:
    """Recover the document text from raw HTML (see module docstring)."""
    s = _s(html)
    s = pc.replace_substring_regex(s, _HEAD, "")
    s = pc.replace_substring_regex(s, _ANCHOR, "")
    return pc.replace_substring_regex(s, _TAIL, "")


def verify_extraction(batch: pa.Table, html_col: str = "html",
                      text_col: str = "text",
                      id_col: str = "page_id") -> pa.Table:
    """(id, extracted_len, matches) — matches=1 iff extraction is
    byte-identical to the reference text column."""
    got = extract_text(batch.column(html_col))
    want = _s(batch.column(text_col))
    return pa.table(
        {
            id_col: batch.column(id_col),
            "extracted_len": pc.cast(pc.utf8_length(got), pa.int64()),
            "matches": pc.cast(pc.equal(got, want), pa.int64()),
        }
    )
