"""PII detection and redaction over document text — the standard
pre-training compliance pass (emails, phone numbers, internal IPs).

Everything is a single-pass Arrow kernel: ``count_substring_regex`` for the
per-class counts and chained ``replace_substring_regex`` for the redaction —
no per-row Python, no exchange (a pure map stage; at 10^12 docs it streams
and fuses into whatever pipeline runs it).  The patterns are RE2 and are
used verbatim by the DuckDB oracle (both engines run RE2-compatible
semantics), so a detection bug — not just an aggregation bug — fails the
value hash.

The test fixture plants PII deterministically (pure integer formulas of
``doc_id``, mirrored in SQL — same convention as
``curation.plant_contamination``); the base corpus is PII-free, so planted
occurrences are exactly the expected matches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2 patterns, shared verbatim with the SQL oracle (keep in sync!)
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"
IP_RE = r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

REDACTIONS = [(EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"), (IP_RE, "<IP>")]


def _s(col) -> pa.Array:
    col = pc.cast(col, pa.string())
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def plant_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic PII planting (fixture, not engine code) — appends:

    - ``doc_id % 7 == 3``  → `` contact user<id>@mail<id%50>.example now``
    - ``doc_id % 11 == 5`` → `` call +1-555-<id%10000 zero-padded 4> today``
    - ``doc_id % 13 == 2`` → `` origin 10.<id%256>.<id*7%256>.<id%100> logged``

    (formulas mirrored in SQL_Q78).
    """
    ids = batch.column("doc_id").to_numpy()
    ids_s = pc.cast(pa.array(ids), pa.string())

    email = pc.if_else(
        pa.array(ids % 7 == 3),
        pc.binary_join_element_wise(
            " contact user", ids_s, "@mail",
            pc.cast(pa.array(ids % 50), pa.string()), ".example now", "",
        ),
        "",
    )
    phone = pc.if_else(
        pa.array(ids % 11 == 5),
        pc.binary_join_element_wise(
            " call +1-555-",
            pc.utf8_lpad(pc.cast(pa.array(ids % 10000), pa.string()), 4, "0"),
            " today", "",
        ),
        "",
    )
    ip = pc.if_else(
        pa.array(ids % 13 == 2),
        pc.binary_join_element_wise(
            " origin 10.",
            pc.cast(pa.array(ids % 256), pa.string()), ".",
            pc.cast(pa.array((ids * 7) % 256), pa.string()), ".",
            pc.cast(pa.array(ids % 100), pa.string()), " logged", "",
        ),
        "",
    )
    planted = pc.binary_join_element_wise(
        _s(batch.column(text_col)), email, phone, ip, ""
    )
    return batch.set_column(
        batch.schema.get_field_index(text_col), text_col, planted
    )


def pii_scan(batch: pa.Table, text_col: str = "text",
             id_col: str = "doc_id") -> pa.Table:
    """Per-doc PII counts + redacted length (single vectorized pass)."""
    text = _s(batch.column(text_col))
    counts = {
        "n_email": EMAIL_RE, "n_phone": PHONE_RE, "n_ip": IP_RE,
    }
    out = {id_col: batch.column(id_col)}
    for name, pat in counts.items():
        out[name] = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
    red = text
    for pat, mask in REDACTIONS:
        red = pc.replace_substring_regex(red, pat, mask)
    out["red_len"] = pc.cast(pc.utf8_length(red), pa.int64())
    return pa.table(out)


def redact(text_col) -> pa.Array:
    """Redacted text column (emails → <EMAIL>, phones → <PHONE>, IPs → <IP>)."""
    red = _s(text_col)
    for pat, mask in REDACTIONS:
        red = pc.replace_substring_regex(red, pat, mask)
    return red
