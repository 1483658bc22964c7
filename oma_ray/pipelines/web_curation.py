"""Second flagship: fused web-curation pass over raw pages.

One streaming pass over the (replicated) Common-Crawl-style pages runs the
whole text-side battery FUSED — text extraction from raw HTML (the
byte-identity invariant), Gopher-style quality rules, PII detection, and a
64-bit content fingerprint — then ONE narrow keyed exchange (11 B/row:
fingerprint + three flags; never text or html) computes the exact distinct
count alongside the stage survivor counts.  This is the webtext
counterpart of the spatial flagship: it demonstrates full-stream fused-map
rate plus a dedup exchange whose volume is independent of payload size.

Distinctness is by 64-bit SipHash fingerprint (`functions/text.py::
content_fingerprints` normalizes case/whitespace first): at 10^12 docs the
collision expectation is ~0.03 per pair-universe — the standard trade for
4× less exchange volume than md5; the md5 path (`stages/dedup.exact_dedup`)
remains the oracle-exact variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def run_curation(sf_dir: str, *, replicate: int = 1) -> pd.DataFrame:
    """Returns a 1-row frame: (n_pages, n_extract_ok, n_gopher_pass,
    n_pii_pages, n_distinct)."""
    from oma_ray.cluster import default_partitions
    from oma_ray.functions.text import content_fingerprints
    from oma_ray.pipelines.queries import _grouped_sums
    from oma_ray.stages.dedup import ensure_hash_shuffle
    from oma_ray.stages.extract import extract_text
    from oma_ray.stages.pii import EMAIL_RE, IP_RE, PHONE_RE, plant_pii
    from oma_ray.synth import make_pages_dataset

    ensure_hash_shuffle()
    pages = make_pages_dataset(sf_dir, replicate=replicate)

    def kernel(batch: pa.Table) -> pa.Table:
        text = extract_text(batch.column("html"))
        want = batch.column("text")
        if isinstance(want, pa.ChunkedArray):
            want = want.combine_chunks()
        ok = pc.equal(text, pc.cast(want, pa.string())).to_numpy(
            zero_copy_only=False).astype(np.int8)

        def cnt(col, pat):
            return pc.count_substring_regex(col, pat).to_numpy(
                zero_copy_only=False).astype(np.int64)

        n_words = cnt(text, r"\S+")
        n_stop = cnt(pc.utf8_lower(text), r"\b(the|of|and|to|in)\b")
        gopher = ((n_words >= 50) & (n_words <= 100000)
                  & (50 * n_stop >= n_words)).astype(np.int8)
        # PII is scanned on PLANTED text (the q78 fixture — raw synth text
        # carries none, so the counter would be a constant 0 otherwise);
        # fingerprints stay on the UNplanted text so n_distinct is real.
        # Only the any-PII flag is needed here, so one alternation pass
        # replaces three scans (q78 keeps the per-kind counts).
        planted = plant_pii(pa.table(
            {"doc_id": batch.column("page_id"), "text": text}))
        pii = (cnt(planted.column("text"),
                   f"({EMAIL_RE})|({PHONE_RE})|({IP_RE})") > 0).astype(np.int8)
        fp = content_fingerprints(text)
        return pa.table({
            "fp": pa.array(fp, type=pa.int64()),
            "ok": pa.array(ok), "gopher": pa.array(gopher),
            "pii": pa.array(pii),
        })

    def block_counts(batch: pa.Table) -> pd.DataFrame:
        if not batch.num_rows or "fp" not in batch.column_names:
            return pd.DataFrame({
                "k": np.array([0], dtype=np.int64),
                **{c: np.array([0], dtype=np.int64)
                   for c in ("n_pages", "n_extract_ok", "n_gopher_pass",
                             "n_pii_pages", "n_distinct")}})
        fp = batch.column("fp").to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "k": np.array([0], dtype=np.int64),
            "n_pages": np.array([len(fp)], dtype=np.int64),
            "n_extract_ok": np.array(
                [int(batch.column("ok").to_numpy(
                    zero_copy_only=False).sum())], dtype=np.int64),
            "n_gopher_pass": np.array(
                [int(batch.column("gopher").to_numpy(
                    zero_copy_only=False).sum())], dtype=np.int64),
            "n_pii_pages": np.array(
                [int(batch.column("pii").to_numpy(
                    zero_copy_only=False).sum())], dtype=np.int64),
            # fp-keyed exchange: every copy of a fingerprint is in THIS
            # block, so block-local uniques sum to the global distinct
            "n_distinct": np.array([len(np.unique(fp))], dtype=np.int64),
        })

    rows = pages.map_batches(kernel, batch_format="pyarrow").repartition(
        default_partitions(), keys=["fp"])
    out = _grouped_sums(
        rows, ["k"], block_counts,
        ["n_pages", "n_extract_ok", "n_gopher_pass", "n_pii_pages",
         "n_distinct"], 1,
    ).to_pandas()
    return out.drop(columns=["k"])
