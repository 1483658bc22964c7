"""Corpus-curation stages: benchmark decontamination, paragraph-level
dedup, within-document repetition statistics (engine additions — the
reference has no text operators; SURVEY §2 marks the LLM-data suite as
first-class engine scope).

All three share one vectorized window-explode kernel (the q44
token-window idiom: Arrow ``split_pattern_regex`` → flat token values +
offsets → one ``np.repeat`` gather → ``pc.binary_join``), so no stage
loops over rows or documents in Python.

Scale shapes:

- ``decontaminate_ngrams`` — the train/test-overlap check every LLM
  pipeline runs before training: both sides explode to n-grams, dedup
  per document IN-BATCH (each document lives in one batch row, so
  per-doc distinct never shuffles), then ONE gram-keyed exchange
  co-locates benchmark and candidate copies of each gram; matches are
  exact string equality inside the block (the gram text rides the
  exchange — at 10^12-doc scale you would key by a 128-bit gram hash
  and let the text column dictionary-encode; exact-match semantics are
  identical either way).  A second O(matched-pairs) exchange counts
  distinct matched grams per document.  Nothing driver-side grows with
  the corpus: the benchmark side is by definition the small side but is
  still processed as a dataset, not a broadcast, so a 10^8-gram
  benchmark suite works unchanged.

- ``paragraph_dedup_stats`` — CCNet/C4-style paragraph dedup: documents
  split into fixed-width non-overlapping token windows ("paragraphs"),
  the globally-first copy (min ``(id, win_idx)``) of each distinct
  paragraph is the keeper.  ONE paragraph-keyed exchange; the keeper
  choice is a per-block lexsort (each paragraph text lives in exactly
  one block after the exchange); per-document keep counts return via
  one O(docs) keyed sum.

- ``repetition_stats`` — Gopher-style repetition signal (duplicate
  n-gram fraction per document): entirely shuffle-free, one fused
  ``map_batches`` — grams never leave their block because the statistic
  is per-document.  Distinct counting is exact via Arrow
  ``dictionary_encode`` (string → int codes) + segment-boundary
  detection on a lexsort, no hashing approximation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _tokenize(texts: "pa.ChunkedArray | pa.Array"):
    """Arrow whitespace tokenization, identical to the oracle's
    ``string_split_regex(text, '\\s+')`` (q44 pins the equivalence)."""
    toks = pc.split_pattern_regex(texts, pattern=r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks


def window_explode(batch: pa.Table, *, text_col: str, id_col: str,
                   width: int, stride: int, full_only: bool) -> pa.Table:
    """Explode each row's text into token windows — one fused vectorized
    kernel, no per-row Python.

    ``full_only=True``: only complete ``width``-token windows (n-gram
    mode; a doc with fewer than ``width`` tokens emits nothing).
    ``full_only=False`` (requires ``stride == width``): trailing partial
    window kept (paragraph mode; every non-empty doc emits ≥1 row).

    Returns columns ``(id_col, win_idx, gram)``."""
    if not full_only and stride != width:
        raise ValueError("partial-window mode requires stride == width")
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    toks = _tokenize(batch.column(text_col))
    flat = toks.values
    doc_off = np.asarray(toks.offsets)
    n_toks = np.diff(doc_off).astype(np.int64)
    if full_only:
        n_win = np.where(n_toks >= width, (n_toks - width) // stride + 1, 0)
    else:
        n_win = -(-n_toks // width)  # ceil; ≥1 for any non-empty doc
    n_win = n_win.astype(np.int64)
    total_win = int(n_win.sum())
    if total_win == 0:
        return pa.table({
            id_col: pa.array([], type=pa.int64()),
            "win_idx": pa.array([], type=pa.int64()),
            "gram": pa.array([], type=pa.string()),
        })
    d_idx = np.repeat(np.arange(len(ids)), n_win)
    first = np.concatenate([[0], np.cumsum(n_win)[:-1]])
    win_idx = np.arange(total_win) - first[d_idx]
    starts = doc_off[d_idx] + win_idx * stride
    if full_only:
        lens = np.full(total_win, width, dtype=np.int64)
    else:
        lens = np.minimum(n_toks[d_idx] - win_idx * stride, width)
    total_tok = int(lens.sum())
    row_first = np.concatenate([[0], np.cumsum(lens)[:-1]])
    gather = (np.repeat(starts, lens) + np.arange(total_tok)
              - np.repeat(row_first, lens))
    taken = pc.take(flat, pa.array(gather, type=pa.int64()))
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    gram = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), taken),
        " ",
    )
    return pa.table({
        id_col: pa.array(ids[d_idx], type=pa.int64()),
        "win_idx": pa.array(win_idx, type=pa.int64()),
        "gram": gram,
    })


def _segment_first(codes: np.ndarray, *order_keys: np.ndarray) -> np.ndarray:
    """Boolean mask marking, within each distinct ``codes`` value, the row
    that sorts first by ``order_keys`` (last key most significant after
    codes).  Vectorized lexsort + boundary detection."""
    order = np.lexsort(tuple(reversed(order_keys)) + (codes,))
    sc = codes[order]
    first_sorted = np.ones(len(codes), dtype=bool)
    first_sorted[1:] = sc[1:] != sc[:-1]
    mask = np.zeros(len(codes), dtype=bool)
    mask[order] = first_sorted
    return mask


def _pair_distinct(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Boolean mask keeping one row per distinct ``(a, b)`` pair — no
    composite-key arithmetic (which would overflow int64 at 10^12-id ×
    10^6-code scale), just a two-key lexsort + boundary detection."""
    order = np.lexsort((b, a))
    fa, fb = a[order], b[order]
    first = np.ones(len(a), dtype=bool)
    first[1:] = (fa[1:] != fa[:-1]) | (fb[1:] != fb[:-1])
    mask = np.zeros(len(a), dtype=bool)
    mask[order] = first
    return mask


# --- benchmark decontamination ----------------------------------------------

def decontaminate_ngrams(docs, bench_mask_fn, *, n: int = 8,
                         id_col: str = "doc_id", text_col: str = "text",
                         num_partitions: int | None = None):
    """Per candidate document, the number of DISTINCT ``n``-grams it
    shares with ANY benchmark document (``bench_mask_fn(ids) -> bool
    mask`` marks the benchmark side).  Documents with zero overlap are
    absent from the output — the usual decontamination report is the
    contaminated subset.

    Two keyed exchanges total: gram-keyed match, then doc-keyed count.
    Output: ``(doc_id, n_hits)``."""
    from oma_ray.cluster import default_partitions
    from oma_ray.pipelines.queries import _grouped_sums
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()

    def explode(batch: pa.Table) -> pa.Table:
        out = window_explode(batch, text_col=text_col, id_col=id_col,
                             width=n, stride=1, full_only=True)
        if not out.num_rows:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "gram": pa.array([], type=pa.string()),
                "is_bench": pa.array([], type=pa.int8()),
            })
        ids = out.column(id_col).to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(out.column("gram")).combine_chunks() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _pair_distinct(ids, codes)
        ids, gram = ids[keep], out.column("gram").filter(pa.array(keep))
        is_bench = bench_mask_fn(ids).astype(np.int8)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "gram": gram,
            "is_bench": pa.array(is_bench, type=pa.int8()),
        })

    def match(batch: pa.Table) -> pd.DataFrame:
        if not batch.num_rows:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "n_hits": pd.Series([], dtype=np.int64)})
        df = batch.to_pandas()
        bench = df.loc[df["is_bench"] == 1, "gram"]
        cand = df[df["is_bench"] == 0]
        hit = cand[cand["gram"].isin(set(bench))]
        out = pd.DataFrame({id_col: hit[id_col].to_numpy(dtype=np.int64)})
        out["n_hits"] = np.int64(1)
        return out

    grams = docs.map_batches(explode, batch_format="pyarrow") \
                .repartition(num_partitions, keys=["gram"])
    # (doc, gram) pairs are globally unique after the per-doc in-batch
    # dedup + gram exchange, so counting rows == counting distinct grams
    anchor = pa.table({id_col: pa.array([], type=pa.int64()),
                       "n_hits": pa.array([], type=pa.int64())})
    return _grouped_sums(grams, [id_col],
                         lambda b: match(b), ["n_hits"],
                         num_partitions=num_partitions, anchor=anchor)


def pull_bench_snippets(sf_dir: str, *, bench_mod: int = 97,
                        snip_tokens: int = 8) -> list[str]:
    """Driver-side bounded pull of the benchmark snippets (first
    ``snip_tokens`` tokens of each benchmark doc, ordered by benchmark
    index ``doc_id // bench_mod``).  Benchmark suites are the small,
    fixed side of decontamination (10^5-ish grams against a 10^12-doc
    corpus), so a driver pull + broadcast is the intended scale shape."""
    from oma_ray.sources.parquet import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def snip(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ids % bench_mod == 0
        sub = batch.filter(pa.array(keep))
        if not sub.num_rows:
            return pa.table({"bi": pa.array([], type=pa.int64()),
                             "snippet": pa.array([], type=pa.string())})
        out = window_explode(sub, text_col="text", id_col="doc_id",
                             width=snip_tokens, stride=snip_tokens,
                             full_only=False)
        first = out.filter(pc.equal(out.column("win_idx"), 0))
        bi = first.column("doc_id").to_numpy(zero_copy_only=False) // bench_mod
        return pa.table({"bi": pa.array(bi, type=pa.int64()),
                         "snippet": first.column("gram")})

    rows = ds.map_batches(snip, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["bi"])
    return [r["snippet"] for r in rows]


def plant_contamination(docs, snippets: list[str], *, plant_mod: int = 13,
                        bench_mod: int = 97, id_col: str = "doc_id",
                        text_col: str = "text"):
    """Deterministically contaminate candidate documents: doc ``d`` with
    ``d % plant_mod == 0`` (and not itself a benchmark doc) gets
    ``snippets[(d // plant_mod) % len(snippets)]`` appended.  Pure
    integer/string formula of the id, so a DuckDB CTE regenerates the
    planted corpus exactly (FIXTURES.md convention)."""
    snips = np.asarray(snippets, dtype=object)
    nb = len(snips)

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        text = batch.column(text_col).to_pandas()
        mask = (ids % plant_mod == 0) & (ids % bench_mod != 0)
        if mask.any():
            add = pd.Series(snips[(ids[mask] // plant_mod) % nb])
            text = text.copy()
            text.loc[mask] = text.loc[mask].to_numpy() + " " + add.to_numpy()
        cols = {name: batch.column(name) for name in batch.column_names}
        cols[text_col] = pa.array(text, type=pa.string())
        return pa.table(cols)

    return docs.map_batches(plant, batch_format="pyarrow")


# --- paragraph-level dedup ----------------------------------------------------

def paragraph_dedup_stats(docs, *, width: int = 16, id_col: str = "doc_id",
                          text_col: str = "text",
                          num_partitions: int | None = None):
    """Keep-first paragraph dedup statistics: documents split into
    non-overlapping ``width``-token windows (trailing partial kept); the
    copy of each distinct paragraph with the smallest ``(id, win_idx)``
    is the keeper.  Output per document: ``(id, n_paras, n_kept)``.

    ONE paragraph-keyed exchange decides keepers (each paragraph text is
    co-located in exactly one block), then one O(docs) keyed sum."""
    from oma_ray.cluster import default_partitions
    from oma_ray.pipelines.queries import _grouped_sums
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()

    def explode(batch: pa.Table) -> pa.Table:
        return window_explode(batch, text_col=text_col, id_col=id_col,
                              width=width, stride=width, full_only=False)

    def keepers(batch: pa.Table) -> pd.DataFrame:
        if not batch.num_rows:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "n_paras": pd.Series([], dtype=np.int64),
                                 "n_kept": pd.Series([], dtype=np.int64)})
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        win = batch.column("win_idx").to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(batch.column("gram")).combine_chunks() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kept = _segment_first(codes, ids, win)
        return pd.DataFrame({
            id_col: ids,
            "n_paras": np.ones(len(ids), dtype=np.int64),
            "n_kept": kept.astype(np.int64),
        })

    paras = docs.map_batches(explode, batch_format="pyarrow") \
                .repartition(num_partitions, keys=["gram"])
    anchor = pa.table({id_col: pa.array([], type=pa.int64()),
                       "n_paras": pa.array([], type=pa.int64()),
                       "n_kept": pa.array([], type=pa.int64())})
    return _grouped_sums(paras, [id_col], keepers, ["n_paras", "n_kept"],
                         num_partitions=num_partitions, anchor=anchor)


# --- within-document repetition ----------------------------------------------

def repetition_stats(docs, *, n: int = 3, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Gopher-style duplicate-``n``-gram fraction per document, exact:
    ``dup_permille = (n_grams − n_distinct) · 1000 // n_grams``.
    Shuffle-free (the statistic is per-document and each document lives
    in one batch row); documents with fewer than ``n`` tokens emit no
    row (they have no grams — the oracle's GROUP BY does the same).
    Output: ``(id, n_grams, n_distinct, dup_permille)``."""

    def stats(batch: pa.Table) -> pa.Table:
        out = window_explode(batch, text_col=text_col, id_col=id_col,
                             width=n, stride=1, full_only=True)
        empty = pa.table({
            id_col: pa.array([], type=pa.int64()),
            "n_grams": pa.array([], type=pa.int64()),
            "n_distinct": pa.array([], type=pa.int64()),
            "dup_permille": pa.array([], type=pa.int64()),
        })
        if not out.num_rows:
            return empty
        ids = out.column(id_col).to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(out.column("gram")).combine_chunks() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # window_explode emits each doc's grams contiguously (in input
        # order, not necessarily ascending by id) — segment by contiguity
        starts = np.nonzero(np.r_[True, ids[1:] != ids[:-1]])[0]
        seg_ids = ids[starts]
        n_grams = np.diff(np.append(starts, len(ids))).astype(np.int64)
        distinct_mask = _pair_distinct(ids, codes)
        n_distinct = np.add.reduceat(distinct_mask.astype(np.int64), starts)
        dup = (n_grams - n_distinct) * 1000 // n_grams
        return pa.table({
            id_col: pa.array(seg_ids, type=pa.int64()),
            "n_grams": pa.array(n_grams, type=pa.int64()),
            "n_distinct": pa.array(n_distinct, type=pa.int64()),
            "dup_permille": pa.array(dup, type=pa.int64()),
        })

    return docs.map_batches(stats, batch_format="pyarrow")


# --- cross-corpus gram document frequency --------------------------------------

def gram_doc_freq(docs, *, n: int = 2, min_docs: int = 1,
                  id_col: str = "doc_id", text_col: str = "text",
                  num_partitions: int | None = None):
    """Boilerplate detection: for every ``n``-gram, the number of DISTINCT
    documents containing it, thresholded at ``min_docs`` — grams shared by
    a large corpus fraction are navigation chrome / templates, the
    standard pre-dedup cleanup signal.

    Pre-aggregated the whole way: per-doc in-batch gram dedup (each doc
    lives in one batch row), a per-batch pandas count collapses to ONE
    partial row per (gram, batch), and the single gram-keyed exchange
    moves O(distinct grams per batch) rows — never O(gram occurrences).
    Output: ``(gram, doc_freq)`` for grams in ≥ ``min_docs`` docs."""
    from oma_ray.pipelines.queries import _grouped_sums

    def partial(batch: pa.Table) -> pd.DataFrame:
        out = window_explode(batch, text_col=text_col, id_col=id_col,
                             width=n, stride=1, full_only=True)
        if not out.num_rows:
            return pd.DataFrame({"gram": pd.Series([], dtype=object),
                                 "doc_freq": pd.Series([], dtype=np.int64)})
        ids = out.column(id_col).to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(out.column("gram")).combine_chunks() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _pair_distinct(ids, codes)
        return pd.DataFrame({
            "gram": out.column("gram").filter(pa.array(keep)).to_pandas(),
            "doc_freq": np.ones(int(keep.sum()), dtype=np.int64),
        })

    freq = _grouped_sums(docs, ["gram"], partial, ["doc_freq"],
                         num_partitions=num_partitions)

    def threshold(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or "doc_freq" not in batch.column_names:
            return pa.table({"gram": pa.array([], type=pa.string()),
                             "doc_freq": pa.array([], type=pa.int64())})
        return batch.filter(
            pc.greater_equal(batch.column("doc_freq"), min_docs))

    return freq.map_batches(threshold, batch_format="pyarrow")


# --- near-dup clustering via rare shared n-grams ----------------------------

def rare_gram_edges(docs, *, n: int = 3, max_df: int = 3,
                    id_col: str = "doc_id", text_col: str = "text",
                    num_partitions: int | None = None):
    """Dataset[(a, b)] — chain edges between documents sharing a RARE
    ``n``-gram (global doc-freq in [2, ``max_df``]).

    Per gram, the sorted member docs are linked as a CHAIN (d1-d2, d2-d3,
    …), not a clique — linear edge count, same connected components.  The
    single gram-keyed exchange moves distinct (gram, doc) pairs, exactly
    the volume ``gram_doc_freq`` already moves; boilerplate grams (the
    skew hazard — one gram keyed to O(corpus) docs) are collapsed at
    BATCH granularity: a gram with > ``max_df`` distinct docs inside one
    batch is globally over the cap, so its rows are replaced by ONE
    overflow sentinel row (doc_id = -1) and any post-exchange group
    containing a sentinel is dropped.  Groups without sentinels carry
    every one of their global rows, so their size IS the global doc-freq
    — batch splits cannot make an over-cap gram look rare.  Per-key
    exchange volume is bounded by max_df × n_batches + sentinels.
    """
    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import _schema_anchor, ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()

    def partial(batch: pa.Table) -> pa.Table:
        out = window_explode(batch, text_col=text_col, id_col=id_col,
                             width=n, stride=1, full_only=True)
        empty = pa.table({"gram": pa.array([], type=pa.string()),
                          id_col: pa.array([], type=pa.int64())})
        if not out.num_rows:
            return empty
        ids = out.column(id_col).to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(out.column("gram")).combine_chunks() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _pair_distinct(ids, codes)
        ids, codes = ids[keep], codes[keep]
        gram = out.column("gram").filter(pa.array(keep))
        # batch-local overflow collapse (see docstring): over-cap grams
        # shrink to one sentinel row so the exchange stays skew-bounded
        # while post-exchange group sizes remain exact for rare grams
        df_local = np.bincount(codes, minlength=int(codes.max()) + 1)
        over = df_local[codes] > max_df
        ok = ~over
        if isinstance(gram, pa.ChunkedArray):
            gram = gram.combine_chunks()
        n_over = int(np.count_nonzero(np.unique(codes[over]) >= 0)) \
            if over.any() else 0
        if n_over:
            first_over = _segment_first(codes, ids) & over
            gram = pa.concat_arrays(
                [gram.filter(pa.array(ok)),
                 gram.filter(pa.array(first_over))]
            )
            ids = np.concatenate(
                [ids[ok], np.full(n_over, -1, dtype=np.int64)]
            )
        else:
            gram = gram.filter(pa.array(ok))
            ids = ids[ok]
        return pa.table({"gram": gram,
                         id_col: pa.array(ids, type=pa.int64())})

    def edges_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64())})
        if not batch.num_rows or "gram" not in batch.column_names:
            return empty
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(batch.column("gram")).combine_chunks() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, codes))
        c, d = codes[order], ids[order]
        new = np.ones(len(c), dtype=bool)
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(c)))
        # a sentinel (-1 sorts first in its group) marks an over-cap gram
        keep_group = (sizes >= 2) & (sizes <= max_df) & (d[starts] != -1)
        in_kept = np.repeat(keep_group, sizes)
        link = (~new[1:]) & in_kept[1:]
        a, b = d[:-1][link], d[1:][link]
        keep = _pair_distinct(a, b)
        return pa.table({"a": pa.array(a[keep], type=pa.int64()),
                         "b": pa.array(b[keep], type=pa.int64())})

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .repartition(num_partitions, keys=["gram"])
        .map_batches(edges_block, batch_format="pyarrow")
    )
    return _schema_anchor(out, pa.table({
        "a": pa.array([], type=pa.int64()),
        "b": pa.array([], type=pa.int64()),
    }))


def dup_clusters(docs, *, n: int = 3, max_df: int = 3,
                 id_col: str = "doc_id", text_col: str = "text",
                 num_partitions: int | None = None):
    """(doc_id, canon_id) for every document in a near-dup cluster —
    rare-shared-``n``-gram edges → connected components → canonical id =
    the cluster's minimum doc id (stages/cc.py min-label convention, so
    the DuckDB recursive-CTE oracle reproduces it exactly)."""
    from oma_ray.stages.cc import connected_components

    edges = rare_gram_edges(docs, n=n, max_df=max_df, id_col=id_col,
                            text_col=text_col, num_partitions=num_partitions)
    comp = connected_components(edges, "a", "b",
                                num_partitions=num_partitions)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "canon_id"])

    return comp.map_batches(rename, batch_format="pyarrow")
