"""Deduplication operators over a documents/pages table.

All variants follow the same distributed shape (SURVEY.md §2.8 + ray guide):

- exact:    content hash per batch (vectorized) → ``groupby(hash)`` keeping
            the minimum id — a single all-to-all on the 32-byte hash, never
            on the text payload.
- MinHash:  per-doc signature (sketch) → explode to (band, band_hash, id)
            rows → ``groupby`` bands → candidate pairs → signature-estimated
            Jaccard filter.  The shuffle moves signatures (512 B/doc), not
            documents.
- SimHash:  64-bit signature → 4×16-bit band blocking → Hamming-verified
            pairs.
- Embedding near-dup: see stages/knn.py (cosine ≥ τ pairs).

Cluster resolution (keep-first): candidate pairs → connected components via
iterative min-label propagation expressed as Ray groupbys; bounded rounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from oma_ray.functions.text import band_hashes, minhash_signature, simhash64
from oma_ray.stages.textstage import Md5Hash


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the smallest ``id_col`` per distinct text (md5-keyed).

    Returns (text_md5, <id_col>) — one row per distinct content.
    """
    from ray.data.aggregate import Min

    hashed = ds.map_batches(Md5Hash(text_col), batch_format="pyarrow")
    return (
        hashed.select_columns(["text_md5", id_col])
        .groupby("text_md5")
        .aggregate(Min(id_col, alias_name=id_col))
    )


class MinHashStage:
    """Append ``minhash:list<uint64>[64]`` per document."""

    def __init__(self, text_col: str = "text", k: int = 3):
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            minhash_signature(s, self.k)
            for s in batch.column(self.text_col).to_pylist()
        ]
        arr = pa.array([s.tolist() for s in sigs], type=pa.list_(pa.uint64()))
        return batch.append_column("minhash", arr)


def _explode_bands(batch: pa.Table, id_col: str, bands: int) -> pa.Table:
    ids = batch.column(id_col).to_numpy()
    sig_list = batch.column("minhash").to_pylist()
    out_id, out_band, out_hash, out_sig = [], [], [], []
    for i, sig in enumerate(sig_list):
        bh = band_hashes(np.asarray(sig, dtype=np.uint64), bands)
        for b in range(bands):
            out_id.append(ids[i])
            out_band.append(b)
            out_hash.append(int(bh[b]))
            out_sig.append(sig)
    return pa.table(
        {
            id_col: pa.array(out_id, type=pa.int64()),
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_hash, type=pa.int64()),
            "minhash": pa.array(out_sig, type=pa.list_(pa.uint64())),
        }
    )


def minhash_candidate_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
):
    """MinHash-LSH near-duplicate pairs: (id_a, id_b, est_jaccard), id_a<id_b.

    shingle→minhash per batch, explode to band rows, groupby (band,
    band_hash), pairs within each bucket filtered by signature-estimated
    Jaccard ≥ threshold.  Pair dedup via a final groupby on (id_a, id_b).
    """
    from ray.data.aggregate import Max

    sigs = ds.map_batches(MinHashStage(text_col, k), batch_format="pyarrow")
    bandrows = sigs.select_columns([id_col, "minhash"]).map_batches(
        lambda b: _explode_bands(b, id_col, bands), batch_format="pyarrow"
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "est_jaccard": np.float64}
            )
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].to_numpy()
        sig = np.stack(g["minhash"].to_numpy())  # (n, 64)
        a_idx, b_idx = np.triu_indices(len(ids), k=1)
        est = (sig[a_idx] == sig[b_idx]).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[a_idx[keep]],
                "id_b": ids[b_idx[keep]],
                "est_jaccard": est[keep].round(6),
            }
        )

    pairs = bandrows.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # same pair can surface from multiple bands — dedup
    return (
        pairs.groupby(["id_a", "id_b"])
        .aggregate(Max("est_jaccard", alias_name="est_jaccard"))
    )


class SimHashStage:
    """Append ``simhash:uint64`` per document."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = np.array(
            [simhash64(s) for s in batch.column(self.text_col).to_pylist()],
            dtype=np.uint64,
        )
        return batch.append_column("simhash", pa.array(vals, type=pa.uint64()))


def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3):
    """SimHash near-dup pairs via 4×16-bit band blocking: two docs within
    Hamming distance ≤3 of a 64-bit signature agree exactly on ≥1 of 4
    16-bit bands (pigeonhole), so blocking on each band finds all of them."""
    from ray.data.aggregate import Min as AggMin

    from oma_ray.functions.text import hamming64

    sigs = ds.map_batches(SimHashStage(text_col), batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        out_id = np.repeat(ids, 4)
        out_band = np.tile(np.arange(4, dtype=np.int32), n)
        shr = np.repeat(sh, 4)
        shift = (np.tile(np.arange(4, dtype=np.uint64), n)) * np.uint64(16)
        out_key = ((shr >> shift) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "band_key": pa.array(out_key, type=pa.int64()),
                "simhash": pa.array(shr, type=pa.uint64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "hamming": np.int64}
            )
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        a, b = np.triu_indices(len(ids), k=1)
        d = hamming64(sh[a], sh[b])
        keep = d <= max_hamming
        return pd.DataFrame(
            {"id_a": ids[a[keep]], "id_b": ids[b[keep]], "hamming": d[keep]}
        )

    pairs = (
        sigs.select_columns([id_col, "simhash"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        AggMin("hamming", alias_name="hamming")
    )


def keep_first_from_pairs(pair_rows: list[dict], all_ids: np.ndarray) -> np.ndarray:
    """Union-find over candidate pairs → surviving (minimum) id per cluster.

    Driver-side: the pair set is the *output* of LSH blocking and is orders
    of magnitude smaller than the corpus; for pathological pair explosions
    the distributed upgrade is iterative min-label propagation (repeat:
    join labels over pairs, take min) — same fixed point.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in pair_rows:
        a, b = find(int(r["id_a"])), find(int(r["id_b"]))
        if a != b:
            if a > b:
                a, b = b, a
            parent[b] = a
    drop = {x for x in parent if find(x) != x}
    return np.array([i for i in all_ids if int(i) not in drop], dtype=np.int64)
