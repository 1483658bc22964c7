"""Connected components over a pair Dataset (engine addition — the last
step of every near-duplicate pipeline: LSH/SimHash/embedding PAIRS become
CLUSTERS, so "keep one doc per cluster" is a grouped min away.  The
reference has no graph ops; SURVEY §2.6).

Component id = MIN node id in the component — deterministic, so the whole
operator stays value-oracleable (DuckDB: recursive-CTE min-label closure).

Two regimes, the repo's usual RAM-threshold pattern:

* ``<= driver_max_edges``: numpy union-find with path halving on the
  driver.  Pair sets are the SMALL side by construction (near-dup pairs
  are a fraction of the corpus; the LSH stages cap buckets), so this is
  the common case — the same RAM assumption the membership map makes.
* above: iterative min-label propagation expressed as Dataset exchanges —
  per round, labels flow across edges (one keyed exchange co-locates each
  node's label with its outgoing edges, a second takes the grouped min),
  and the loop stops when the label-sum fixpoint is reached (labels only
  ever decrease, so an unchanged sum IS convergence).  Rounds = component
  diameter; near-dup clusters are shallow.  Labels materialize per round
  (O(nodes-in-pairs) rows) — an iterative algorithm's per-round state is
  exactly the "small result" materialization case.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def union_find_components(a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
    """(node, comp) for every node appearing in an edge — numpy union-find
    with path halving; comp = min node id of the component."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    parent = np.arange(len(nodes))
    ia, ib = inv[: len(a)], inv[len(a):]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for x, y in zip(ia, ib):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by smaller ORIGINAL id so roots track component minima
            if nodes[rx] < nodes[ry]:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.array([find(i) for i in range(len(nodes))])
    return pd.DataFrame({"node": nodes, "comp": nodes[roots]})


def connected_components(edges, a_col: str = "a", b_col: str = "b",
                         driver_max_edges: int = 2_000_000,
                         max_rounds: int = 64,
                         num_partitions: int | None = None):
    """Dataset[(node:int64, comp:int64)] for every node in ``edges``."""
    import ray.data as rd

    from oma_ray.cluster import default_partitions
    from oma_ray.sources.parquet import from_pandas_clean
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], type=pa.int64()),
                      "comp": pa.array([], type=pa.int64())})
        )
    if n_edges <= driver_max_edges:
        df = edges.to_pandas()
        out = union_find_components(
            df[a_col].to_numpy(np.int64), df[b_col].to_numpy(np.int64)
        )
        return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))

    if num_partitions is None:
        num_partitions = default_partitions()

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
        )

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def init_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "node": batch.column("src").to_numpy(zero_copy_only=False),
                "lab": np.minimum(
                    batch.column("src").to_numpy(zero_copy_only=False),
                    batch.column("dst").to_numpy(zero_copy_only=False),
                ),
            }
        )
        return from_pandas_clean(df.groupby("node", as_index=False)["lab"].min())

    def min_combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return batch
        return from_pandas_clean(df.groupby("node", as_index=False)["lab"].min())

    labels = (
        sym.map_batches(init_partial, batch_format="pyarrow")
        .repartition(num_partitions, keys=["node"])
        .map_batches(min_combine, batch_format="pyarrow")
        .materialize()
    )

    def tag_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "node": batch.column("src"),
                "dst": batch.column("dst"),
                "lab": pa.nulls(n, type=pa.int64()),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def tag_labels(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "node": batch.column("node"),
                "dst": pa.nulls(n, type=pa.int64()),
                "lab": batch.column("lab"),
                "kind": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def propagate(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return batch
        lab_rows = df[df["kind"] == 1]
        edge_rows = df[df["kind"] == 0]
        # null-padded union columns arrive as float64 in pandas (int64 has
        # no null) — cast every id/label back to int64, or the next round's
        # exchange hashes floats and stops co-locating with the int edges
        lnodes = lab_rows["node"].to_numpy(np.int64)
        lvals = lab_rows["lab"].to_numpy(np.int64)
        order = np.argsort(lnodes)
        lnodes, lvals = lnodes[order], lvals[order]
        # every src in this block has its one label row co-located here
        idx = np.searchsorted(lnodes, edge_rows["node"].to_numpy(np.int64))
        flowed = pd.DataFrame(
            {"node": edge_rows["dst"].to_numpy(np.int64), "lab": lvals[idx]}
        )
        keep = pd.DataFrame({"node": lnodes, "lab": lvals})
        out = pd.concat([flowed, keep], ignore_index=True)
        return from_pandas_clean(out.groupby("node", as_index=False)["lab"].min())

    sym_tagged = sym.map_batches(tag_edges, batch_format="pyarrow")
    prev_sum = None
    for _ in range(max_rounds):
        labels = (
            sym_tagged.union(labels.map_batches(tag_labels, batch_format="pyarrow"))
            .repartition(num_partitions, keys=["node"])
            .map_batches(propagate, batch_format="pyarrow")
            .repartition(num_partitions, keys=["node"])
            .map_batches(min_combine, batch_format="pyarrow")
            .materialize()
        )
        s = int(labels.sum(on="lab"))  # distributed agg — never pulls rows
        if s == prev_sum:
            break
        prev_sum = s

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "comp"])

    return labels.map_batches(rename, batch_format="pyarrow")
