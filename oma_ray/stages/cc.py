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
        import pyarrow.compute as pc

        if not len(batch):
            return batch
        # filter the tagged union IN ARROW before touching columns: a
        # whole-batch pandas conversion routes the null-padded int columns
        # through float64, which silently rounds node ids / labels above
        # 2^53 — at web scale node ids are often 64-bit hashes, exactly
        # that range (same hazard class as the pagerank kernels)
        kind = batch.column("kind")
        lab_rows = batch.filter(pc.equal(kind, 1))
        edge_rows = batch.filter(pc.equal(kind, 0))
        lnodes = (
            lab_rows.column("node").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        lvals = (
            lab_rows.column("lab").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.argsort(lnodes)
        lnodes, lvals = lnodes[order], lvals[order]
        # every src in this block has its one label row co-located here
        idx = np.searchsorted(
            lnodes,
            edge_rows.column("node").to_numpy(zero_copy_only=False)
            .astype(np.int64),
        )
        node = np.concatenate([
            edge_rows.column("dst").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            lnodes,
        ])
        lab = np.concatenate([lvals[idx], lvals])
        o2 = np.lexsort((lab, node))
        node, lab = node[o2], lab[o2]
        new = np.ones(len(node), dtype=bool)
        new[1:] = node[1:] != node[:-1]
        starts = np.nonzero(new)[0]
        return pa.table(
            {"node": pa.array(node[starts], type=pa.int64()),
             "lab": pa.array(lab[starts], type=pa.int64())}
        )

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


# --- fixed-point PageRank (iterative weighted propagation) -------------------

def pagerank_int(edges_ds, n_nodes: int, iters: int = 3,
                 damping_pct: int = 85, scale: int = 1_000_000,
                 num_partitions: int | None = None,
                 dist_min_nodes: int = 2_000_000):
    """Integer fixed-point PageRank over (src, dst) edges with UNIFORM
    out-degree per src (the fixture's contract): ``iters`` rounds of
    s' = (100-d)%·scale/100 + d%·Σ_in s[src]//(outdeg·100//…) — all
    integer arithmetic (``//`` floor), so the result is bit-exact and a
    DuckDB oracle can unroll the same iterations as chained CTEs.

    Shape per iteration: one keyed exchange of per-batch PARTIAL
    contribution sums (O(dst-keys·batches) rows move, not edges), then a
    tiny driver-side vector update — the scores vector is O(n_nodes)
    ints, broadcast per iteration via ``ray.put``.  Above
    ``dist_min_nodes`` this routes to ``pagerank_int_dist`` (bit-identical,
    scores as a Dataset, the update a second keyed exchange) — the driver
    vector is a deliberate FAST PATH for small graphs, not a scale ceiling.
    The edge list is deliberately RE-READ per iteration
    rather than materialized: at graph scale pinning every edge in the
    object store for the whole job costs more than streaming the (cheap,
    column-pruned) scan again — the standard iterative-job tradeoff.
    Node ids must be dense in [0, n_nodes).  CC (min-label fixpoint)
    covers unweighted propagation; this is the weighted variant with
    per-iteration renormalization.
    """
    import pandas as pd
    import ray

    from oma_ray.cluster import default_partitions
    from oma_ray.pipelines.queries import _grouped_sums
    from oma_ray.stages.taskcache import CachedStage

    if n_nodes >= dist_min_nodes:
        # web-graph regime: the O(n_nodes) driver vector below would not
        # fit / re-broadcast cheaply — switch to the score-as-Dataset path
        # (bit-identical results; forced-gate parity test in test_cc.py)
        return pagerank_int_dist(
            edges_ds, n_nodes, iters=iters, damping_pct=damping_pct,
            scale=scale, num_partitions=num_partitions,
        )

    if num_partitions is None:
        num_partitions = max(1, default_partitions() // 2)

    # out-degrees: one grouped count over the edge list
    def deg_partial(batch: pa.Table) -> pd.DataFrame:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {"src": src, "outdeg": np.ones(len(src), dtype=np.int64)}
        )

    deg_df = (
        _grouped_sums(edges_ds, ["src"], deg_partial, ["outdeg"],
                      num_partitions)
        .to_pandas()
    )
    outdeg = np.zeros(n_nodes, dtype=np.int64)
    outdeg[deg_df["src"].to_numpy()] = deg_df["outdeg"].to_numpy()

    scores = np.full(n_nodes, scale, dtype=np.int64)
    base = (100 - damping_pct) * scale // 100

    class Contrib:
        """Per-batch partial: share[src] gathered per edge (the _grouped_sums
        combiner then sums by dst)."""

        def __init__(self, share_ref):
            self.share = (
                ray.get(share_ref)
                if isinstance(share_ref, ray.ObjectRef) else share_ref
            )

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            return pd.DataFrame({"dst": dst, "c": self.share[src]})

    for _ in range(iters):
        # per-src share of its score along each out-edge, precomputed once
        share = np.zeros(n_nodes, dtype=np.int64)
        nz = outdeg > 0
        share[nz] = damping_pct * scores[nz] // (100 * outdeg[nz])
        sums = _grouped_sums(
            edges_ds, ["dst"],
            CachedStage(Contrib, ray.put(share), slot="pagerank_share"),
            ["c"], num_partitions,
        ).to_pandas()
        scores = np.full(n_nodes, base, dtype=np.int64)
        if len(sums):
            scores[sums["dst"].to_numpy()] += sums["c"].to_numpy()

    return pa.table(
        {
            "node": pa.array(np.arange(n_nodes, dtype=np.int64)),
            "score": pa.array(scores, type=pa.int64()),
        }
    )


def pagerank_int_dist(edges_ds, n_nodes: int, iters: int = 3,
                      damping_pct: int = 85, scale: int = 1_000_000,
                      num_partitions: int | None = None):
    """Fully-DISTRIBUTED fixed-point PageRank: scores live in a Dataset
    keyed by node, never on the driver (the web-graph path — pagerank_int's
    O(n_nodes) driver vector re-broadcast per round is its one scale seam).

    Bit-identical integer semantics to ``pagerank_int`` (same share /
    floor-div / base formulas; parity-tested).  Per iteration, exactly two
    keyed exchanges:

      1. on ``src``: the (node, score, outdeg) state co-locates with the
         edges leaving that node; each block computes the per-src share
         ``damping%·score // (100·outdeg)`` and emits per-dst PARTIAL
         contribution sums (O(distinct dst per block) rows move);
      2. on ``dst``: partials co-locate with the static all-nodes side and
         fold into ``base + Σc`` — every node gets a row even with no
         in-edges, so sinks and isolated nodes keep the base score.

    The edge list is re-scanned per iteration (same deliberate tradeoff as
    pagerank_int: pinning every edge in the object store for the whole job
    costs more than re-streaming a column-pruned scan).  Node ids must be
    dense in [0, n_nodes).
    """
    import ray.data as rd

    from oma_ray.cluster import default_partitions
    from oma_ray.sources.parquet import from_pandas_clean
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = max(1, default_partitions() // 2)
    base = (100 - damping_pct) * scale // 100

    # static all-nodes side: (node, outdeg) — range anchor guarantees every
    # node a row; one grouped-count exchange over the edges
    def deg_partial(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"node": src, "outdeg": np.ones(len(src), np.int64)})
        return from_pandas_clean(df.groupby("node", as_index=False)["outdeg"].sum())

    def zero_nodes(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"node": pa.array(ids), "outdeg": pa.array(np.zeros(len(ids), np.int64))}
        )

    def sum_outdeg(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return batch
        agg = df.groupby("node", as_index=False)["outdeg"].sum()
        return from_pandas_clean(agg)

    nodes_static = (
        rd.range(n_nodes).map_batches(zero_nodes, batch_format="pyarrow")
        .union(edges_ds.map_batches(deg_partial, batch_format="pyarrow"))
        .repartition(num_partitions, keys=["node"])
        .map_batches(sum_outdeg, batch_format="pyarrow")
        .materialize()
    )

    def init_state(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "score", pa.array(np.full(len(batch), scale, np.int64))
        )

    state = nodes_static.map_batches(init_state, batch_format="pyarrow").materialize()

    # --- exchange 1 schema: node, dst, score, outdeg, kind --------------
    def tag_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "node": batch.column("src").cast(pa.int64()),
                "dst": batch.column("dst").cast(pa.int64()),
                "score": pa.nulls(n, type=pa.int64()),
                "outdeg": pa.nulls(n, type=pa.int64()),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def tag_state(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "node": batch.column("node"),
                "dst": pa.nulls(n, type=pa.int64()),
                "score": batch.column("score"),
                "outdeg": batch.column("outdeg"),
                "kind": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def flow(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {"node": pa.array([], type=pa.int64()),
             "c": pa.array([], type=pa.int64())}
        )
        if not len(batch):
            return empty
        # filter by kind IN ARROW before touching columns: a pandas
        # conversion of the null-padded union would go through float64 and
        # silently round scores > 2^53 (the web-graph regime this path is
        # gated to serve) — the filtered sides are null-free int64
        kind = batch.column("kind")
        st = batch.filter(pc.equal(kind, 1))
        ed = batch.filter(pc.equal(kind, 0))
        if not len(ed) or not len(st):
            return empty
        nodes = st.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        sc = st.column("score").to_numpy(zero_copy_only=False).astype(np.int64)
        od = st.column("outdeg").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(nodes)
        nodes, sc, od = nodes[order], sc[order], od[order]
        share = np.zeros(len(nodes), np.int64)
        nz = od > 0
        share[nz] = damping_pct * sc[nz] // (100 * od[nz])
        # every src in this block has its one state row co-located here
        idx = np.searchsorted(
            nodes, ed.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        dst = ed.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        c = share[idx]
        o2 = np.argsort(dst)
        dst_s, c_s = dst[o2], c[o2]
        new = np.ones(len(dst_s), dtype=bool)
        new[1:] = dst_s[1:] != dst_s[:-1]
        starts = np.nonzero(new)[0]
        return pa.table(
            {"node": pa.array(dst_s[starts], type=pa.int64()),
             "c": pa.array(np.add.reduceat(c_s, starts), type=pa.int64())}
        )

    # --- exchange 2 schema: node, outdeg, c, kind ------------------------
    def tag_static(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "node": batch.column("node"),
                "outdeg": batch.column("outdeg"),
                "c": pa.nulls(n, type=pa.int64()),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def tag_contrib(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "node": batch.column("node"),
                "outdeg": pa.nulls(n, type=pa.int64()),
                "c": batch.column("c"),
                "kind": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if not len(batch):
            return pa.table(
                {"node": pa.array([], type=pa.int64()),
                 "outdeg": pa.array([], type=pa.int64()),
                 "score": pa.array([], type=pa.int64())}
            )
        kind = batch.column("kind")
        st = batch.filter(pc.equal(kind, 0))
        co = batch.filter(pc.equal(kind, 1))
        node = st.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        od = st.column("outdeg").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(node)
        node, od = node[order], od[order]
        score = np.full(len(node), base, np.int64)
        if len(co):
            cn = co.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
            cc = co.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
            o2 = np.argsort(cn)
            cn, cc = cn[o2], cc[o2]
            new = np.ones(len(cn), dtype=bool)
            new[1:] = cn[1:] != cn[:-1]
            starts = np.nonzero(new)[0]
            pos = np.searchsorted(node, cn[starts])
            score[pos] += np.add.reduceat(cc, starts)
        return pa.table(
            {"node": pa.array(node), "outdeg": pa.array(od),
             "score": pa.array(score)}
        )

    tagged_static = nodes_static.map_batches(tag_static, batch_format="pyarrow")
    for _ in range(iters):
        contribs = (
            edges_ds.map_batches(tag_edges, batch_format="pyarrow")
            .union(state.map_batches(tag_state, batch_format="pyarrow"))
            .repartition(num_partitions, keys=["node"])
            .map_batches(flow, batch_format="pyarrow")
        )
        state = (
            tagged_static.union(
                contribs.map_batches(tag_contrib, batch_format="pyarrow")
            )
            .repartition(num_partitions, keys=["node"])
            .map_batches(combine, batch_format="pyarrow")
            .materialize()
        )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["node", "score"])

    return state.map_batches(project, batch_format="pyarrow")
