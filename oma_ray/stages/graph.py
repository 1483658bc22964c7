"""Distributed graph analytics over extracted edge tables (host link graph).

Complements ``stages/cc.py`` (components, PageRank) with the two classic
edge-shape statistics a web-graph pipeline reports: exact triangle counting
and edge reciprocity.

Triangle counting uses the standard degree-oriented wedge algorithm
(MapReduce "node-iterator++"): orient every undirected edge from its
lower-(degree, id) endpoint to the higher one, generate wedges only among a
pivot's HIGHER-ordered neighbors, and close them against the edge set.
Degree orientation bounds total wedge work at O(m^1.5) regardless of hub
skew — an id-only orientation would let one 10^6-degree hub emit 10^12
wedges.  Every step is a keyed exchange + block-local vectorized kernel:

1. symmetric adjacency → per-endpoint degree (one grouped sum),
2. degree attach to the non-pivot endpoint (one tagged-union exchange),
3. wedge generation grouped by pivot (pivot degree = its group size —
   free), pairs via ``np.triu_indices`` segments,
4. wedge ∈ edge-set membership by lexsort group boundaries (no composite
   int key — ids stay raw int64, the 10^12-id convention).

No driver-side state anywhere; every intermediate is a Dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _empty(schema: dict[str, pa.DataType]) -> pa.Table:
    return pa.table({k: pa.array([], type=v) for k, v in schema.items()})


def host_edge_ints(edges, src_col: str = "src_host",
                   dst_col: str = "dst_host"):
    """(src, dst) int64 rows from a host-pair table (self-loops dropped,
    multiplicity collapsed per batch; global dedup happens at the first
    keyed exchange of whichever consumer runs next)."""
    from oma_ray.stages.links import host_int

    def ints(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return _empty({"src": pa.int64(), "dst": pa.int64()})
        s = host_int(batch.column(src_col)).to_numpy(zero_copy_only=False)
        d = host_int(batch.column(dst_col)).to_numpy(zero_copy_only=False)
        keep = s != d
        return pa.table({"src": pa.array(s[keep], type=pa.int64()),
                         "dst": pa.array(d[keep], type=pa.int64())})

    return edges.map_batches(ints, batch_format="pyarrow")


def _und_distinct(edges, num_partitions: int):
    """Globally-distinct undirected (a<b) edges via one keyed exchange."""
    from oma_ray.stages.curation import _pair_distinct
    from oma_ray.stages.dedup import _schema_anchor

    def fold(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or "src" not in batch.column_names:
            return _empty({"a": pa.int64(), "b": pa.int64()})
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        nl = s != d  # simple graph: self-loops out
        s, d = s[nl], d[nl]
        a, b = np.minimum(s, d), np.maximum(s, d)
        keep = _pair_distinct(a, b)
        return pa.table({"a": pa.array(a[keep], type=pa.int64()),
                         "b": pa.array(b[keep], type=pa.int64())})

    def dedup(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or "a" not in batch.column_names:
            return _empty({"a": pa.int64(), "b": pa.int64()})
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        keep = _pair_distinct(a, b)
        return pa.table({"a": pa.array(a[keep], type=pa.int64()),
                         "b": pa.array(b[keep], type=pa.int64())})

    out = (
        edges.map_batches(fold, batch_format="pyarrow")
        .repartition(num_partitions, keys=["a", "b"])
        .map_batches(dedup, batch_format="pyarrow")
    )
    return _schema_anchor(out, _empty({"a": pa.int64(), "b": pa.int64()}))


def triangle_count(edges, num_partitions: int | None = None) -> pa.Table:
    """Exact triangle count of the undirected simple graph underlying the
    (src, dst) edge Dataset.  Returns a 1-row table
    ``(n_edges, n_wedges, n_triangles)``."""
    from oma_ray.cluster import default_partitions
    from oma_ray.pipelines.queries import _grouped_sums
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = max(1, default_partitions() // 2)

    und = _und_distinct(edges, num_partitions).materialize()
    n_edges = und.count()

    # 1. degrees over the symmetric adjacency
    def deg_partial(batch: pa.Table) -> pd.DataFrame:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pd.DataFrame({"node": np.concatenate([a, b]),
                             "deg": np.ones(2 * len(a), dtype=np.int64)})

    deg = _grouped_sums(und, ["node"], deg_partial, ["deg"], num_partitions)

    # 2. attach deg(v) to adjacency rows keyed by v (tagged union exchange)
    def adj_rows(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or "a" not in batch.column_names:
            return _empty({"u": pa.int64(), "v": pa.int64(),
                           "deg": pa.int64()})
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([a, b]), type=pa.int64()),
            "v": pa.array(np.concatenate([b, a]), type=pa.int64()),
            "deg": pa.array(np.full(2 * len(a), -1, dtype=np.int64)),
        })

    def deg_rows(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or "node" not in batch.column_names:
            return _empty({"u": pa.int64(), "v": pa.int64(),
                           "deg": pa.int64()})
        return pa.table({
            "u": pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
            "v": batch.column("node"),
            "deg": batch.column("deg"),
        })

    tagged = und.map_batches(adj_rows, batch_format="pyarrow").union(
        deg.map_batches(deg_rows, batch_format="pyarrow")
    ).repartition(num_partitions, keys=["v"])

    def attach(batch: pa.Table) -> pa.Table:
        out_schema = {"u": pa.int64(), "v": pa.int64(), "deg_v": pa.int64()}
        if not batch.num_rows or "v" not in batch.column_names:
            return _empty(out_schema)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        dg = batch.column("deg").to_numpy(zero_copy_only=False)
        is_deg = u == -1
        # map v -> deg via sorted lookup over this block's deg rows (every
        # row with key v is in this block, including its deg row)
        dv, dd = v[is_deg], dg[is_deg]
        o = np.argsort(dv, kind="stable")
        dv, dd = dv[o], dd[o]
        adj = ~is_deg
        pos = np.searchsorted(dv, v[adj])
        return pa.table({
            "u": pa.array(u[adj], type=pa.int64()),
            "v": pa.array(v[adj], type=pa.int64()),
            "deg_v": pa.array(dd[pos], type=pa.int64()),
        })

    adj_degv = tagged.map_batches(attach, batch_format="pyarrow")

    # 3. wedges among each pivot's higher-(deg, id) neighbors
    def wedges_block(batch: pa.Table) -> pa.Table:
        out_schema = {"a": pa.int64(), "b": pa.int64(),
                      "tag": pa.int64()}
        if not batch.num_rows or "u" not in batch.column_names:
            return _empty(out_schema)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        dv = batch.column("deg_v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, dv, u))  # group by u, neighbors by (deg, id)
        su, sv, sdv = u[order], v[order], dv[order]
        new = np.ones(len(su), dtype=bool)
        new[1:] = su[1:] != su[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(su)))
        deg_u = np.repeat(sizes, sizes)  # pivot degree = group size
        higher = (sdv > deg_u) | ((sdv == deg_u) & (sv > su))
        # re-segment the kept (higher-ordered) neighbors per pivot
        kept_per_grp = np.add.reduceat(higher.astype(np.int64), starts)
        kv = sv[higher]
        ks = np.concatenate([[0], np.cumsum(kept_per_grp)[:-1]])
        from oma_ray.stages.dedup import pair_indices

        ia, ib = pair_indices(
            [(int(s), int(s + c)) for s, c in zip(ks, kept_per_grp) if c >= 2]
        )
        if not len(ia):
            return _empty(out_schema)
        x, y = kv[ia], kv[ib]
        return pa.table({
            "a": pa.array(np.minimum(x, y), type=pa.int64()),
            "b": pa.array(np.maximum(x, y), type=pa.int64()),
            "tag": pa.array(np.ones(len(x), dtype=np.int64)),
        })

    wedges = adj_degv.repartition(num_partitions, keys=["u"]).map_batches(
        wedges_block, batch_format="pyarrow"
    )

    # 4. close wedges against the edge set (tagged union, one exchange)
    def edge_tag(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or "a" not in batch.column_names:
            return _empty({"a": pa.int64(), "b": pa.int64(),
                           "tag": pa.int64()})
        return batch.append_column(
            "tag", pa.array(np.zeros(batch.num_rows, dtype=np.int64)))

    def close_block(batch: pa.Table) -> pd.DataFrame:
        if not batch.num_rows or "a" not in batch.column_names:
            return pd.DataFrame({"k": np.array([0], dtype=np.int64),
                                 "n_wedges": np.array([0], dtype=np.int64),
                                 "n_triangles": np.array([0], dtype=np.int64)})
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        t = batch.column("tag").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, b, a))  # edges (tag 0) first within a pair
        sa, sb, st = a[order], b[order], t[order]
        new = np.ones(len(sa), dtype=bool)
        new[1:] = (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(sa)))
        has_edge = st[starts] == 0
        wedge_rows = sizes - has_edge.astype(np.int64)
        tri = int((wedge_rows * has_edge).sum())
        return pd.DataFrame({"k": np.array([0], dtype=np.int64),
                             "n_wedges": np.array([int(st.sum())],
                                                  dtype=np.int64),
                             "n_triangles": np.array([tri], dtype=np.int64)})

    closed = _grouped_sums(
        und.map_batches(edge_tag, batch_format="pyarrow").union(wedges)
        .repartition(num_partitions, keys=["a", "b"]),
        ["k"], close_block, ["n_wedges", "n_triangles"], 1,
    ).to_pandas()
    n_w = int(closed["n_wedges"].sum()) if len(closed) else 0
    n_t = int(closed["n_triangles"].sum()) if len(closed) else 0
    return pa.table({
        "n_edges": pa.array([n_edges], type=pa.int64()),
        "n_wedges": pa.array([n_w], type=pa.int64()),
        "n_triangles": pa.array([n_t], type=pa.int64()),
    })


def triangle_per_node(edges, num_partitions: int | None = None):
    """Per-node triangle counts — the local-clustering front: the same
    degree-oriented wedge plan as :func:`triangle_count` (each triangle
    forms exactly ONE wedge, at its lowest-(deg, id) corner), but wedge
    rows carry their pivot and the close stage credits all THREE corners
    of every closed wedge into a node-keyed sum.  Returns a Dataset of
    (node, n_tri) for nodes in ≥ 1 triangle."""
    from oma_ray.cluster import default_partitions
    from oma_ray.pipelines.queries import _grouped_sums
    from oma_ray.stages.dedup import ensure_hash_shuffle, pair_indices

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = max(1, default_partitions() // 2)

    und = _und_distinct(edges, num_partitions).materialize()

    def deg_partial(batch: pa.Table) -> pd.DataFrame:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pd.DataFrame({"node": np.concatenate([a, b]),
                             "deg": np.ones(2 * len(a), dtype=np.int64)})

    deg = _grouped_sums(und, ["node"], deg_partial, ["deg"],
                        num_partitions)

    def adj_rows(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or "a" not in batch.column_names:
            return _empty({"u": pa.int64(), "v": pa.int64(),
                           "deg": pa.int64()})
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([a, b]), type=pa.int64()),
            "v": pa.array(np.concatenate([b, a]), type=pa.int64()),
            "deg": pa.array(np.full(2 * len(a), -1, dtype=np.int64))})

    def deg_rows(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or "node" not in batch.column_names:
            return _empty({"u": pa.int64(), "v": pa.int64(),
                           "deg": pa.int64()})
        return pa.table({
            "u": pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
            "v": batch.column("node"),
            "deg": batch.column("deg")})

    tagged = und.map_batches(adj_rows, batch_format="pyarrow").union(
        deg.map_batches(deg_rows, batch_format="pyarrow")
    ).repartition(num_partitions, keys=["v"])

    def attach(batch: pa.Table) -> pa.Table:
        out_schema = {"u": pa.int64(), "v": pa.int64(),
                      "deg_v": pa.int64()}
        if not batch.num_rows or "v" not in batch.column_names:
            return _empty(out_schema)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        dg = batch.column("deg").to_numpy(zero_copy_only=False)
        is_deg = u == -1
        dv, dd = v[is_deg], dg[is_deg]
        o = np.argsort(dv, kind="stable")
        dv, dd = dv[o], dd[o]
        adj = ~is_deg
        pos = np.searchsorted(dv, v[adj])
        return pa.table({
            "u": pa.array(u[adj], type=pa.int64()),
            "v": pa.array(v[adj], type=pa.int64()),
            "deg_v": pa.array(dd[pos], type=pa.int64())})

    adj_degv = tagged.map_batches(attach, batch_format="pyarrow")

    def wedges_block(batch: pa.Table) -> pa.Table:
        out_schema = {"a": pa.int64(), "b": pa.int64(),
                      "pivot": pa.int64()}
        if not batch.num_rows or "u" not in batch.column_names:
            return _empty(out_schema)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        dv = batch.column("deg_v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, dv, u))
        su, sv, sdv = u[order], v[order], dv[order]
        new = np.ones(len(su), dtype=bool)
        new[1:] = su[1:] != su[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(su)))
        deg_u = np.repeat(sizes, sizes)
        higher = (sdv > deg_u) | ((sdv == deg_u) & (sv > su))
        kept_per_grp = np.add.reduceat(higher.astype(np.int64), starts)
        kv = sv[higher]
        ku = su[higher]
        ks = np.concatenate([[0], np.cumsum(kept_per_grp)[:-1]])
        ia, ib = pair_indices(
            [(int(s), int(s + c))
             for s, c in zip(ks, kept_per_grp) if c >= 2])
        if not len(ia):
            return _empty(out_schema)
        x, y = kv[ia], kv[ib]
        return pa.table({
            "a": pa.array(np.minimum(x, y), type=pa.int64()),
            "b": pa.array(np.maximum(x, y), type=pa.int64()),
            "pivot": pa.array(ku[ia], type=pa.int64())})

    wedges = adj_degv.repartition(num_partitions, keys=["u"]).map_batches(
        wedges_block, batch_format="pyarrow")

    def edge_tag(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or "a" not in batch.column_names:
            return _empty({"a": pa.int64(), "b": pa.int64(),
                           "pivot": pa.int64()})
        return batch.append_column(
            "pivot", pa.array(np.full(batch.num_rows, -1,
                                      dtype=np.int64)))

    def close_block(batch: pa.Table) -> pd.DataFrame:
        empty = pd.DataFrame({"node": np.array([], dtype=np.int64),
                              "n_tri": np.array([], dtype=np.int64)})
        if not batch.num_rows or "a" not in batch.column_names:
            return empty
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        p = batch.column("pivot").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, b, a))  # edge rows (pivot -1) first
        sa, sb, sp = a[order], b[order], p[order]
        new = np.ones(len(sa), dtype=bool)
        new[1:] = (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(sa)))
        has_edge = sp[starts] == -1
        closed = np.repeat(has_edge, sizes) & (sp != -1)
        if not closed.any():
            return empty
        nodes = np.concatenate([sa[closed], sb[closed], sp[closed]])
        df = (pd.DataFrame({"node": nodes,
                            "n_tri": np.ones(len(nodes), np.int64)})
              .groupby("node", as_index=False)["n_tri"].sum())
        return df

    return _grouped_sums(
        und.map_batches(edge_tag, batch_format="pyarrow").union(wedges)
        .repartition(num_partitions, keys=["a", "b"]),
        ["node"], close_block, ["n_tri"], num_partitions)


def reciprocity(edges, num_partitions: int | None = None) -> pa.Table:
    """1-row table ``(n_directed, n_mutual)`` — distinct directed edges
    (self-loops excluded) and unordered pairs linked in BOTH directions.
    One unordered-pair-keyed exchange; each pair's ≤2 directions land in
    one block."""
    from oma_ray.cluster import default_partitions
    from oma_ray.pipelines.queries import _grouped_sums
    from oma_ray.stages.curation import _pair_distinct
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = max(1, default_partitions() // 2)

    def fold(batch: pa.Table) -> pa.Table:
        schema = {"a": pa.int64(), "b": pa.int64(), "fwd": pa.int64()}
        if not batch.num_rows or "src" not in batch.column_names:
            return _empty(schema)
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        nl = s != d  # self-loops out
        s, d = s[nl], d[nl]
        a, b = np.minimum(s, d), np.maximum(s, d)
        fwd = (s < d).astype(np.int64)
        keep = _pair_distinct(a, b * 2 + fwd)
        return pa.table({"a": pa.array(a[keep], type=pa.int64()),
                         "b": pa.array(b[keep], type=pa.int64()),
                         "fwd": pa.array(fwd[keep], type=pa.int64())})

    def count_block(batch: pa.Table) -> pd.DataFrame:
        if not batch.num_rows or "a" not in batch.column_names:
            return pd.DataFrame({"k": np.array([0], dtype=np.int64),
                                 "n_directed": np.array([0], dtype=np.int64),
                                 "n_mutual": np.array([0], dtype=np.int64)})
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        f = batch.column("fwd").to_numpy(zero_copy_only=False)
        keep = _pair_distinct(a, b * 2 + f)  # global dedup after exchange
        a, b, f = a[keep], b[keep], f[keep]
        order = np.lexsort((f, b, a))
        sa, sb = a[order], b[order]
        new = np.ones(len(sa), dtype=bool)
        new[1:] = (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(sa)))
        return pd.DataFrame({
            "k": np.array([0], dtype=np.int64),
            "n_directed": np.array([len(sa)], dtype=np.int64),
            "n_mutual": np.array([int((sizes == 2).sum())], dtype=np.int64),
        })

    out = _grouped_sums(
        edges.map_batches(fold, batch_format="pyarrow")
        .repartition(num_partitions, keys=["a", "b"]),
        ["k"], count_block, ["n_directed", "n_mutual"], 1,
    ).to_pandas()
    nd = int(out["n_directed"].sum()) if len(out) else 0
    nm = int(out["n_mutual"].sum()) if len(out) else 0
    return pa.table({"n_directed": pa.array([nd], type=pa.int64()),
                     "n_mutual": pa.array([nm], type=pa.int64())})


def _peel_numpy(a: np.ndarray, b: np.ndarray, k: int):
    """Single-machine k-core peel over distinct undirected (a<b) edges:
    returns (node, deg) for the k-core subgraph and the round count."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    alive = np.ones(len(nodes), dtype=bool)
    rounds = 0
    while True:
        m = alive[ia] & alive[ib]
        deg = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(deg, ia[m], 1)
        np.add.at(deg, ib[m], 1)
        doomed = alive & (deg < k)
        if not doomed.any():
            break
        alive &= ~doomed
        rounds += 1
    keep = alive & (deg >= k)
    return nodes[keep], deg[keep], rounds


def kcore(edges, k: int, num_partitions: int | None = None,
          driver_max_edges: int = 2_000_000, max_rounds: int = 64):
    """k-core decomposition (fixed k): iteratively peel nodes of degree
    < k from the distinct undirected simple graph until stable; returns
    ``(node, deg)`` rows for the surviving core subgraph.

    Two regimes (the `connected_components` pattern): below
    ``driver_max_edges`` the peel runs as a bounded driver pull +
    numpy loop; above it, each round is (1) a degree exchange over the
    remaining edge endpoints, (2) a doomed-node filter, and (3) TWO
    tagged-union exchanges dropping edges incident to doomed nodes (one
    per endpoint — an anti-join by co-location, no broadcast of the
    doomed set).  Rounds are data-dependent but bounded by the graph's
    degeneracy ordering depth; ``max_rounds`` guards the fixpoint.

    Input: ``(src, dst)`` int64 rows (multiplicity/self-loops collapsed
    by `_und_distinct`).
    """
    import ray.data as rd

    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import _schema_anchor, ensure_hash_shuffle

    ensure_hash_shuffle()
    parts = num_partitions or default_partitions()
    und = _und_distinct(edges, parts).materialize()
    out_empty = _empty({"node": pa.int64(), "deg": pa.int64()})
    if und.count() == 0:
        return rd.from_arrow(out_empty)

    if und.count() <= driver_max_edges:
        df = und.to_pandas()
        nodes, deg, _ = _peel_numpy(df["a"].to_numpy(np.int64),
                                    df["b"].to_numpy(np.int64), k)
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, type=pa.int64()),
            "deg": pa.array(deg, type=pa.int64())}))

    def degrees(ed):
        def partial(batch: pa.Table) -> pa.Table:
            if not batch.num_rows or "a" not in batch.column_names:
                return _empty({"node": pa.int64(), "dp": pa.int64()})
            ends = np.concatenate([
                batch.column("a").to_numpy(zero_copy_only=False),
                batch.column("b").to_numpy(zero_copy_only=False)])
            n, c = np.unique(ends, return_counts=True)
            return pa.table({"node": pa.array(n, type=pa.int64()),
                             "dp": pa.array(c.astype(np.int64))})

        def combine(batch: pa.Table) -> pa.Table:
            if not batch.num_rows or "node" not in batch.column_names:
                return _empty({"node": pa.int64(), "deg": pa.int64()})
            nd = batch.column("node").to_numpy(zero_copy_only=False)
            dp = batch.column("dp").to_numpy(zero_copy_only=False)
            order = np.argsort(nd, kind="stable")
            nd, dp = nd[order], dp[order]
            bounds = np.flatnonzero(np.diff(nd)) + 1
            starts = np.r_[0, bounds]
            sums = np.add.reduceat(dp, starts)
            return pa.table({"node": pa.array(nd[starts]),
                             "deg": pa.array(sums.astype(np.int64))})

        out = (ed.map_batches(partial, batch_format="pyarrow")
               .repartition(parts, keys=["node"])
               .map_batches(combine, batch_format="pyarrow"))
        return _schema_anchor(out, _empty({"node": pa.int64(),
                                           "deg": pa.int64()}))

    def drop_incident(ed, doomed, end_col: str):
        """Anti-join by co-location: edges keyed by one endpoint union the
        doomed node list; a block drops its edges whose key is doomed."""
        def tag_edge(batch: pa.Table) -> pa.Table:
            if not batch.num_rows or "a" not in batch.column_names:
                return _empty({"key": pa.int64(), "a": pa.int64(),
                               "b": pa.int64(), "is_doom": pa.int64()})
            return pa.table({
                "key": batch.column(end_col),
                "a": batch.column("a"), "b": batch.column("b"),
                "is_doom": pa.array(np.zeros(batch.num_rows, np.int64))})

        def tag_doom(batch: pa.Table) -> pa.Table:
            if not batch.num_rows or "node" not in batch.column_names:
                return _empty({"key": pa.int64(), "a": pa.int64(),
                               "b": pa.int64(), "is_doom": pa.int64()})
            key = batch.column("node")
            z = pa.array(np.zeros(batch.num_rows, np.int64))
            return pa.table({"key": key, "a": z, "b": z,
                             "is_doom": pa.array(
                                 np.ones(batch.num_rows, np.int64))})

        def anti(batch: pa.Table) -> pa.Table:
            if not batch.num_rows or "key" not in batch.column_names:
                return _empty({"a": pa.int64(), "b": pa.int64()})
            key = batch.column("key").to_numpy(zero_copy_only=False)
            doom = batch.column("is_doom").to_numpy(
                zero_copy_only=False).astype(bool)
            bad = np.isin(key, np.unique(key[doom]))
            keep = ~doom & ~bad
            return pa.table({"a": batch.column("a").filter(pa.array(keep)),
                             "b": batch.column("b").filter(pa.array(keep))})

        mixed = (ed.map_batches(tag_edge, batch_format="pyarrow")
                 .union(doomed.map_batches(tag_doom,
                                           batch_format="pyarrow"))
                 .repartition(parts, keys=["key"])
                 .map_batches(anti, batch_format="pyarrow"))
        return _schema_anchor(mixed, _empty({"a": pa.int64(),
                                             "b": pa.int64()}))

    for _ in range(max_rounds):
        deg = degrees(und).materialize()
        doomed = deg.filter(expr=f"deg < {k}").materialize()
        if doomed.count() == 0:
            return deg.filter(expr=f"deg >= {k}")
        und = drop_incident(und, doomed, "a")
        und = drop_incident(und, doomed, "b").materialize()
        if und.count() == 0:
            return rd.from_arrow(out_empty)
    raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")
