"""Triangle counting and reciprocity (stages/graph.py) vs brute force."""

import numpy as np
import pyarrow as pa


def _edge_ds(src, dst, n_blocks=3):
    import ray.data as rd

    t = pa.table({"src": pa.array(src, type=pa.int64()),
                  "dst": pa.array(dst, type=pa.int64())})
    return rd.from_arrow(t).repartition(n_blocks)


def _brute(src, dst):
    und = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    tri = 0
    for a, b in und:
        for c in {x for x in range(0, 100)}:
            if c > b and (a, c) in und and (b, c) in und:
                tri += 1
    directed = {(a, b) for a, b in zip(src, dst) if a != b}
    mutual = sum(1 for a, b in directed if a < b and (b, a) in directed)
    return len(und), tri, len(directed), mutual


def test_triangle_and_reciprocity_match_brute_force():
    # deterministic pseudo-random multigraph on 30 nodes, with dup edges,
    # self loops, and both directions present for some pairs
    ids = np.arange(400, dtype=np.int64)
    src = (ids * 17) % 30
    dst = (ids * ids * 7 + ids) % 30
    n_edges, n_tri, n_dir, n_mut = _brute(src.tolist(), dst.tolist())

    from oma_ray.stages.graph import reciprocity, triangle_count

    for n_blocks in (1, 4):
        t = triangle_count(_edge_ds(src, dst, n_blocks), num_partitions=3)
        assert t.column("n_edges").to_pylist() == [n_edges]
        assert t.column("n_triangles").to_pylist() == [n_tri], n_blocks
        r = reciprocity(_edge_ds(src, dst, n_blocks), num_partitions=3)
        assert r.column("n_directed").to_pylist() == [n_dir]
        assert r.column("n_mutual").to_pylist() == [n_mut]


def test_triangle_known_graphs():
    from oma_ray.stages.graph import triangle_count

    # K4: 4 triangles, 6 edges
    src = [0, 0, 0, 1, 1, 2]
    dst = [1, 2, 3, 2, 3, 3]
    t = triangle_count(_edge_ds(src, dst, 2), num_partitions=2)
    assert t.column("n_edges").to_pylist() == [6]
    assert t.column("n_triangles").to_pylist() == [4]

    # path graph: no triangles
    t = triangle_count(_edge_ds([0, 1, 2], [1, 2, 3], 2), num_partitions=2)
    assert t.column("n_triangles").to_pylist() == [0]

    # empty edge set after self-loop drop
    t = triangle_count(_edge_ds([5, 6], [5, 6], 1), num_partitions=2)
    assert t.column("n_edges").to_pylist() == [0]
    assert t.column("n_triangles").to_pylist() == [0]


def test_triangle_hub_star_plus_rim():
    # wheel: hub 0 connected to rim 1..8, rim cycle 1-2-...-8-1
    from oma_ray.stages.graph import triangle_count

    rim = list(range(1, 9))
    src = [0] * 8 + rim
    dst = rim + [r % 8 + 1 for r in rim]
    t = triangle_count(_edge_ds(src, dst, 3), num_partitions=3)
    assert t.column("n_edges").to_pylist() == [16]
    assert t.column("n_triangles").to_pylist() == [8]


def test_kcore_driver_vs_distributed_parity():
    """k-core: forced-distributed regime (driver_max_edges=0, per-round
    exchanges) must equal the driver numpy peel AND a brute reference,
    on a graph with a planted clique + peelable tendrils."""
    from oma_ray.stages.graph import _peel_numpy, kcore

    rng = np.random.default_rng(51)
    # random sparse graph + a 6-clique (survives k=3) + chains (peel away)
    m = 300
    src = rng.integers(0, 80, m)
    dst = rng.integers(0, 80, m)
    cl = np.array([100, 101, 102, 103, 104, 105])
    ci, cj = np.triu_indices(6, k=1)
    src = np.concatenate([src, cl[ci], np.arange(200, 210)])
    dst = np.concatenate([dst, cl[cj], np.arange(201, 211)])

    for k in (2, 3):
        ds = _edge_ds(src, dst)
        drv = (kcore(ds, k=k).to_pandas()
               .sort_values("node").reset_index(drop=True))
        ds2 = _edge_ds(src, dst)
        dist = (kcore(ds2, k=k, driver_max_edges=0, num_partitions=3)
                .to_pandas().sort_values("node").reset_index(drop=True))
        assert drv["node"].tolist() == dist["node"].tolist(), k
        assert drv["deg"].tolist() == dist["deg"].tolist(), k

        nl = src != dst
        a = np.minimum(src[nl], dst[nl])
        b = np.maximum(src[nl], dst[nl])
        uniq = np.unique(np.stack([a, b], axis=1), axis=0)
        nodes, deg, _ = _peel_numpy(uniq[:, 0], uniq[:, 1], k)
        assert drv["node"].tolist() == sorted(int(x) for x in nodes), k
