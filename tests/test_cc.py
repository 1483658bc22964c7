"""Connected components: union-find kernel, both regimes, parity between
them on random graphs."""

import numpy as np
import pyarrow as pa
import pytest


def _ref_components(a, b):
    """Reference: repeated relaxation over a dense adjacency (slow but
    obviously correct for test sizes)."""
    nodes = np.unique(np.concatenate([a, b]))
    lab = {n: n for n in nodes}
    changed = True
    while changed:
        changed = False
        for x, y in zip(a, b):
            m = min(lab[x], lab[y])
            if lab[x] != m or lab[y] != m:
                lab[x] = lab[y] = m
                changed = True
    return lab


def test_union_find_chain_star_cycle():
    from oma_ray.stages.cc import union_find_components

    # chain 1-2-3-4-5, star 10-{11,12,13}, cycle 20-21-22-20, pair 30-31
    a = np.array([2, 3, 4, 5, 10, 10, 10, 20, 21, 22, 30])
    b = np.array([1, 2, 3, 4, 11, 12, 13, 21, 22, 20, 31])
    out = union_find_components(a, b).set_index("node")["comp"]
    assert all(out[n] == 1 for n in [1, 2, 3, 4, 5])
    assert all(out[n] == 10 for n in [10, 11, 12, 13])
    assert all(out[n] == 20 for n in [20, 21, 22])
    assert out[30] == 30 and out[31] == 30


@pytest.mark.parametrize("force_distributed", [False, True])
def test_components_random_graph(ray_session, force_distributed):
    import ray.data as rd

    from oma_ray.stages.cc import connected_components

    rng = np.random.default_rng(17)
    # denser graph → smaller diameter → fewer propagation rounds (the
    # distributed arm pays two exchanges per round)
    n_nodes, n_edges = 150, 200
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    edges = rd.from_arrow(pa.table({"a": a, "b": b})).repartition(4)
    out = connected_components(
        edges,
        driver_max_edges=0 if force_distributed else 10**9,
        num_partitions=2,
    ).to_pandas()
    ref = _ref_components(a, b)
    got = dict(zip(out["node"], out["comp"]))
    assert got == ref


def test_components_empty(ray_session):
    import ray.data as rd

    from oma_ray.stages.cc import connected_components

    edges = rd.from_arrow(
        pa.table({"a": pa.array([], type=pa.int64()),
                  "b": pa.array([], type=pa.int64())})
    )
    out = connected_components(edges)
    assert out.count() == 0


def test_pagerank_distributed_matches_driver_path(ray_session):
    """Forced-gate parity (VERDICT r3 #4): the score-as-Dataset PageRank is
    bit-identical to the driver-vector path on a random multi-edge graph
    with sinks and isolated nodes."""
    import ray.data as rd

    from oma_ray.stages.cc import pagerank_int, pagerank_int_dist

    rng = np.random.default_rng(7)
    n_nodes = 60
    src = rng.integers(0, 40, 300)  # nodes 40..59 are sinks/isolated
    dst = rng.integers(0, n_nodes, 300)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, type=pa.int64()),
                  "dst": pa.array(dst, type=pa.int64())})
    ).repartition(4)

    drv = pagerank_int(edges, n_nodes, iters=3).to_pandas()
    dist = (
        pagerank_int_dist(edges, n_nodes, iters=3, num_partitions=5)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert len(dist) == n_nodes
    assert (drv["node"].to_numpy() == dist["node"].to_numpy()).all()
    assert (drv["score"].to_numpy() == dist["score"].to_numpy()).all()

    # the gate itself: a tiny dist_min_nodes routes pagerank_int to the
    # distributed path (returns a Dataset, same values)
    gated = pagerank_int(edges, n_nodes, iters=3, dist_min_nodes=1)
    g = gated.to_pandas().sort_values("node").reset_index(drop=True)
    assert (g["score"].to_numpy() == drv["score"].to_numpy()).all()


def test_pagerank_distributed_exact_above_float53(ray_session):
    """Self-review r4 regression: contribution sums above 2^53 must stay
    int64-exact through the distributed kernels (the old pandas path went
    through float64 via the null-padded union and silently rounded)."""
    import ray.data as rd

    from oma_ray.stages.cc import pagerank_int, pagerank_int_dist

    # 4 spokes each pointing at hub 0; giant scale pushes the hub's
    # incoming sum past 2^53
    src = np.array([1, 2, 3, 4], dtype=np.int64)
    dst = np.zeros(4, dtype=np.int64)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(2)
    scale = 5_000_000_000_000_000  # hub sum ≈ 1.7e16 > 2^53

    drv = pagerank_int(edges, 5, iters=1, scale=scale).to_pandas()
    dist = (
        pagerank_int_dist(edges, 5, iters=1, scale=scale, num_partitions=3)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert int(drv.loc[0, "score"]) > 2**53  # the test actually bites
    assert drv["score"].tolist() == dist["score"].tolist()


def test_components_exact_with_hash_scale_node_ids(ray_session):
    """Node ids above 2^53 (64-bit-hash territory) must survive the
    distributed min-label rounds exactly — the old pandas union path
    rounded them through float64."""
    import ray.data as rd

    from oma_ray.stages.cc import connected_components

    base = (1 << 60) + 1  # adjacent ids here are indistinguishable in f64
    a = np.array([base, base + 1, base + 5], dtype=np.int64)
    b = np.array([base + 1, base + 2, base + 6], dtype=np.int64)
    edges = rd.from_arrow(
        pa.table({"a": pa.array(a), "b": pa.array(b)})
    ).repartition(2)
    out = (
        connected_components(edges, driver_max_edges=0, max_rounds=10)
        .to_pandas().set_index("node")["comp"]
    )
    assert out[base] == out[base + 1] == out[base + 2] == base
    assert out[base + 5] == out[base + 6] == base + 5
