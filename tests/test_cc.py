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
