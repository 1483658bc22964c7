"""Interval-join stage: kernel property tests + broadcast/distributed
regime parity (overlapping intervals, multi-slot replication forced)."""

import numpy as np
import pyarrow as pa
import pytest


def brute(ts, los, his):
    out = set()
    for i, t in enumerate(ts):
        for j, (lo, hi) in enumerate(zip(los, his)):
            if lo <= t < hi:
                out.add((i, j))
    return out


def test_match_pairs_overlapping_brute():
    from oma_ray.stages.interval import match_pairs

    rng = np.random.default_rng(11)
    for _ in range(20):
        n_i = rng.integers(1, 40)
        los = np.sort(rng.integers(0, 1000, n_i)).astype(np.int64)
        his = los + rng.integers(1, 300, n_i)  # heavy overlap
        ts = rng.integers(-50, 1400, 200).astype(np.int64)
        p, v = match_pairs(ts, los, his)
        assert set(zip(p.tolist(), v.tolist())) == brute(ts, los, his)
        assert len(set(zip(p.tolist(), v.tolist()))) == len(p)  # no dupes


def test_match_pairs_empty():
    from oma_ray.stages.interval import match_pairs

    p, v = match_pairs(np.array([1, 2]), np.array([], np.int64),
                       np.array([], np.int64))
    assert len(p) == 0 and len(v) == 0


@pytest.mark.parametrize("slot_width", [7, 100, 5000])
def test_interval_join_regime_parity(ray_session, slot_width):
    """Broadcast vs slot-keyed distributed regime on OVERLAPPING intervals;
    tiny slot widths force multi-slot replication (and the same-partition
    duplicate-copy hazard the block kernel dedupes)."""
    import ray.data as rd

    from oma_ray.stages.interval import interval_join

    rng = np.random.default_rng(7)
    n_w = 50
    los = np.sort(rng.integers(0, 2000, n_w)).astype(np.int64)
    windows = {"id": np.arange(n_w, dtype=np.int64), "lo": los,
               "hi": los + rng.integers(1, 400, n_w)}
    ts = rng.integers(-100, 2600, 500).astype(np.int64)
    probes = pa.table({"ts": pa.array(ts),
                       "probe_id": pa.array(np.arange(500, dtype=np.int64))})

    def run(**kw):
        ds = rd.from_arrow(probes).repartition(4)
        out = interval_join(ds, "ts", windows, carry_cols=["probe_id"],
                            **kw).to_pandas()
        return sorted(map(tuple, out[["probe_id", "window_id"]].values.tolist()))

    base = run()
    want = sorted(brute(ts, windows["lo"], windows["hi"]))  # probe_id == idx
    assert base == want
    dist = run(broadcast_max=0, slot_width=slot_width, partitions=3)
    assert dist == base
