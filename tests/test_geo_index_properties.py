"""Property-based parity for the grid index classes (BoxIndex, PointIndex,
NearestIndex) against brute-force numpy oracles: random coordinates across
the full fixed-point range (±1.8e9 lon / ±0.9e9 lat), degenerate boxes
(zero-area), r2=0, duplicate point coordinates, and world-scale radii —
the regimes the threshold gates switch to at scale must be exact
everywhere, not just on the synth fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

LON = st.integers(min_value=-1_800_000_000, max_value=1_800_000_000)
LAT = st.integers(min_value=-900_000_000, max_value=900_000_000)


def _boxes_strategy(n_max=12):
    corner = st.tuples(LON, LAT, LON, LAT)
    return st.lists(corner, min_size=1, max_size=n_max)


@settings(max_examples=40, deadline=None)
@given(_boxes_strategy(), st.lists(st.tuples(LON, LAT), min_size=1, max_size=60))
def test_box_index_matches_brute_mask(corners, pts):
    from oma_ray.stages.geo_join import BoxIndex

    minlon = np.array([min(a, c) for a, _b, c, _d in corners], dtype=np.int64)
    maxlon = np.array([max(a, c) for a, _b, c, _d in corners], dtype=np.int64)
    minlat = np.array([min(b, d) for _a, b, _c, d in corners], dtype=np.int64)
    maxlat = np.array([max(b, d) for _a, b, _c, d in corners], dtype=np.int64)
    boxes = {
        "box_id": np.arange(len(corners), dtype=np.int64),
        "minlon": minlon, "maxlon": maxlon,
        "minlat": minlat, "maxlat": maxlat,
    }
    lon = np.array([p[0] for p in pts], dtype=np.int64)
    lat = np.array([p[1] for p in pts], dtype=np.int64)

    idx = BoxIndex(boxes, width=64)
    pi, bi = idx.hits(lon, lat)
    got = set(zip(pi.tolist(), bi.tolist()))
    want = set()
    for j in range(len(corners)):
        m = (
            (lon >= minlon[j]) & (lon <= maxlon[j])
            & (lat >= minlat[j]) & (lat <= maxlat[j])
        )
        want |= {(int(i), j) for i in np.nonzero(m)[0]}
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.tuples(LON, LAT), min_size=1, max_size=40),
    st.lists(st.tuples(LON, LAT), min_size=1, max_size=40),
    st.sampled_from([0, 1, 10_000, 10**9, 10**12, 2 * (1_800_000_000 // 100) ** 2]),
)
def test_point_index_pairs_match_brute(pts, qs, r2):
    from oma_ray.stages.geo_join import PointIndex

    p_lon = np.array([p[0] for p in pts], dtype=np.int64)
    p_lat = np.array([p[1] for p in pts], dtype=np.int64)
    points = {
        "station_id": np.arange(len(pts), dtype=np.int64),
        "lon": p_lon, "lat": p_lat,
    }
    q_lon = np.array([q[0] for q in qs], dtype=np.int64)
    q_lat = np.array([q[1] for q in qs], dtype=np.int64)

    idx = PointIndex(points, r2)
    qi, pi, d2 = idx.pairs(q_lon, q_lat)
    got = sorted(zip(qi.tolist(), pi.tolist(), d2.tolist()))
    assert len(got) == len(set(got))  # no duplicate pairs, ever
    dl = np.abs(q_lon[:, None] - p_lon[None, :]) // 100
    dt = np.abs(q_lat[:, None] - p_lat[None, :]) // 100
    bd2 = dl * dl + dt * dt
    qi_b, pi_b = np.nonzero(bd2 <= r2)
    want = sorted(zip(qi_b.tolist(), pi_b.tolist(),
                      bd2[qi_b, pi_b].tolist()))
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.tuples(LON, LAT), min_size=1, max_size=40),
    st.lists(st.tuples(LON, LAT), min_size=1, max_size=40),
)
def test_nearest_index_matches_brute(pts, qs):
    from oma_ray.stages.geo_join import NearestIndex

    p_lon = np.array([p[0] for p in pts], dtype=np.int64)
    p_lat = np.array([p[1] for p in pts], dtype=np.int64)
    # duplicate the first point under a HIGHER id: min-id tie-break probe
    points = {
        "station_id": np.concatenate(
            [np.arange(len(pts), dtype=np.int64), [10_000]]
        ),
        "lon": np.concatenate([p_lon, p_lon[:1]]),
        "lat": np.concatenate([p_lat, p_lat[:1]]),
    }
    q_lon = np.array([q[0] for q in qs], dtype=np.int64)
    q_lat = np.array([q[1] for q in qs], dtype=np.int64)

    idx = NearestIndex(points)
    row, d2, leftover = idx.nearest(q_lon, q_lat, max_ring=256)
    assert len(leftover) == 0  # a non-empty point set must always resolve

    all_lon, all_lat = points["lon"], points["lat"]
    dl = np.abs(q_lon[:, None] - all_lon[None, :]) // 100
    dt = np.abs(q_lat[:, None] - all_lat[None, :]) // 100
    bd2 = dl * dl + dt * dt
    # brute with the same tie-break: min (d2, station_id)
    sid = points["station_id"]
    for i in range(len(qs)):
        want = min((int(bd2[i, j]), int(sid[j])) for j in range(len(sid)))
        assert (int(d2[i]), int(idx.p_id[row[i]])) == want
