"""Unit + property tests for the geometry kernels (reference parity)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oma_ray.functions.geo import (
    bbox_contains,
    cell_grid,
    cell_hex,
    cell_morton,
    is_clockwise,
    points_in_ring,
    quantize,
    ring_closed,
    trunc_div,
)


def java_point_inside(lon, lat, ring):
    """Scalar transliteration of Point.inside (Point.java:19-36) used as the
    test oracle for the vectorized kernel."""
    inside = False
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if y1 == y2:
            continue
        if (y1 <= lat) != (lat < y2):
            continue
        num = (x2 - x1) * (lat - y1)
        den = y2 - y1
        q = abs(num) // abs(den)
        if (num < 0) != (den < 0):
            q = -q
        if x1 + q < lon:
            inside = not inside
    return inside


SQUARE = [(0, 0), (100, 0), (100, 100), (0, 100), (0, 0)]


def test_square_basic():
    pts = [(50, 50, True), (150, 50, False), (-1, 50, False), (50, -1, False)]
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    rlon = np.array([p[0] for p in SQUARE])
    rlat = np.array([p[1] for p in SQUARE])
    got = points_in_ring(lon, lat, rlon, rlat)
    assert got.tolist() == [p[2] for p in pts]


def test_edge_cases_match_java_oracle():
    # points on edges / vertices — whatever Java does, we must do identically
    ring = SQUARE
    rlon = np.array([p[0] for p in ring])
    rlat = np.array([p[1] for p in ring])
    cases = [(0, 0), (0, 50), (100, 50), (50, 0), (50, 100), (100, 100), (0, 100), (100, 0)]
    lon = np.array([c[0] for c in cases])
    lat = np.array([c[1] for c in cases])
    got = points_in_ring(lon, lat, rlon, rlat)
    want = [java_point_inside(c[0], c[1], ring) for c in cases]
    assert got.tolist() == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-1800, 1800), st.integers(-900, 900)),
        min_size=3,
        max_size=12,
    ),
    st.lists(st.tuples(st.integers(-2000, 2000), st.integers(-1000, 1000)),
             min_size=1, max_size=20),
)
def test_pip_property_matches_scalar_oracle(verts, pts):
    ring = [(x * 1_000_000, y * 1_000_000) for x, y in verts]
    ring.append(ring[0])
    rlon = np.array([p[0] for p in ring], dtype=np.int64)
    rlat = np.array([p[1] for p in ring], dtype=np.int64)
    lon = np.array([p[0] * 1_000_000 for p in pts], dtype=np.int64)
    lat = np.array([p[1] * 1_000_000 for p in pts], dtype=np.int64)
    got = points_in_ring(lon, lat, rlon, rlat)
    want = [java_point_inside(lo, la, ring) for lo, la in zip(lon, lat)]
    assert got.tolist() == want


def test_trunc_div_matches_java():
    num = np.array([7, -7, 7, -7, 1, -1, 6, -6], dtype=np.int64)
    den = np.array([2, 2, -2, -2, 3, 3, 3, 3], dtype=np.int64)
    assert trunc_div(num, den).tolist() == [3, -3, -3, 3, 0, 0, 2, -2]


def test_quantize_matches_java_cast():
    # (int)(0.5 + 1e7*deg) — trunc toward zero (OSMXMLReader.java:75-77)
    degs = np.array([1.23456789, -1.23456789, 0.00000004, -0.00000004, -0.00000006])
    assert quantize(degs).tolist() == [12345679, -12345678, 0, 0, 0]


@settings(max_examples=200, deadline=None)
@given(st.integers(-1_800_000_000, 1_800_000_000))
def test_quantize_roundtrip(fixed):
    # format with 7 decimals → parse → quantize recovers the exact int
    from oma_ray.synth import format_coord

    s = format_coord(fixed)
    assert quantize(np.array([float(s)]))[0] == fixed


def test_orientation_and_closure():
    rlon = np.array([p[0] for p in SQUARE])
    rlat = np.array([p[1] for p in SQUARE])
    assert ring_closed(rlon, rlat)
    assert not ring_closed(rlon[:-1], rlat[:-1])
    ccw = is_clockwise(rlon, rlat)
    assert is_clockwise(rlon[::-1], rlat[::-1]) != ccw


def test_bbox_contains_inclusive():
    # Bounds.java:58-61 — all edges inclusive
    got = bbox_contains(0, 0, 10, 10, np.array([0, 10, 11, 5]), np.array([0, 10, 5, -1]))
    assert got.tolist() == [True, True, False, False]


def test_cells_deterministic_and_in_range():
    lon = np.array([-1_800_000_000, 0, 1_800_000_000, 139_700_000])
    lat = np.array([-900_000_000, 0, 900_000_000, 35_690_000])
    g = cell_grid(lon, lat)
    assert (g >= 0).all() and (g < (1 << 26)).all()
    m = cell_morton(lon, lat)
    h = cell_hex(lon, lat)
    assert (cell_grid(lon, lat) == g).all()
    assert (cell_morton(lon, lat) == m).all()
    assert (cell_hex(lon, lat) == h).all()
    # nearby points share morton prefix after coarsening
    m2 = cell_morton(lon + 1000, lat + 1000)
    assert ((m >> np.uint64(8)) == (m2 >> np.uint64(8))).sum() >= 3


def test_simplify_ring_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oma_ray.functions.geo import simplify_ring

    coords = st.lists(
        st.tuples(st.integers(-10_000, 10_000), st.integers(-10_000, 10_000)),
        min_size=2, max_size=40,
    )

    @settings(max_examples=150, deadline=None)
    @given(pts=coords, eps=st.integers(0, 5000))
    def check(pts, eps):
        lon = np.array([p[0] for p in pts], dtype=np.int64)
        lat = np.array([p[1] for p in pts], dtype=np.int64)
        m = simplify_ring(lon, lat, eps)
        assert m[0] and m[-1]                      # endpoints survive
        m2 = simplify_ring(lon, lat, eps * 2 + 1)  # coarser keeps a subset
        assert not np.any(m2 & ~m)

    check()


def test_simplify_ring_exact_cases():
    from oma_ray.functions.geo import simplify_ring

    lon = np.array([0, 5, 10, 15, 20])
    flat = np.zeros(5, dtype=np.int64)
    assert simplify_ring(lon, flat, 1).tolist() == [True, False, False, False, True]
    spike = np.array([0, 0, 8, 0, 0])
    # interior verts sit 3.12 units off the kept-spike sub-chords
    assert simplify_ring(lon, spike, 4).tolist() == [True, False, True, False, True]
    assert simplify_ring(lon, spike, 3).tolist() == [True] * 5
    assert simplify_ring(lon, spike, 9).tolist() == [True, False, False, False, True]


def test_simplify_polygons_stage_preserves_containment_away_from_boundary():
    import ray.data as rd

    from oma_ray.stages.pip import PolygonIndex, polygons_table, simplify_polygons
    from oma_ray.synth import HOT_LAT, HOT_LON, synth_admin_polygons

    polys = synth_admin_polygons(20)
    ptab = polygons_table(polys)
    simp = simplify_polygons(rd.from_arrow(ptab), eps=10_000).to_pandas()
    orig_pts = sum(len(r) for r in polys["ring_lon"])
    simp_pts = sum(len(r) for r in simp["ring_lon"])
    assert simp_pts <= orig_pts
    # hot-spot centers sit deep inside their polygons — assignment is
    # invariant under a boundary-scale eps
    sp = {
        "admin_id": simp["admin_id"].tolist(),
        "ring_lon": list(simp["ring_lon"]),
        "ring_lat": list(simp["ring_lat"]),
        "holes_lon": [list(h) for h in simp["holes_lon"]],
        "holes_lat": [list(h) for h in simp["holes_lat"]],
    }
    a = PolygonIndex(polys).lookup(HOT_LON, HOT_LAT)
    b = PolygonIndex(sp).lookup(HOT_LON, HOT_LAT)
    assert a.tolist() == b.tolist()


def test_quadkey_prefix_and_reference():
    from oma_ray.functions.geo import quadkey

    rng = np.random.default_rng(5)
    lon = rng.integers(-1_800_000_000, 1_800_000_000, 2000)
    lat = rng.integers(-900_000_000, 900_000_000, 2000)
    qk8 = quadkey(lon, lat, 8)
    qk4 = quadkey(lon, lat, 4)
    assert all(a[:4] == b for a, b in zip(qk8.astype(str), qk4.astype(str)))

    def ref(lo, la, level):
        n = 1 << level
        x = min(max((lo + 1_800_000_000) * n // 3_600_000_001, 0), n - 1)
        y = min(max((la + 900_000_000) * n // 1_800_000_001, 0), n - 1)
        return "".join(
            str(((x >> (level - 1 - i)) & 1) + 2 * ((y >> (level - 1 - i)) & 1))
            for i in range(level))

    for i in range(0, 2000, 37):
        assert qk8[i].decode() == ref(int(lon[i]), int(lat[i]), 8)


def test_hilbert_reference_adjacency_prefix():
    """hilbert_d vs the public xy2d algorithm, plus the two properties that
    make it a Hilbert curve: consecutive d's are grid-adjacent (the locality
    guarantee Morton lacks) and ancestor cells are d-prefixes."""
    from oma_ray.functions.geo import cell_hilbert, hilbert_d

    def wiki_xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    level = 5
    n = 1 << level
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    got = hilbert_d(xs, ys, level)
    assert got.tolist() == [wiki_xy2d(n, int(x), int(y)) for x, y in zip(xs, ys)]
    order = np.argsort(got)
    assert sorted(got.tolist()) == list(range(n * n))  # bijective
    step = np.abs(np.diff(xs[order])) + np.abs(np.diff(ys[order]))
    assert (step == 1).all()  # unit-step adjacency
    for k in (1, 2, 4):
        assert (hilbert_d(xs >> k, ys >> k, level - k) == (got >> (2 * k))).all()

    rng = np.random.default_rng(9)
    lon = rng.integers(-1_800_000_000, 1_800_000_000, 500)
    lat = rng.integers(-900_000_000, 900_000_000, 500)
    d13 = cell_hilbert(lon, lat, 13)
    assert (d13 >= 0).all() and (d13 < 1 << 26).all()
    assert (cell_hilbert(lon, lat, 7) == (d13 >> 12)).all()


def test_hilbert_ranges_cover_properties():
    """Region-coverer contract: full-depth ranges are TIGHT (membership ==
    exact box membership over every cell), capped-depth ranges are a
    superset, and the output list is sorted/disjoint/merged."""
    from oma_ray.functions.geo import hilbert_d, hilbert_ranges, in_ranges

    rng = np.random.default_rng(3)
    level = 7
    n = 1 << level
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    d = hilbert_d(xs, ys, level)
    for _ in range(20):
        x0, x1 = sorted(rng.integers(0, n, 2).tolist())
        y0, y1 = sorted(rng.integers(0, n, 2).tolist())
        exact = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
        tight = in_ranges(d, hilbert_ranges(x0, x1, y0, y1, level,
                                            max_depth=level))
        assert (tight == exact).all()
        r_cap = hilbert_ranges(x0, x1, y0, y1, level, max_depth=4)
        cap = in_ranges(d, r_cap)
        assert (cap >= exact).all()
        assert (np.diff(r_cap[:, 0]) > 0).all()
        assert (r_cap[1:, 0] > r_cap[:-1, 1]).all()


def test_geohash_canonical_and_prefix():
    """The canonical public example (lat 42.605, lon -5.603 → 'ezs42')
    plus the ancestor-prefix property across precisions."""
    from oma_ray.functions.geo import geohash

    assert geohash(np.array([-56_030_000]), np.array([426_050_000]),
                   5)[0] == b"ezs42"
    rng = np.random.default_rng(2)
    lon = rng.integers(-1_800_000_000, 1_800_000_000, 1000)
    lat = rng.integers(-900_000_000, 900_000_000, 1000)
    g6 = geohash(lon, lat, 6).astype(str)
    for p in (1, 3):
        gp = geohash(lon, lat, p).astype(str)
        assert all(a[:p] == b for a, b in zip(g6, gp))
