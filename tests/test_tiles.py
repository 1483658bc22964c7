"""Tile-assignment parity: vectorized BbsGrid vs a scalar transliteration of
the reference's linear scan (ChunkGenerator.java:549-574)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from oma_ray.stages.tiles import BbsGrid
from oma_ray.synth import default_bbs_text, parse_bbs


def scalar_first_chunk(boxes, lon, lat):
    for i, (a, b, c, d) in enumerate(boxes):
        if a <= lon <= c and b <= lat <= d:
            return i
    return len(boxes)


def linear_first_chunk(boxes, lon, lat):
    """Independent first-match oracle (vectorized over boxes, per point):
    literal linear-scan semantics of ChunkGenerator.java:549-556."""
    m = (boxes[:, 0] <= lon) & (lon <= boxes[:, 2]) & (boxes[:, 1] <= lat) & (lat <= boxes[:, 3])
    i = int(np.argmax(m))
    return i if m[i] else len(boxes)


_BOXES = parse_bbs(default_bbs_text())
_GRID = BbsGrid(_BOXES)


def test_default_bbs_expansion_counts():
    boxes = parse_bbs(default_bbs_text())
    # 360*90 + 180*15 + 180*15 + 120*15 + 120*15 + 36*5 + 36*5 + 1 + 1 + 36*16 + world
    assert boxes[-1].tolist() == [-1800000000, -900000000, 1800000000, 900000000]
    assert len(boxes) == 360 * 90 + 180 * 15 * 2 + 120 * 15 * 2 + 36 * 5 * 2 + 2 + 36 * 16 + 1


def test_first_match_overlapping_boxes():
    # two overlapping boxes: first in list must win
    boxes = np.array(
        [[0, 0, 100, 100], [50, 50, 200, 200], [-10**9, -10**9, 10**9, 10**9]],
        dtype=np.int64,
    )
    g = BbsGrid(boxes)
    lon = np.array([60, 150, 10**9 + 5])
    lat = np.array([60, 150, 0])
    assert g.assign_points(lon, lat).tolist() == [0, 1, 3]  # miss → len(boxes)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(-1800, 1799), st.integers(-900, 899)),
                min_size=1, max_size=30))
def test_default_grid_matches_linear_scan(pts):
    lon = np.array([p[0] * 1_000_000 for p in pts], dtype=np.int64)
    lat = np.array([p[1] * 1_000_000 for p in pts], dtype=np.int64)
    got = _GRID.assign_points(lon, lat)
    want = [linear_first_chunk(_BOXES, lo, la) for lo, la in zip(lon, lat)]
    assert got.tolist() == want


def test_small_grid_matches_pure_python_scan():
    boxes = parse_bbs("0 1000 100 0 1000 100")  # 10×10 grid + catch-all
    g = BbsGrid(boxes)
    rng = np.random.RandomState(3)
    lon = rng.randint(-200, 1200, 200)
    lat = rng.randint(-200, 1200, 200)
    got = g.assign_points(lon, lat)
    want = [scalar_first_chunk(boxes, lo, la) for lo, la in zip(lon, lat)]
    assert got.tolist() == want


def test_assign_bboxes_requires_full_containment():
    boxes = np.array([[0, 0, 100, 100], [0, 0, 300, 300]], dtype=np.int64)
    g = BbsGrid(boxes)
    # geometry straddling box 0 must fall through to box 1 (Bounds.java:63-68)
    out = g.assign_bboxes(
        np.array([10, 10]), np.array([10, 10]),
        np.array([90, 150]), np.array([90, 150]),
    )
    assert out.tolist() == [0, 1]


def test_tiled_raster_matches_single_array(ray_session):
    """VERDICT r02 next-step #6: the tiled raster layout (one object-store
    entry per tile, fetched on touch) samples identically to the single
    broadcast array, across ≥4 tiles and uneven tile edges."""
    import numpy as np
    import pyarrow as pa
    import ray

    from oma_ray.stages.raster import (
        RasterSample,
        RasterSampleTiled,
        split_raster,
        synth_raster,
    )

    raster = synth_raster()
    rng = np.random.default_rng(3)
    lon = rng.integers(-1_800_000_000, 1_800_000_000, 5000)
    lat = rng.integers(-900_000_000, 900_000_000, 5000)
    # include nulls (no-geo rows) and extreme corners
    lon[:2] = [-1_800_000_000, 1_799_999_999]
    lat[:2] = [-900_000_000, 899_999_999]
    batch = pa.table(
        {
            "lon": pa.array(
                lon, type=pa.int64(), mask=np.arange(5000) % 97 == 0
            ),
            "lat": pa.array(
                lat, type=pa.int64(), mask=np.arange(5000) % 97 == 0
            ),
        }
    )
    single = RasterSample(raster)(batch).column("elev").to_pylist()
    for ty, tx in [(2, 2), (3, 5)]:
        state = split_raster(raster, ty, tx)
        assert len(state["refs"]) == ty * tx
        tiled = RasterSampleTiled(state)(batch).column("elev").to_pylist()
        assert tiled == single
