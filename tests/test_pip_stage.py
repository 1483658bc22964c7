"""PolygonIndex / PIPJoin: first-match, holes, nesting, skew hot spots."""

import numpy as np
import pyarrow as pa

from oma_ray.functions.geo import points_in_ring
from oma_ray.stages.pip import PolygonIndex
from oma_ray.synth import HOT_LAT, HOT_LON, synth_admin_polygons


def scalar_lookup(polys, lon, lat):
    """Scalar oracle: first polygon (table order) whose outer-minus-holes
    contains the point — the engine's first-match contract."""
    from tests.test_geo import java_point_inside

    for i in range(len(polys["admin_id"])):
        ring = list(zip(polys["ring_lon"][i], polys["ring_lat"][i]))
        if not java_point_inside(lon, lat, ring):
            continue
        in_hole = False
        for hl, ha in zip(polys["holes_lon"][i], polys["holes_lat"][i]):
            if java_point_inside(lon, lat, list(zip(hl, ha))):
                in_hole = True
                break
        if not in_hole:
            return polys["admin_id"][i]
    return -1


def test_index_matches_scalar_oracle():
    polys = synth_admin_polygons(60)
    idx = PolygonIndex(polys)
    rng = np.random.RandomState(7)
    # sample points around polygon centroids + random globe points
    lons, lats = [], []
    for i in range(0, 60, 3):
        cx = int(np.mean(polys["ring_lon"][i][:-1]))
        cy = int(np.mean(polys["ring_lat"][i][:-1]))
        for _ in range(5):
            lons.append(cx + rng.randint(-60_000_000, 60_000_000))
            lats.append(cy + rng.randint(-60_000_000, 60_000_000))
    lons += list(rng.randint(-1_800_000_000, 1_800_000_000, 50))
    lats += list(rng.randint(-900_000_000, 900_000_000, 50))
    lon = np.array(lons, dtype=np.int64)
    lat = np.array(lats, dtype=np.int64)
    got_idx = idx.lookup(lon, lat)
    got = np.where(got_idx >= 0, idx.admin_id[np.maximum(got_idx, 0)], -1)
    want = [scalar_lookup(polys, lo, la) for lo, la in zip(lon, lat)]
    assert got.tolist() == want


def test_hole_excludes_center():
    polys = {
        "admin_id": [7],
        "name": ["holey"],
        "ring_lon": [[0, 1000, 1000, 0, 0]],
        "ring_lat": [[0, 0, 1000, 1000, 0]],
        "holes_lon": [[[400, 600, 600, 400, 400]]],
        "holes_lat": [[[400, 400, 600, 600, 400]]],
    }
    idx = PolygonIndex(polys)
    got = idx.lookup(np.array([500, 200]), np.array([500, 200]))
    assert got.tolist() == [-1, 0]


def test_nested_first_match_prefers_table_order():
    # inner polygon listed FIRST → points inside both resolve to it
    polys = {
        "admin_id": [1, 2],
        "name": ["inner", "outer"],
        "ring_lon": [[400, 600, 600, 400, 400], [0, 1000, 1000, 0, 0]],
        "ring_lat": [[400, 400, 600, 600, 400], [0, 0, 1000, 1000, 0]],
        "holes_lon": [[], []],
        "holes_lat": [[], []],
    }
    idx = PolygonIndex(polys)
    got = idx.lookup(np.array([500, 100]), np.array([500, 100]))
    assert idx.admin_id[got].tolist() == [1, 2]


def test_hotspot_polygons_cover_cluster_centers():
    polys = synth_admin_polygons(10)
    idx = PolygonIndex(polys)
    got = idx.lookup(HOT_LON.astype(np.int64), HOT_LAT.astype(np.int64))
    assert (got == np.array([0, 1, 2])).all()


def test_pip_join_by_cell_matches_broadcast():
    """Distributed cell-cover PIP join == broadcast first-match lookup,
    across several cover widths (block composition changes, result must
    not) and multi-block page inputs."""
    import ray.data as rd

    from oma_ray.stages.pip import (
        PolygonIndex, pip_join_by_cell, polygons_table,
    )
    from oma_ray.synth import geo_for_ids, synth_admin_polygons

    ids = np.arange(4000, dtype=np.int64)
    lon, lat, has_geo = geo_for_ids(ids)
    pages = rd.from_arrow(
        pa.table(
            {
                "page_id": pa.array(ids),
                "lon": pa.array(lon.astype(np.int32), mask=~has_geo),
                "lat": pa.array(lat.astype(np.int32), mask=~has_geo),
            }
        )
    ).repartition(6)

    polys = synth_admin_polygons(60)
    bidx = PolygonIndex(polys)
    glon, glat = lon[has_geo], lat[has_geo]
    pidx = bidx.lookup(glon, glat)
    want = np.full(len(glon), -1, dtype=np.int64)
    want[pidx >= 0] = bidx.admin_id[pidx[pidx >= 0]]

    ptab = polygons_table(polys)
    for width in (32, 128):
        out = (
            pip_join_by_cell(
                pages, rd.from_arrow(ptab), width=width,
                polys_schema=ptab.schema,
            )
            .to_pandas()
            .sort_values("page_id")
        )
        assert out["page_id"].to_numpy().tolist() == ids[has_geo].tolist()
        assert out["admin_id"].to_numpy().tolist() == want.tolist(), width
    # the fixture must actually exercise hits AND misses
    assert (want >= 0).any() and (want == -1).any()


def test_hierarchical_cover_bounds_giant_polygons():
    """VERDICT r3 #8: a near-world-spanning polygon must register under the
    coarse grid (bounded cover) instead of exploding into O(width²) fine
    cover rows that each replicate its geometry."""
    from oma_ray.stages.pip import explode_polygon_cover, polygons_table

    giant = {
        "admin_id": [7],
        "ring_lon": [[-1_700_000_000, 1_700_000_000, 1_700_000_000,
                      -1_700_000_000, -1_700_000_000]],
        "ring_lat": [[-800_000_000, -800_000_000, 800_000_000,
                      800_000_000, -800_000_000]],
        "holes_lon": [[]],
        "holes_lat": [[]],
    }
    t = polygons_table(giant)
    flat = explode_polygon_cover(t, 128)
    hier = explode_polygon_cover(t, 128, coarse_width=16, max_cells=256)
    assert len(flat) > 10_000  # the blow-up the hierarchy avoids
    assert len(hier) <= 256
    # coarse rows live in their own keyspace (offset by width²)
    assert (hier.column("cell_id").to_numpy() >= 128 * 128).all()
    # small polygons stay on the fine grid
    small = {
        "admin_id": [1],
        "ring_lon": [[0, 10_000_000, 10_000_000, 0, 0]],
        "ring_lat": [[0, 0, 10_000_000, 10_000_000, 0]],
        "holes_lon": [[]],
        "holes_lat": [[]],
    }
    st = polygons_table(small)
    sh = explode_polygon_cover(st, 128, coarse_width=16, max_cells=256)
    assert (sh.column("cell_id").to_numpy() < 128 * 128).all()


def test_pip_join_hierarchical_parity(ray_session):
    """Forced hierarchical cover (tiny max_cells pushes most polygons to
    the coarse level) must produce exactly the single-level result —
    including first-match priority across levels."""
    import ray.data as rd

    from oma_ray.stages.pip import pip_join_by_cell, polygons_table
    from oma_ray.synth import geo_for_ids, synth_admin_polygons

    ids = np.arange(3000, dtype=np.int64)
    lon, lat, has_geo = geo_for_ids(ids)
    pages = rd.from_arrow(
        pa.table(
            {
                "page_id": pa.array(ids),
                "lon": pa.array(lon.astype(np.int32), mask=~has_geo),
                "lat": pa.array(lat.astype(np.int32), mask=~has_geo),
            }
        )
    ).repartition(5)
    polys = synth_admin_polygons(60)
    ptab = polygons_table(polys)

    base = (
        pip_join_by_cell(pages, rd.from_arrow(ptab), width=64,
                         polys_schema=ptab.schema)
        .to_pandas().sort_values("page_id").reset_index(drop=True)
    )
    hier = (
        pip_join_by_cell(pages, rd.from_arrow(ptab), width=64,
                         polys_schema=ptab.schema,
                         coarse_width=8, max_cells=2)
        .to_pandas().sort_values("page_id").reset_index(drop=True)
    )
    assert (base["page_id"].to_numpy() == hier["page_id"].to_numpy()).all()
    assert (base["admin_id"].to_numpy() == hier["admin_id"].to_numpy()).all()
    assert (base["admin_id"].to_numpy() >= 0).any()
