"""Geospatial join operators (stages/geo_join.py) vs brute-force numpy
oracles on deterministic point sets — including null-coordinate rows and
multi-block inputs (the keyed-exchange paths must merge partials correctly).
"""

import numpy as np
import pandas as pd
import pyarrow as pa


def _points_ds(n=5000, blocks=8):
    import ray.data as rd

    from oma_ray.synth import geo_for_ids

    ids = np.arange(n, dtype=np.int64)
    lon, lat, has_geo = geo_for_ids(ids)
    t = pa.table(
        {
            "page_id": pa.array(ids),
            "lon": pa.array(lon.astype(np.int32), mask=~has_geo),
            "lat": pa.array(lat.astype(np.int32), mask=~has_geo),
        }
    )
    return rd.from_arrow(t).repartition(blocks), ids[has_geo], lon[has_geo], lat[has_geo]


def _d2_brute(lon, lat, qlon, qlat):
    a = np.abs(lon.astype(np.int64) - qlon) // 100
    b = np.abs(lat.astype(np.int64) - qlat) // 100
    return a * a + b * b


def test_geo_knn_join_matches_brute_force():
    from oma_ray.stages.geo_join import geo_knn_join

    ds, ids, lon, lat = _points_ds()
    qlon = np.array([0, -739_800_000], dtype=np.int64)
    qlat = np.array([0, 407_500_000], dtype=np.int64)
    out = geo_knn_join(ds, [0, 1], qlon, qlat, k=5).to_pandas()
    assert len(out) == 10
    for qi in (0, 1):
        d2 = _d2_brute(lon, lat, qlon[qi], qlat[qi])
        order = np.lexsort((ids, d2))[:5]
        got = out[out.query_id == qi].sort_values("rank")
        assert got["page_id"].tolist() == ids[order].tolist()
        assert got["d2"].tolist() == d2[order].tolist()
        assert got["rank"].tolist() == [1, 2, 3, 4, 5]


def test_nearest_point_join_matches_brute_force_no_shuffle():
    from oma_ray.stages.geo_join import nearest_point_join
    from oma_ray.synth import synth_stations

    ds, ids, lon, lat = _points_ds(n=2000)
    st = synth_stations(16)
    out = nearest_point_join(ds, st).to_pandas().sort_values("page_id")
    assert len(out) == len(ids)  # null-coordinate rows dropped
    d2 = _d2_brute(
        np.repeat(lon, 1), np.repeat(lat, 1),
        st["lon"][:, None], st["lat"][:, None],
    )  # 16 × n
    best = np.argmin(d2, axis=0)
    assert out["station_id"].to_numpy().tolist() == st["station_id"][best].tolist()
    assert out["d2"].to_numpy().tolist() == d2[best, np.arange(len(ids))].tolist()


def test_box_count_join_overlap_semantics():
    from oma_ray.stages.geo_join import box_count_join
    from oma_ray.synth import synth_boxes

    ds, ids, lon, lat = _points_ds()
    b = synth_boxes(64)
    out = box_count_join(ds, b).to_pandas().set_index("box_id")["n_pages"]
    hit = (
        (lon[None, :] >= b["minlon"][:, None]) & (lon[None, :] <= b["maxlon"][:, None])
        & (lat[None, :] >= b["minlat"][:, None]) & (lat[None, :] <= b["maxlat"][:, None])
    )
    n = hit.sum(axis=1)
    want = pd.Series(n[n > 0], index=b["box_id"][n > 0])
    assert out.sort_index().tolist() == want.sort_index().tolist()
    assert len(out) == (n > 0).sum()
    # overlap semantics: strictly more total assignments than any first-match
    # rule could produce iff some point hits >1 box (true for this fixture)
    assert n.sum() > (hit.any(axis=0)).sum()


def test_grid_neighborhood_focal_sum():
    from oma_ray.stages.geo_join import GRID_W, grid_neighborhood

    ds, ids, lon, lat = _points_ds(n=3000)
    out = grid_neighborhood(ds).to_pandas()
    row = (lat + 900_000_000) * GRID_W // 1_800_000_001
    col = (lon + 1_800_000_000) * GRID_W // 3_600_000_001
    cells = pd.Series(row * GRID_W + col).value_counts()
    counts = dict(cells)
    for _, r in out.iterrows():
        cell, n, neigh = r["cell_id"], r["n_pages"], r["neigh_pages"]
        assert counts[cell] == n
        rr, cc = cell // GRID_W, cell % GRID_W
        want = sum(
            counts.get((rr + dy) * GRID_W + (cc + dx), 0)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if 0 <= rr + dy < GRID_W and 0 <= cc + dx < GRID_W
        )
        assert neigh == want, cell
    assert len(out) == len(counts)


def test_tile_pyramid_levels_consistent():
    from oma_ray.stages.geo_join import tile_pyramid

    ds, ids, lon, lat = _points_ds(n=4000)
    out = tile_pyramid(ds).to_pandas()
    # every level's counts sum to the number of geo points
    for lvl, grp in out.groupby("level"):
        assert grp["n_pages"].sum() == len(ids)
    # coarser level has no more cells than finer
    ncells = out.groupby("level")["cell_id"].nunique()
    assert ncells[0] >= ncells[1] >= ncells[2]
    # direct-W formula equals divide-down of the finest level for level 1
    fine = out[out.level == 0].copy()
    fine["r1"] = fine.cell_id // 8192 // 8
    fine["c1"] = fine.cell_id % 8192 // 8
    agg = fine.groupby(fine.r1 * 1024 + fine.c1)["n_pages"].sum()
    l1 = out[out.level == 1].set_index("cell_id")["n_pages"]
    assert agg.sort_index().tolist() == l1.sort_index().tolist()


def test_box_anti_join_is_exact_complement():
    from oma_ray.stages.geo_join import box_anti_join, box_count_join
    from oma_ray.synth import synth_boxes

    ds, ids, lon, lat = _points_ds(n=2000)
    b = synth_boxes(64)
    out = set(box_anti_join(ds, b).to_pandas()["page_id"])
    hit = (
        (lon[None, :] >= b["minlon"][:, None]) & (lon[None, :] <= b["maxlon"][:, None])
        & (lat[None, :] >= b["minlat"][:, None]) & (lat[None, :] <= b["maxlat"][:, None])
    ).any(axis=0)
    assert out == set(ids[~hit])
    # complement check against the count join's total assignment base
    inside = box_count_join(ds, b).to_pandas()
    assert len(out) + hit.sum() == len(ids)


def test_within_distance_join_pairs():
    from oma_ray.stages.geo_join import within_distance_join
    from oma_ray.synth import synth_stations

    ds, ids, lon, lat = _points_ds(n=2000)
    st = synth_stations(16)
    r2 = 4_000_000_000_000
    out = within_distance_join(ds, st, r2=r2).to_pandas()
    d2 = _d2_brute(lon, lat, st["lon"][:, None], st["lat"][:, None])
    pi, ri = np.nonzero(d2 <= r2)
    want = set(zip(ids[ri].tolist(), st["station_id"][pi].tolist(),
                   d2[pi, ri].tolist()))
    got = set(zip(out["page_id"], out["station_id"], out["d2"]))
    assert got == want and len(out) == len(want) and len(want) > 0


def test_trajectory_lengths_multiblock_users():
    import ray.data as rd

    from oma_ray.stages.geo_join import trajectory_lengths

    # 40 users × 50 events each, scattered across 10 blocks so every user's
    # rows span several input blocks; ts ties broken by event_id
    n = 2000
    eid = np.arange(n, dtype=np.int64)
    user = eid % 40
    ts = np.full(n, 1_700_000_000_000_000, dtype=np.int64) + (eid // 7) * 1_000_000
    lon = ((eid * 37) % 3_000_000_000 - 1_500_000_000).astype(np.int64)
    lat = ((eid * 91) % 1_700_000_000 - 850_000_000).astype(np.int64)
    drop = eid % 13 == 0  # null-coordinate fixes must be skipped
    t = pa.table(
        {
            "user_id": pa.array(user),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "event_id": pa.array(eid),
            "lon": pa.array(lon, mask=drop),
            "lat": pa.array(lat, mask=drop),
        }
    )
    out = (
        trajectory_lengths(rd.from_arrow(t).repartition(10))
        .to_pandas().set_index("user_id").sort_index()
    )
    import pandas as pd

    df = pd.DataFrame(
        {"user_id": user, "ts": ts, "event_id": eid, "lon": lon, "lat": lat}
    )[~drop].sort_values(["user_id", "ts", "event_id"])
    for uid, grp in df.groupby("user_id"):
        a = np.abs(np.diff(grp["lon"].to_numpy())) // 100
        b = np.abs(np.diff(grp["lat"].to_numpy())) // 100
        assert out.loc[uid, "n_hops"] == len(grp) - 1
        assert out.loc[uid, "sum_step_d2"] == (a * a + b * b).sum()
    assert len(out) == 40


def test_box_overlap_join_reference_point_dedup():
    """Dense overlapping rectangle sets: every overlapping pair appears
    EXACTLY once (the reference-point rule), matching a brute-force
    quadratic oracle, across cover widths (block composition changes)."""
    import ray.data as rd

    from oma_ray.stages.geo_join import box_overlap_join

    def boxes(n, seed):
        i = np.arange(n, dtype=np.int64)
        cx = (i * 48271 + seed) % 2_000_000_000 - 1_000_000_000
        cy = (i * 69621 + seed * 3) % 1_000_000_000 - 500_000_000
        hw = 50_000_000 + (i * 104729) % 250_000_000  # up to 30 deg wide
        hh = 30_000_000 + (i * 7919) % 150_000_000
        return {
            "box_id": i, "minlon": cx - hw, "maxlon": cx + hw,
            "minlat": cy - hh, "maxlat": cy + hh,
        }

    a, b = boxes(120, 7), boxes(150, 1234567)
    want = set()
    for i in range(120):
        for j in range(150):
            if (a["minlon"][i] <= b["maxlon"][j] and b["minlon"][j] <= a["maxlon"][i]
                    and a["minlat"][i] <= b["maxlat"][j]
                    and b["minlat"][j] <= a["maxlat"][i]):
                want.add((i, j))
    assert len(want) > 200  # dense enough to exercise multi-cell overlaps

    def tab(d):
        return pa.table({k: pa.array(v) for k, v in d.items()})

    for width in (32, 128):
        out = box_overlap_join(
            rd.from_arrow(tab(a)).repartition(4),
            rd.from_arrow(tab(b)).repartition(5),
            width=width,
        ).to_pandas()
        got = list(zip(out["a_id"], out["b_id"]))
        assert len(got) == len(set(got)), "pair emitted more than once"
        assert set(got) == want, width


def test_geo_ops_survive_fully_empty_input():
    """Ray's hash shuffle emits ZERO blocks for an empty exchange (schema()
    is None downstream) — every geo op must anchor its result schema."""
    import ray.data as rd

    from oma_ray.stages.geo_join import (
        box_count_join, geo_knn_join, grid_neighborhood, tile_pyramid,
        trajectory_lengths,
    )
    from oma_ray.synth import synth_boxes

    empty = rd.from_arrow(
        pa.table(
            {
                "page_id": pa.array([], type=pa.int64()),
                "lon": pa.array([], type=pa.int32()),
                "lat": pa.array([], type=pa.int32()),
            }
        )
    )
    for out, cols in (
        (geo_knn_join(empty, [0], [0], [0], k=3),
         ["query_id", "page_id", "rank", "d2"]),
        (box_count_join(empty, synth_boxes(8)), ["box_id", "n_pages"]),
        (grid_neighborhood(empty), ["cell_id", "n_pages", "neigh_pages"]),
        (tile_pyramid(empty), ["level", "cell_id", "n_pages"]),
    ):
        sch = out.schema()
        assert sch is not None and set(cols) <= set(sch.names), cols
        assert out.count() == 0

    empty_ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.timestamp("us")),
                "event_id": pa.array([], type=pa.int64()),
                "lon": pa.array([], type=pa.int32()),
                "lat": pa.array([], type=pa.int32()),
            }
        )
    )
    out = trajectory_lengths(empty_ev)
    assert out.schema() is not None and out.count() == 0


def test_cover_cells_contain_every_point_property():
    """Property: any point inside a box maps to a cell inside the box's
    cover — the correctness foundation of pip_join_by_cell and
    box_overlap_join (a missed cell = a silently lost candidate)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oma_ray.stages.geo_join import _box_cover_cells

    coord = st.integers(-1_800_000_000, 1_800_000_000)
    lat_c = st.integers(-900_000_000, 900_000_000)

    @settings(max_examples=200, deadline=None)
    @given(lo1=coord, lo2=coord, la1=lat_c, la2=lat_c,
           fx=st.floats(0, 1), fy=st.floats(0, 1),
           width=st.sampled_from([32, 128, 1024]))
    def check(lo1, lo2, la1, la2, fx, fy, width):
        minlon, maxlon = sorted((lo1, lo2))
        minlat, maxlat = sorted((la1, la2))
        cells, idx = _box_cover_cells(
            np.array([minlon]), np.array([minlat]),
            np.array([maxlon]), np.array([maxlat]), width,
        )
        # an arbitrary point inside the box
        plon = int(minlon + fx * (maxlon - minlon))
        plat = int(minlat + fy * (maxlat - minlat))
        row = np.clip((plat + 900_000_000) * width // 1_800_000_001, 0, width - 1)
        col = np.clip((plon + 1_800_000_000) * width // 3_600_000_001, 0, width - 1)
        assert row * width + col in set(cells.tolist())

    check()


def test_pip_join_by_cell_degenerate_polygons():
    """Zero-area rings and single-cell polygons must not crash or
    mis-assign (they can contain nothing except their own boundary
    behavior, which parity with the broadcast index pins)."""
    import ray.data as rd

    from oma_ray.stages.pip import (
        PolygonIndex, pip_join_by_cell, polygons_table,
    )

    polys = {
        "admin_id": [0, 1],
        # a degenerate (zero-width) rectangle and a tiny one
        "ring_lon": [[5, 5, 5, 5, 5], [100, 200, 200, 100, 100]],
        "ring_lat": [[0, 10, 10, 0, 0], [100, 100, 220, 220, 100]],
        "holes_lon": [[], []],
        "holes_lat": [[], []],
    }
    ids = np.arange(50, dtype=np.int64)
    lon = (ids * 17 % 300).astype(np.int64)
    lat = (ids * 29 % 300).astype(np.int64)
    pages = rd.from_arrow(
        pa.table(
            {"page_id": pa.array(ids),
             "lon": pa.array(lon.astype(np.int32)),
             "lat": pa.array(lat.astype(np.int32))}
        )
    ).repartition(3)
    ptab = polygons_table(polys)
    out = (
        pip_join_by_cell(pages, rd.from_arrow(ptab), width=64,
                         polys_schema=ptab.schema)
        .to_pandas().sort_values("page_id")
    )
    bidx = PolygonIndex(polys)
    pidx = bidx.lookup(lon, lat)
    want = np.where(pidx >= 0, bidx.admin_id[np.maximum(pidx, 0)], -1)
    assert out["admin_id"].tolist() == want.tolist()
    assert (want == 1).any()  # the tiny polygon really catches some points


def test_geo_knn_join_empty_query_set():
    from oma_ray.stages.geo_join import geo_knn_join

    ds, _ids, _lon, _lat = _points_ds(n=500, blocks=2)
    out = geo_knn_join(ds, [], [], [], k=5)
    assert out.count() == 0 and out.schema() is not None


def test_box_joins_indexed_regime_parity(ray_session):
    """VERDICT r3 #9: forcing the interval-index regime (index_min_boxes=1)
    must reproduce the dense-mask results exactly, for both the count join
    and the anti join — including boxes with zero hits and null-coordinate
    rows."""
    from oma_ray.stages.geo_join import BoxIndex, box_anti_join, box_count_join
    from oma_ray.synth import synth_boxes

    ds, ids, lon, lat = _points_ds(n=4000, blocks=6)
    b = synth_boxes(64)

    dense = box_count_join(ds, b).to_pandas().sort_values("box_id")
    idx = (
        box_count_join(ds, b, index_min_boxes=1)
        .to_pandas().sort_values("box_id")
    )
    assert dense["box_id"].tolist() == idx["box_id"].tolist()
    assert dense["n_pages"].tolist() == idx["n_pages"].tolist()
    assert len(dense)  # fixture really hits boxes

    a_dense = set(box_anti_join(ds, b).to_pandas()["page_id"])
    a_idx = set(box_anti_join(ds, b, index_min_boxes=1).to_pandas()["page_id"])
    assert a_dense == a_idx and len(a_dense)

    # the index kernel itself against a brute mask (point-level hits)
    bi = BoxIndex(b, width=64)
    pi, bx = bi.hits(lon, lat)
    got = set(zip(pi.tolist(), bi.box_id[bx].tolist()))
    want = set()
    for j in range(len(b["box_id"])):
        m = (
            (lon >= b["minlon"][j]) & (lon <= b["maxlon"][j])
            & (lat >= b["minlat"][j]) & (lat <= b["maxlat"][j])
        )
        want |= {(int(i), int(b["box_id"][j])) for i in np.nonzero(m)[0]}
    assert got == want


def test_within_distance_indexed_regime_parity(ray_session):
    """Forcing the PointIndex regime (index_min_points=1) must reproduce
    the dense-matrix DWithin pairs exactly — same (id, station, d2)
    multiset — including grid-edge points (cell aliasing only ever adds
    candidates; the exact d2 filter rejects them)."""
    from oma_ray.stages.geo_join import within_distance_join
    from oma_ray.synth import synth_stations

    ds, ids, lon, lat = _points_ds(n=4000, blocks=6)
    st = synth_stations(64)
    r2 = 1_000_000_000_000

    def canon(df):
        return sorted(map(tuple, df[["page_id", "station_id", "d2"]].to_numpy()))

    dense = canon(within_distance_join(ds, st, r2).to_pandas())
    idx = canon(
        within_distance_join(ds, st, r2, index_min_points=1).to_pandas()
    )
    assert dense == idx and len(dense)


def test_nearest_point_indexed_regime_parity(ray_session):
    """Forced NearestIndex regime == dense argmin, including the min-id
    tie-break on duplicate station coordinates."""
    from oma_ray.stages.geo_join import nearest_point_join
    from oma_ray.synth import synth_stations

    ds, ids, lon, lat = _points_ds(n=3000, blocks=5)
    st = synth_stations(64)
    # plant an exact duplicate coordinate under a larger id: the tie must
    # still resolve to the smaller id
    st = {k: np.concatenate([v, v[:1]]) for k, v in st.items()}
    st["station_id"][-1] = 10_000

    dense = (
        nearest_point_join(ds, st).to_pandas().sort_values("page_id")
        .reset_index(drop=True)
    )
    idx = (
        nearest_point_join(ds, st, index_min_points=1)
        .to_pandas().sort_values("page_id").reset_index(drop=True)
    )
    assert dense["page_id"].tolist() == idx["page_id"].tolist()
    assert dense["station_id"].tolist() == idx["station_id"].tolist()
    assert dense["d2"].tolist() == idx["d2"].tolist()


def test_nearest_index_matches_brute_on_random_points():
    from oma_ray.stages.geo_join import NearestIndex

    rng = np.random.default_rng(3)
    n_pts, n_q = 500, 800
    plon = rng.integers(-1_000_000_000, 1_000_000_000, n_pts)
    plat = rng.integers(-800_000_000, 800_000_000, n_pts)
    pts = {"station_id": np.arange(n_pts, dtype=np.int64),
           "lon": plon, "lat": plat}
    qlon = rng.integers(-1_100_000_000, 1_100_000_000, n_q)
    qlat = rng.integers(-850_000_000, 850_000_000, n_q)

    idx = NearestIndex(pts)
    row, d2, leftover = idx.nearest(qlon, qlat, max_ring=64)
    assert len(leftover) == 0
    dl = np.abs(qlon[:, None] - plon[None, :]) // 100
    dt = np.abs(qlat[:, None] - plat[None, :]) // 100
    bd2 = dl * dl + dt * dt
    want = np.argmin(bd2, axis=1)
    assert (d2 == bd2[np.arange(n_q), want]).all()
    assert (idx.p_id[row] == want).all()  # ids == positions here


def test_within_distance_world_scale_radius_no_duplicates(ray_session):
    """World-scale radius (grid collapses to ncols<5): aliased 3×3 probes
    must not emit duplicate pairs — indexed multiset == dense multiset."""
    from oma_ray.stages.geo_join import within_distance_join
    from oma_ray.synth import synth_stations

    ds, ids, lon, lat = _points_ds(n=800, blocks=3)
    st = synth_stations(16)
    r2 = 2 * (1_800_000_000 // 100) ** 2  # covers the whole world

    def canon(df):
        return sorted(map(tuple, df[["page_id", "station_id", "d2"]].to_numpy()))

    dense = canon(within_distance_join(ds, st, r2).to_pandas())
    idx = canon(
        within_distance_join(ds, st, r2, index_min_points=1).to_pandas()
    )
    assert dense == idx
    assert len(dense) == len(set(dense))  # no duplicate pairs anywhere


def test_nearest_indexed_dense_fallback_parity(ray_session):
    """A pathologically tiny index cell exhausts the ring search for every
    query, forcing the dense-fallback branch — results must still equal
    the dense regime exactly."""
    from oma_ray.stages.geo_join import NearestIndex, nearest_point_join
    from oma_ray.synth import synth_stations

    ds, ids, lon, lat = _points_ds(n=1000, blocks=3)
    st = synth_stations(32)

    # the index itself reports the exhaustion
    idx = NearestIndex(st, cell=100)
    _row, _d2, leftover = idx.nearest(lon[:50], lat[:50], max_ring=2)
    assert len(leftover) > 0

    dense = (
        nearest_point_join(ds, st).to_pandas()
        .sort_values("page_id").reset_index(drop=True)
    )
    fb = (
        nearest_point_join(ds, st, index_min_points=1, index_cell=100)
        .to_pandas().sort_values("page_id").reset_index(drop=True)
    )
    assert dense["station_id"].tolist() == fb["station_id"].tolist()
    assert dense["d2"].tolist() == fb["d2"].tolist()


def test_dwithin_self_join_brute_parity(ray_session):
    """Random world-spread + clustered points vs an O(n²) reference;
    multiple partitions force cross-block cells and the exactly-once
    (home-cell-of-min-id) emission rule."""
    import ray.data as rd

    from oma_ray.stages.geo_join import dwithin_self_join

    rng = np.random.default_rng(21)
    n = 300
    lon = np.concatenate([
        rng.integers(-1_800_000_000, 1_800_000_000, n // 2),
        rng.integers(0, 300_000_000, n // 2),  # dense cluster
    ]).astype(np.int64)
    lat = np.concatenate([
        rng.integers(-900_000_000, 900_000_000, n // 2),
        rng.integers(0, 150_000_000, n // 2),
    ]).astype(np.int64)
    ids = rng.permutation(n).astype(np.int64)
    r2 = 1_000_000_000_000

    ds = rd.from_arrow(pa.table({
        "page_id": pa.array(ids), "lon": pa.array(lon),
        "lat": pa.array(lat)})).repartition(5)
    got = dwithin_self_join(ds, r2=r2, partitions=3).to_pandas()
    got_set = set(map(tuple, got[["a_id", "b_id", "d2"]].values.tolist()))
    assert len(got_set) == len(got)  # exactly-once

    dlon = np.abs(lon[:, None] - lon[None, :]) // 100
    dlat = np.abs(lat[:, None] - lat[None, :]) // 100
    d2 = dlon * dlon + dlat * dlat
    want = set()
    for i in range(n):
        for j in range(n):
            if ids[i] < ids[j] and d2[i, j] <= r2:
                want.add((int(ids[i]), int(ids[j]), int(d2[i, j])))
    assert got_set == want


def test_dwithin_isolates_brute_parity(ray_session):
    """Isolates = complement of the pair query: same random layout as the
    self-join test; a point is an isolate iff no other point is within r2.
    Duplicate coordinates with distinct ids must NOT count as isolates."""
    import ray.data as rd

    from oma_ray.stages.geo_join import dwithin_isolates

    rng = np.random.default_rng(22)
    n = 300
    lon = np.concatenate([
        rng.integers(-1_800_000_000, 1_800_000_000, n // 2),
        rng.integers(0, 300_000_000, n // 2),
    ]).astype(np.int64)
    lat = np.concatenate([
        rng.integers(-900_000_000, 900_000_000, n // 2),
        rng.integers(0, 150_000_000, n // 2),
    ]).astype(np.int64)
    # plant an exact-duplicate coordinate pair (neither is an isolate)
    lon[7], lat[7] = lon[3], lat[3]
    ids = rng.permutation(n).astype(np.int64)
    r2 = 1_000_000_000_000

    ds = rd.from_arrow(pa.table({
        "page_id": pa.array(ids), "lon": pa.array(lon),
        "lat": pa.array(lat)})).repartition(5)
    got = sorted(dwithin_isolates(ds, r2=r2, partitions=3)
                 .to_pandas()["page_id"].tolist())

    dlon = np.abs(lon[:, None] - lon[None, :]) // 100
    dlat = np.abs(lat[:, None] - lat[None, :]) // 100
    d2 = dlon * dlon + dlat * dlat
    near = (d2 <= r2) & (ids[:, None] != ids[None, :])
    want = sorted(int(i) for k, i in enumerate(ids) if not near[k].any())
    assert got == want


def test_segment_intersect_brute_parity(ray_session):
    """Random dense segments vs an O(n²) orientation-test reference;
    forced multi-partition split exercises the min-shared-cell
    exactly-once rule across cover cells."""
    import ray.data as rd

    from oma_ray.stages.geo_join import segment_intersect_join

    rng = np.random.default_rng(31)
    n = 200
    ax = rng.integers(-300_000_000, 300_000_000, n)
    ay = rng.integers(-150_000_000, 150_000_000, n)
    bx = ax + rng.integers(-80_000_000, 80_000_001, n)
    by = ay + rng.integers(-80_000_000, 80_000_001, n)
    ids = rng.permutation(n).astype(np.int64)

    ds = rd.from_arrow(pa.table({
        "seg_id": pa.array(ids), "ax": pa.array(ax), "ay": pa.array(ay),
        "bx": pa.array(bx), "by": pa.array(by)})).repartition(5)
    got = segment_intersect_join(ds, partitions=3).to_pandas()
    got_set = set(map(tuple, got[["a_id", "b_id"]].values.tolist()))
    assert len(got_set) == len(got)  # exactly-once

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            o1 = orient(ax[i], ay[i], bx[i], by[i], ax[j], ay[j])
            o2 = orient(ax[i], ay[i], bx[i], by[i], bx[j], by[j])
            o3 = orient(ax[j], ay[j], bx[j], by[j], ax[i], ay[i])
            o4 = orient(ax[j], ay[j], bx[j], by[j], bx[i], by[i])
            if ((o1 > 0) != (o2 > 0) and o1 and o2
                    and (o3 > 0) != (o4 > 0) and o3 and o4):
                want.add((int(min(ids[i], ids[j])),
                          int(max(ids[i], ids[j]))))
    assert got_set == want


def test_dbscan_brute_parity(ray_session):
    """Distributed DBSCAN vs a literal single-machine reference
    (degrees → cores → core-graph union-find → min-core border rule)
    on clustered + scattered points across forced partition splits."""
    import ray.data as rd

    from oma_ray.stages.geo_join import dbscan

    rng = np.random.default_rng(41)
    n = 240
    # three planted blobs + background scatter
    cx = np.array([200_000_000, -800_000_000, 1_200_000_000])
    cy = np.array([100_000_000, -400_000_000, 300_000_000])
    blob = rng.integers(0, 3, n // 2)
    lon = np.concatenate([
        cx[blob] + rng.integers(-40_000_000, 40_000_000, n // 2),
        rng.integers(-1_700_000_000, 1_700_000_000, n // 2)])
    lat = np.concatenate([
        cy[blob] + rng.integers(-40_000_000, 40_000_000, n // 2),
        rng.integers(-850_000_000, 850_000_000, n // 2)])
    ids = rng.permutation(n).astype(np.int64)
    r2, k = 10**12, 4

    ds = rd.from_arrow(pa.table({
        "page_id": pa.array(ids), "lon": pa.array(lon),
        "lat": pa.array(lat)})).repartition(5)
    got = (dbscan(ds, r2=r2, min_pts=k, partitions=3)
           .to_pandas().sort_values("page_id").reset_index(drop=True))

    dlon = np.abs(lon[:, None] - lon[None, :]) // 100
    dlat = np.abs(lat[:, None] - lat[None, :]) // 100
    near = (dlon * dlon + dlat * dlat <= r2) & (ids[:, None] != ids[None, :])
    deg = near.sum(axis=1)
    is_core = deg >= k
    # union-find over core-core in-radius pairs
    parent = {int(i): int(i) for i in ids[is_core]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ci = np.flatnonzero(is_core)
    for p in ci:
        for q in ci:
            if p < q and near[p, q]:
                a, b = find(int(ids[p])), find(int(ids[q]))
                if a != b:
                    parent[max(a, b)] = min(a, b)
    comp = {}
    for i in ids[is_core]:
        comp[int(i)] = min(int(j) for j in ids[is_core]
                           if find(int(j)) == find(int(i)))
    want = {int(i): (comp[int(i)], 1) for i in ids[is_core]}
    for p in np.flatnonzero(~is_core):
        cores_near = [int(ids[q]) for q in ci if near[p, q]]
        if cores_near:
            want[int(ids[p])] = (comp[min(cores_near)], 0)

    got_map = {int(r.page_id): (int(r.comp), int(r.is_core))
               for r in got.itertuples()}
    assert got_map == want
