"""Point-in-polygon spatial join against an admin-polygon set.

The polygon set is small relative to the pages table (thousands of polygons
vs 10^12 pages), so this is a broadcast join: the index is built once on the
driver, put in the object store with ``ray.put``, and each actor of the
``map_batches`` pool fetches it once in ``__init__`` (zero-copy for the
numpy payload).  No shuffle.

Lookup semantics mirror the reference's first-match idiom: polygons are
tested in table order and the first whose (outer ring minus holes) contains
the point wins (the Oma analogue: first containing bounds wins,
ChunkGenerator.java:549-556; hole containment uses the same ray cast as ring
containment, Multipolygon.java:158-167 / Point.java:19-36).  Misses get
``admin_id = -1``.

Scale: a bbox overlay grid prunes candidates; the ray cast itself is the
vectorized integer kernel from ``oma_ray.functions.geo`` run per
(candidate polygon × its candidate points) — points grouped with numpy, no
per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from oma_ray.functions.geo import points_in_ring
from oma_ray.stages.tiles import BbsGrid


class PolygonIndex:
    """Flattened, numpy-backed polygon set + overlay candidate index.

    Build from the columnar fixture dict (``synth_admin_polygons``) or any
    table with ``admin_id, ring_lon, ring_lat, holes_lon, holes_lat``.
    Pickles compactly; ship with ``ray.put``.
    """

    def __init__(self, polys: dict, overlay_bits: int = 7):
        self.admin_id = np.asarray(polys["admin_id"], dtype=np.int64)
        self.rings = [
            (np.asarray(lo, dtype=np.int64), np.asarray(la, dtype=np.int64))
            for lo, la in zip(polys["ring_lon"], polys["ring_lat"])
        ]
        self.holes = [
            [
                (np.asarray(hlo, dtype=np.int64), np.asarray(hla, dtype=np.int64))
                for hlo, hla in zip(hlos, hlas)
            ]
            for hlos, hlas in zip(polys["holes_lon"], polys["holes_lat"])
        ]
        boxes = np.array(
            [
                (lo.min(), la.min(), lo.max(), la.max())
                for lo, la in self.rings
            ],
            dtype=np.int64,
        ).reshape(-1, 4)
        # reuse the BbsGrid overlay machinery for candidate pruning; its
        # "first containing bbox" is exactly our bbox prefilter ordering
        self._ov = BbsGrid(boxes, overlay_bits=overlay_bits)
        self.bboxes = boxes

    def lookup(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """First-match polygon *row index* per point (-1 = none).

        Vectorized: a padded (N, K) bbox-candidate matrix from the overlay
        prunes pairs, the integer ray cast runs once per polygon *present in
        the batch* over all its candidate points (the only Python loop —
        bounded by the polygon count, not N), and first-match is argmax over
        the ascending candidate axis."""
        lon = np.asarray(lon, dtype=np.int64)
        lat = np.asarray(lat, dtype=np.int64)
        if len(lon) == 0:
            return np.full(0, -1, dtype=np.int64)
        cand, valid = self._ov.candidate_matrix(lon, lat)
        if cand.shape[1] == 0:
            return np.full(len(lon), -1, dtype=np.int64)
        bx = self.bboxes[cand]
        bbox_hit = (
            valid
            & (lon[:, None] >= bx[..., 0]) & (lon[:, None] <= bx[..., 2])
            & (lat[:, None] >= bx[..., 1]) & (lat[:, None] <= bx[..., 3])
        )
        contains = np.zeros_like(bbox_hit)
        pt_idx, slot_idx = np.nonzero(bbox_hit)
        if len(pt_idx):
            poly_idx = cand[pt_idx, slot_idx]
            order = np.argsort(poly_idx, kind="stable")
            pt_o, slot_o, poly_o = pt_idx[order], slot_idx[order], poly_idx[order]
            bounds = np.concatenate(
                [[0], np.nonzero(np.diff(poly_o))[0] + 1, [len(poly_o)]]
            )
            for s, e in zip(bounds[:-1], bounds[1:]):
                pi = poly_o[s]
                pts = pt_o[s:e]
                rlon, rlat = self.rings[pi]
                inside = points_in_ring(lon[pts], lat[pts], rlon, rlat)
                for hlon, hlat in self.holes[pi]:
                    if not inside.any():
                        break
                    inside &= ~points_in_ring(lon[pts], lat[pts], hlon, hlat)
                contains[pts[inside], slot_o[s:e][inside]] = True
        any_hit = contains.any(axis=1)
        first = contains.argmax(axis=1)
        return np.where(any_hit, cand[np.arange(len(lon)), first], -1).astype(np.int64)


class PIPJoin:
    """Actor-pool ``map_batches`` stage appending ``admin_id:int64``.

    Use: ``ds.map_batches(PIPJoin, fn_constructor_args=(ray.put(index),),
    batch_format="pyarrow", concurrency=N)`` — the index deserializes once
    per actor, every batch reuses it.
    """

    def __init__(self, index_or_ref, lon_col: str = "lon", lat_col: str = "lat"):
        import ray

        self.index: PolygonIndex = (
            ray.get(index_or_ref)
            if isinstance(index_or_ref, ray.ObjectRef)
            else index_or_ref
        )
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col)
        lat = batch.column(self.lat_col)
        valid = ~pa.compute.is_null(lon).to_numpy(zero_copy_only=False)
        admin = np.full(len(batch), -1, dtype=np.int64)
        if valid.any():
            lon_np = lon.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
            lat_np = lat.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
            pidx = self.index.lookup(lon_np, lat_np)
            hit = pidx >= 0
            vals = np.full(len(pidx), -1, dtype=np.int64)
            vals[hit] = self.index.admin_id[pidx[hit]]
            admin[valid] = vals
        return batch.append_column("admin_id", pa.array(admin, type=pa.int64()))


# --- distributed PIP join (polygon side too large to broadcast) --------------
#
# The broadcast PIPJoin above mirrors the reference's own assumption (a
# bounds list that fits in RAM, ChunkGenerator.java:53-97).  At 100 TB the
# polygon side can itself be a dataset (millions of admin/cadastral shapes):
# `pip_join_by_cell` removes the broadcast ceiling by co-partitioning pages
# and polygon CELL COVERS on a shared grid key and refining with the exact
# ray cast inside each block.
#
# Correctness: a polygon's cover contains every grid cell intersecting its
# bbox; if a polygon contains a point, the point is inside the bbox, so the
# page's cell is in the cover, so the (cell, polygon) cover row hashes to
# the SAME block as the page — every true candidate is co-located, and the
# exact per-block refine plus min-`ord` keeps global first-match semantics.
# Pages with no polygon in their cell simply see an empty mini-index (-1).

def polygons_table(polys: dict) -> "pa.Table":
    """Columnar polygon set (fixture dict → Arrow), with the table-order
    ``ord`` column that carries first-match priority through the shuffle."""
    n = len(polys["admin_id"])
    return pa.table(
        {
            "ord": pa.array(np.arange(n, dtype=np.int64)),
            "admin_id": pa.array(np.asarray(polys["admin_id"], dtype=np.int64)),
            "ring_lon": pa.array(polys["ring_lon"], type=pa.list_(pa.int64())),
            "ring_lat": pa.array(polys["ring_lat"], type=pa.list_(pa.int64())),
            "holes_lon": pa.array(
                polys["holes_lon"], type=pa.list_(pa.list_(pa.int64()))
            ),
            "holes_lat": pa.array(
                polys["holes_lat"], type=pa.list_(pa.list_(pa.int64()))
            ),
        }
    )


def _cover_cells(ring_lon, ring_lat, width: int) -> np.ndarray:
    """Grid cells intersecting the ring's bbox (row-major ids); the cell
    mapping is the shared geo_join.grid_rowcol."""
    from oma_ray.stages.geo_join import grid_rowcol

    rmin, cmin = (int(v) for v in grid_rowcol(min(ring_lon), min(ring_lat), width))
    rmax, cmax = (int(v) for v in grid_rowcol(max(ring_lon), max(ring_lat), width))
    rmin, rmax = max(rmin, 0), min(rmax, width - 1)
    cmin, cmax = max(cmin, 0), min(cmax, width - 1)
    rows = np.arange(rmin, rmax + 1, dtype=np.int64)
    cols = np.arange(cmin, cmax + 1, dtype=np.int64)
    return (rows[:, None] * width + cols[None, :]).ravel()


def explode_polygon_cover(batch: pa.Table, width: int,
                          coarse_width: int | None = None,
                          max_cells: int = 256) -> pa.Table:
    """Polygon rows → one row per (cell, polygon) cover pair.  The loop is
    over POLYGONS (the small side per batch); output size is the sum of
    per-polygon cover areas.

    HIERARCHICAL cover (``coarse_width``): a polygon whose fine-grid bbox
    cover exceeds ``max_cells`` is registered under the COARSE grid instead
    (cell keys offset by ``width²`` into their own keyspace), so one
    continent-scale shape emits ≤ ``coarse_width²`` rows instead of an
    O(width²) blow-up — each cover row replicates the full ring geometry,
    which is what makes the quadratic cover expensive.  Callers joining
    against a hierarchical cover must probe BOTH keyspaces (see
    ``pip_join_by_cell``)."""
    lons = batch.column("ring_lon").to_pylist()
    lats = batch.column("ring_lat").to_pylist()
    covers = []
    for lo, la in zip(lons, lats):
        c = _cover_cells(lo, la, width)
        if coarse_width is not None and len(c) > max_cells:
            c = width * width + _cover_cells(lo, la, coarse_width)
        covers.append(c)
    reps = np.array([len(c) for c in covers], dtype=np.int64)
    idx = np.repeat(np.arange(len(batch)), reps)
    out = batch.take(pa.array(idx))
    return out.append_column(
        "cell_id", pa.array(np.concatenate(covers) if covers else
                            np.zeros(0, dtype=np.int64))
    )


def pip_join_by_cell(pages_ds, polys_ds, *, width: int = 128,
                     num_partitions: int | None = None,
                     id_col: str = "page_id", lon_col: str = "lon",
                     lat_col: str = "lat",
                     polys_schema: "pa.Schema | None" = None,
                     coarse_width: int | None = None,
                     max_cells: int = 256):
    """Distributed first-match PIP join: (id, admin_id) for every page row
    with valid coordinates (admin_id = -1 when no polygon contains it).

    Both sides flow through ONE keyed exchange on ``cell_id`` (tagged
    colocated union, the hash_join shape); each block rebuilds a bbox-overlay
    ``PolygonIndex`` over the ≤ |polygons-in-block| cover rows (deduped by
    ``ord``) and runs the vectorized ray cast.  Nothing polygon- or
    page-scale ever sits on the driver.

    ``coarse_width`` switches on the HIERARCHICAL cover for continent-scale
    shapes: polygons whose fine cover exceeds ``max_cells`` register under
    the coarse grid (their geometry replicates ≤ coarse_width² times, not
    O(width²)); pages then probe both keyspaces (one extra narrow row per
    page in the exchange) and a second id-keyed exchange folds the
    per-level candidates back to global first-match (min ``ord``).  With
    the default ``coarse_width=None`` the pipeline is byte-identical to
    the single-level path — no extra exchange, no ord column.
    """
    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()

    pschema = polys_schema if polys_schema is not None else polys_ds.schema()
    ptypes = dict(zip(pschema.names, pschema.types))
    pcols = ["ord", "admin_id", "ring_lon", "ring_lat", "holes_lon", "holes_lat"]

    def pad_pages(batch: pa.Table) -> pa.Table:
        lon = batch.column(lon_col)
        lat = batch.column(lat_col)
        valid = ~(
            pa.compute.is_null(lon).to_numpy(zero_copy_only=False)
            | pa.compute.is_null(lat).to_numpy(zero_copy_only=False)
        )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[valid]
        lon_np = lon.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
        lat_np = lat.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
        from oma_ray.stages.geo_join import grid_rowcol

        row, col = grid_rowcol(lon_np, lat_np, width)
        cells = row * width + col
        if coarse_width is not None:
            crow, ccol = grid_rowcol(lon_np, lat_np, coarse_width)
            ccells = width * width + crow * coarse_width + ccol
            cells = np.concatenate([cells, ccells])
            ids = np.concatenate([ids, ids])
            lon_np = np.concatenate([lon_np, lon_np])
            lat_np = np.concatenate([lat_np, lat_np])
        t = pa.table(
            {
                "cell_id": pa.array(cells),
                "__side": pa.array(np.ones(len(ids), dtype=np.int8)),
                id_col: pa.array(ids, type=pa.int64()),
                "pt_lon": pa.array(lon_np),
                "pt_lat": pa.array(lat_np),
            }
        )
        for c in pcols:
            t = t.append_column(c, pa.nulls(len(t), type=ptypes[c]))
        return t

    def pad_polys(batch: pa.Table) -> pa.Table:
        t = explode_polygon_cover(batch, width, coarse_width=coarse_width,
                                  max_cells=max_cells)
        out = pa.table(
            {
                "cell_id": t.column("cell_id"),
                "__side": pa.array(np.zeros(len(t), dtype=np.int8)),
                id_col: pa.nulls(len(t), type=pa.int64()),
                "pt_lon": pa.nulls(len(t), type=pa.int64()),
                "pt_lat": pa.nulls(len(t), type=pa.int64()),
            }
        )
        for c in pcols:
            out = out.append_column(c, t.column(c))
        return out

    both = (
        pages_ds.map_batches(pad_pages, batch_format="pyarrow")
        .union(polys_ds.map_batches(pad_polys, batch_format="pyarrow"))
        .repartition(num_partitions, keys=["cell_id"])
    )

    MISS_ORD = 1 << 62  # first-match sentinel: any real ord beats a miss

    def block_pip(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = {
            id_col: pa.array([], type=pa.int64()),
            "admin_id": pa.array([], type=pa.int64()),
        }
        if coarse_width is not None:
            empty["ord"] = pa.array([], type=pa.int64())
        side = batch.column("__side")
        pages = batch.filter(pc.equal(side, 1))
        if not len(pages):
            return pa.table(empty)
        polys = batch.filter(pc.equal(side, 0))
        admin = np.full(len(pages), -1, dtype=np.int64)
        word = np.full(len(pages), MISS_ORD, dtype=np.int64)
        if len(polys):
            # dedupe cover rows (one polygon may cover several cells of this
            # block) and restore table order = first-match priority
            df = polys.select(pcols).to_pandas()
            df = df.drop_duplicates(subset=["ord"]).sort_values("ord")
            idx = PolygonIndex(
                {
                    "admin_id": df["admin_id"].to_numpy(),
                    "ring_lon": list(df["ring_lon"]),
                    "ring_lat": list(df["ring_lat"]),
                    "holes_lon": [list(h) for h in df["holes_lon"]],
                    "holes_lat": [list(h) for h in df["holes_lat"]],
                }
            )
            lon = pages.column("pt_lon").to_numpy(zero_copy_only=False)
            lat = pages.column("pt_lat").to_numpy(zero_copy_only=False)
            # NB: pages of SEVERAL cells share this block; that only adds
            # candidates (exact refine rejects them), never loses any
            pidx = idx.lookup(lon, lat)
            hit = pidx >= 0
            admin[hit] = idx.admin_id[pidx[hit]]
            word[hit] = df["ord"].to_numpy()[pidx[hit]]
        out = {
            id_col: pages.column(id_col),
            "admin_id": pa.array(admin, type=pa.int64()),
        }
        if coarse_width is not None:
            out["ord"] = pa.array(word, type=pa.int64())
        return pa.table(out)

    from oma_ray.stages.dedup import _schema_anchor

    anchor_cols = {id_col: pa.array([], type=pa.int64()),
                   "admin_id": pa.array([], type=pa.int64())}
    if coarse_width is None:
        return _schema_anchor(
            both.map_batches(block_pip, batch_format="pyarrow"),
            pa.table(anchor_cols),
        )

    # hierarchical: each page has one candidate row per level — fold to
    # global first-match (min ord; misses carry MISS_ORD) with a second
    # id-keyed exchange
    cand = _schema_anchor(
        both.map_batches(block_pip, batch_format="pyarrow"),
        pa.table({**anchor_cols, "ord": pa.array([], type=pa.int64())}),
    ).repartition(num_partitions, keys=[id_col])

    def first_match(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return pa.table(anchor_cols)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        ords = batch.column("ord").to_numpy(zero_copy_only=False)
        adm = batch.column("admin_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ords, ids))
        ids_s, adm_s = ids[order], adm[order]
        new = np.ones(len(ids_s), dtype=bool)
        new[1:] = ids_s[1:] != ids_s[:-1]
        starts = np.nonzero(new)[0]
        return pa.table(
            {
                id_col: pa.array(ids_s[starts], type=pa.int64()),
                "admin_id": pa.array(adm_s[starts], type=pa.int64()),
            }
        )

    return _schema_anchor(
        cand.map_batches(first_match, batch_format="pyarrow"),
        pa.table(anchor_cols),
    )


def simplify_polygons(polys_ds, eps: int):
    """Douglas-Peucker boundary simplification over a polygon Dataset
    (map_batches, no shuffle): each outer ring and hole is simplified with
    the exact-integer kernel (functions/geo.simplify_ring); closure is
    preserved (first == last always kept).  The 100 TB use: shrink
    continent-scale admin boundaries BEFORE they broadcast to the PIP
    stages — vertex count drops, containment semantics change only within
    ``eps`` of the boundary (callers pick eps below their tile margin)."""
    from oma_ray.functions.geo import simplify_ring

    def fn(batch: pa.Table) -> pa.Table:
        lons = batch.column("ring_lon").to_pylist()
        lats = batch.column("ring_lat").to_pylist()
        hlons = batch.column("holes_lon").to_pylist()
        hlats = batch.column("holes_lat").to_pylist()
        out_lon, out_lat, out_hlon, out_hlat = [], [], [], []
        for lo, la, hlo, hla in zip(lons, lats, hlons, hlats):
            m = simplify_ring(np.asarray(lo), np.asarray(la), eps)
            out_lon.append([v for v, k in zip(lo, m) if k])
            out_lat.append([v for v, k in zip(la, m) if k])
            slo, sla = [], []
            for one_lon, one_lat in zip(hlo, hla):
                hm = simplify_ring(np.asarray(one_lon), np.asarray(one_lat), eps)
                slo.append([v for v, k in zip(one_lon, hm) if k])
                sla.append([v for v, k in zip(one_lat, hm) if k])
            out_hlon.append(slo)
            out_hlat.append(sla)
        cols = {c: batch.column(c) for c in batch.column_names
                if c not in ("ring_lon", "ring_lat", "holes_lon", "holes_lat")}
        cols["ring_lon"] = pa.array(out_lon, type=pa.list_(pa.int64()))
        cols["ring_lat"] = pa.array(out_lat, type=pa.list_(pa.int64()))
        cols["holes_lon"] = pa.array(out_hlon, type=pa.list_(pa.list_(pa.int64())))
        cols["holes_lat"] = pa.array(out_hlat, type=pa.list_(pa.list_(pa.int64())))
        return pa.table(cols)

    return polys_ds.map_batches(fn, batch_format="pyarrow")
