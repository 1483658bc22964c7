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
