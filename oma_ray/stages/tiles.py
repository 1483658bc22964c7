"""First-match bbox tile assignment (the Oma chunk-assignment step).

Reference semantics (ChunkGenerator.java:549-574): scan the ordered bounds
list, first box that *fully contains* the element wins; elements contained by
no box get index ``len(boxes)`` (the whole-world catch-all is appended by the
bbs parser, so in practice the catch-all wins before that).  Containment is
inclusive on all edges (Bounds.java:58-80).

The reference does a linear scan over ~1,600 boxes per element; here we build
a small overlay grid (driver-side, broadcast once per actor/task) mapping
overlay cells → candidate box indices, then assign whole batches vectorized:
points are grouped by overlay cell and each cell's few candidates are tested
in priority order.  O(N · avg_candidates) instead of O(N · B).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from oma_ray import WORLD


class BbsGrid:
    """Ordered box list + overlay candidate index.  Immutable; cheap to
    pickle — ship via ``ray.put`` once and read in each task/actor.
    """

    def __init__(self, boxes: np.ndarray, overlay_bits: int = 7):
        boxes = np.asarray(boxes, dtype=np.int64)
        assert boxes.ndim == 2 and boxes.shape[1] == 4
        self.boxes = boxes
        self.n = len(boxes)
        self.overlay_bits = overlay_bits
        n_ov = 1 << overlay_bits
        self._n_ov = n_ov
        # overlay cell extents (half-open over the closed world bbox)
        self._lon0, self._lat0 = WORLD[0], WORLD[1]
        self._lon_span = WORLD[2] - WORLD[0] + 1
        self._lat_span = WORLD[3] - WORLD[1] + 1
        # build CSR candidate lists: overlay cell id → sorted box indices
        cand: list[list[int]] = [[] for _ in range(n_ov * n_ov)]
        for bi in range(self.n):
            minlon, minlat, maxlon, maxlat = boxes[bi]
            x0 = self._ov_x(np.array([minlon]))[0]
            x1 = self._ov_x(np.array([maxlon]))[0]
            y0 = self._ov_y(np.array([minlat]))[0]
            y1 = self._ov_y(np.array([maxlat]))[0]
            for y in range(y0, y1 + 1):
                for x in range(x0, x1 + 1):
                    cand[y * n_ov + x].append(bi)
        counts = np.array([len(c) for c in cand], dtype=np.int64)
        self._offsets = np.concatenate([[0], np.cumsum(counts)])
        self._cands = np.array(
            [bi for c in cand for bi in c], dtype=np.int64
        ) if counts.sum() else np.empty(0, dtype=np.int64)

    def _ov_x(self, lon: np.ndarray) -> np.ndarray:
        return np.clip(
            (np.asarray(lon, np.int64) - self._lon0) * self._n_ov // self._lon_span,
            0, self._n_ov - 1,
        )

    def _ov_y(self, lat: np.ndarray) -> np.ndarray:
        return np.clip(
            (np.asarray(lat, np.int64) - self._lat0) * self._n_ov // self._lat_span,
            0, self._n_ov - 1,
        )

    def candidate_matrix(
        self, lon: np.ndarray, lat: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """(N, K) per-point candidate box indices (ascending = priority order)
        + validity mask, fully vectorized via the overlay CSR.  K is the max
        candidate count among the touched overlay cells (~tens)."""
        cell = self._ov_y(lat) * self._n_ov + self._ov_x(lon)
        start = self._offsets[cell]
        cnt = self._offsets[cell + 1] - start
        k = int(cnt.max()) if len(cnt) else 0
        if k == 0:
            return np.zeros((len(lon), 0), dtype=np.int64), np.zeros((len(lon), 0), bool)
        slots = np.arange(k, dtype=np.int64)
        gather = np.minimum(start[:, None] + slots[None, :], len(self._cands) - 1)
        cand = self._cands[gather]
        valid = slots[None, :] < cnt[:, None]
        return cand, valid

    def assign_points(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """First-match tile index per point; ``self.n`` when nothing contains
        (getFirstChunk's miss value, ChunkGenerator.java:549-556).

        Vectorized with cache-friendly access: points are sorted by overlay
        cell (so candidate gathers hit memory sequentially), then candidate
        slots are tested column-by-column in priority order with early exit —
        most points match their first (finest) candidate, so later columns
        shrink to the leftovers.  16× faster than the padded (N, K) matrix
        on globally-spread points."""
        lon = np.asarray(lon, dtype=np.int64)
        lat = np.asarray(lat, dtype=np.int64)
        n = len(lon)
        if n == 0:
            return np.full(0, self.n, dtype=np.int32)
        cell = self._ov_y(lat) * self._n_ov + self._ov_x(lon)
        order = np.argsort(cell, kind="stable")
        lon_s, lat_s = lon[order], lat[order]
        start = self._offsets[cell[order]]
        cnt = self._offsets[cell[order] + 1] - start
        k = int(cnt.max())
        out_s = np.full(n, self.n, dtype=np.int32)
        unassigned = np.ones(n, dtype=bool)
        bx = self.boxes
        for j in range(k):
            m = unassigned & (j < cnt)
            if not m.any():
                break
            ci = self._cands[start[m] + j]
            b = bx[ci]
            hit = (
                (lon_s[m] >= b[:, 0]) & (lon_s[m] <= b[:, 2])
                & (lat_s[m] >= b[:, 1]) & (lat_s[m] <= b[:, 3])
            )
            mi = np.nonzero(m)[0][hit]
            out_s[mi] = ci[hit]
            unassigned[mi] = False
        out = np.empty(n, dtype=np.int32)
        out[order] = out_s
        return out

    def assign_bboxes(
        self, minlon: np.ndarray, minlat: np.ndarray,
        maxlon: np.ndarray, maxlat: np.ndarray,
    ) -> np.ndarray:
        """First-match for geometries: a box must contain *every* point of the
        geometry (Bounds.java:63-68), which for an axis-aligned box equals
        containing the geometry's bbox.  Inputs are per-geometry bboxes."""
        minlon = np.asarray(minlon, np.int64)
        minlat = np.asarray(minlat, np.int64)
        maxlon = np.asarray(maxlon, np.int64)
        maxlat = np.asarray(maxlat, np.int64)
        n = len(minlon)
        if n == 0:
            return np.full(0, self.n, dtype=np.int32)
        # candidates from the overlay cell of the geometry's min corner are a
        # superset of boxes containing the whole bbox; same sorted
        # column-loop as assign_points
        cell = self._ov_y(minlat) * self._n_ov + self._ov_x(minlon)
        order = np.argsort(cell, kind="stable")
        a_s, b_s = minlon[order], minlat[order]
        c_s, d_s = maxlon[order], maxlat[order]
        start = self._offsets[cell[order]]
        cnt = self._offsets[cell[order] + 1] - start
        out_s = np.full(n, self.n, dtype=np.int32)
        unassigned = np.ones(n, dtype=bool)
        bx = self.boxes
        for j in range(int(cnt.max())):
            m = unassigned & (j < cnt)
            if not m.any():
                break
            ci = self._cands[start[m] + j]
            b = bx[ci]
            hit = (
                (a_s[m] >= b[:, 0]) & (c_s[m] <= b[:, 2])
                & (b_s[m] >= b[:, 1]) & (d_s[m] <= b[:, 3])
            )
            mi = np.nonzero(m)[0][hit]
            out_s[mi] = ci[hit]
            unassigned[mi] = False
        out = np.empty(n, dtype=np.int32)
        out[order] = out_s
        return out


class TileAssign:
    """``map_batches`` callable appending ``tile_id:int32``.

    Stateless per batch but holds the (broadcast) grid: pass
    ``grid_ref=ray.put(BbsGrid(...))`` and use as an actor pool, or pass the
    grid directly for task-based stages (it is small).  Rows with null
    lon/lat go to the catch-all index ``grid.n`` — parity with relations /
    collections routed to the catch-all (ChunkGenerator.java:388-398).
    """

    def __init__(self, grid_or_ref, lon_col: str = "lon", lat_col: str = "lat"):
        import ray

        self.grid = (
            ray.get(grid_or_ref)
            if isinstance(grid_or_ref, ray.ObjectRef)
            else grid_or_ref
        )
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col)
        lat = batch.column(self.lat_col)
        valid = ~(pa.compute.is_null(lon).to_numpy(zero_copy_only=False))
        lon_np = lon.to_numpy(zero_copy_only=False)
        lat_np = lat.to_numpy(zero_copy_only=False)
        tile = np.full(len(batch), self.grid.n, dtype=np.int32)
        if valid.any():
            tile[valid] = self.grid.assign_points(
                lon_np[valid].astype(np.int64), lat_np[valid].astype(np.int64)
            )
        return batch.append_column("tile_id", pa.array(tile, type=pa.int32()))
