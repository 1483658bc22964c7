"""Fused spatial stage: cell ids + first-match tile + point-in-polygon join
in a single actor-pool ``map_batches`` callable.

Why fused: each sub-step reads the same lon/lat columns, and keeping them in
one ``ActorPoolMapOperator`` means ONE pool holds both broadcast indexes and
the pipeline has a single stateful stage — separate pools would each reserve
``concurrency × num_cpus`` and can starve the read stage on small clusters
(each index is fetched from the object store once per actor, zero-copy for
the numpy buffers).  The individual stages (CellAssign / TileAssign /
PIPJoin) remain available for composing custom pipelines.

Semantics per sub-step are documented in their home modules; tile first-match
parity: ChunkGenerator.java:549-574.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from oma_ray.functions.geo import cell_grid, cell_hex, cell_morton


_WORKER_CACHE: dict = {}
"""Per-worker-process cache for broadcast state used by TASK-pool stages.

Why tasks instead of an actor pool here: the spatial indexes deserialize
zero-copy from the object store in milliseconds, so the actor pool's only
benefit (amortized setup) is nearly free for tasks too — while its costs
(pool sizing, startup stampede, and *breaking operator fusion* between the
surrounding task stages, which forces every row through the object store an
extra time) dominate the pipeline.  A plain function with a worker-local
cache keeps the whole read→synth→parse→spatial→aggregate chain fused into
one pipelined task per block.  Actor pools remain the right tool for state
that is genuinely expensive to build per worker (e.g. a model on GPU).
"""


class SpatialJoinTask:
    """Pickle-cheap task callable: holds only the ``ray.put`` refs; the
    resolved ``SpatialJoin`` is cached per (refs) per worker process."""

    def __init__(self, grid_ref, poly_ref, **kwargs):
        self.grid_ref = grid_ref
        self.poly_ref = poly_ref
        self.kwargs = kwargs

    def _key(self):
        def k(x):
            return x.hex() if hasattr(x, "hex") else str(id(x))

        return ("spatial", k(self.grid_ref), k(self.poly_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        sj = _WORKER_CACHE.get(self._key())
        if sj is None:
            sj = SpatialJoin(self.grid_ref, self.poly_ref, **self.kwargs)
            _WORKER_CACHE[self._key()] = sj
        return sj(batch)


class SpatialJoin:
    """Append ``cell_id, cell_s2, cell_h3, tile_id, admin_id`` from fixed-point
    ``lon/lat`` columns.  Rows with null coords: tile_id = catch-all index,
    admin_id = -1, cell ids null (parity: geometry-less relations go to the
    catch-all chunk, ChunkGenerator.java:388-398)."""

    def __init__(
        self,
        grid_or_ref,
        poly_or_ref,
        *,
        level: int = 13,
        hex_res: int = 7,
        lon_col: str = "lon",
        lat_col: str = "lat",
    ):
        import ray

        def resolve(x):
            return ray.get(x) if isinstance(x, ray.ObjectRef) else x

        self.grid = resolve(grid_or_ref)
        self.polys = resolve(poly_or_ref)
        self.level = level
        self.hex_res = hex_res
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col)
        lat = batch.column(self.lat_col)
        valid = ~pa.compute.is_null(lon).to_numpy(zero_copy_only=False)
        lo = lon.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
        la = lat.to_numpy(zero_copy_only=False)[valid].astype(np.int64)

        def masked(vals, typ):
            full = np.zeros(len(batch), dtype=vals.dtype if len(vals) else np.int64)
            full[valid] = vals
            return pa.array(full, type=typ, mask=~valid)

        batch = batch.append_column("cell_id", masked(cell_grid(lo, la, self.level), pa.int64()))
        batch = batch.append_column("cell_s2", masked(cell_morton(lo, la, self.level), pa.uint64()))
        batch = batch.append_column("cell_h3", masked(cell_hex(lo, la, self.hex_res), pa.uint64()))

        tile = np.full(len(batch), self.grid.n, dtype=np.int32)
        tile[valid] = self.grid.assign_points(lo, la)
        batch = batch.append_column("tile_id", pa.array(tile, type=pa.int32()))

        admin = np.full(len(batch), -1, dtype=np.int64)
        if valid.any():
            pidx = self.polys.lookup(lo, la)
            hit = pidx >= 0
            vals = np.full(len(pidx), -1, dtype=np.int64)
            vals[hit] = self.polys.admin_id[pidx[hit]]
            admin[valid] = vals
        return batch.append_column("admin_id", pa.array(admin, type=pa.int64()))
