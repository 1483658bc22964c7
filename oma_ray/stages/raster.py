"""Raster→vector sampling stage (north_star "raster-to-vector zonal joins").

A raster is a real broadcast numpy array: ``ray.put`` once, fetched once
per worker through the task cache, indexed per batch with pure numpy
gathers — never re-shipped per batch, never sampled through a Python loop.
At 100 TB the raster would be tiled (one object-store entry per tile,
fetched by the workers whose points touch it); the single-array form here
is the one-tile case of that layout with identical stage mechanics.

The synthetic raster is deterministic from a closed-form formula so the
DuckDB oracle can mirror the sampled values exactly (q21) — but the engine
side only ever touches the materialized ARRAY, not the formula.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

RASTER_ROWS = 1800   # 0.1° cells: 180° of latitude
RASTER_COLS = 3600   # 0.1° cells: 360° of longitude
_CELL_FIXED = 1_000_000  # 0.1° in 1e-7-degree fixed point


def synth_raster() -> np.ndarray:
    """Deterministic global 'elevation' raster, (1800, 3600) int32.

    elev(row, col) = (row*7919 + col*104729) mod 10000 — mirrored verbatim
    in SQL_Q21 so the oracle reproduces every sampled value."""
    r = np.arange(RASTER_ROWS, dtype=np.int64)[:, None]
    c = np.arange(RASTER_COLS, dtype=np.int64)[None, :]
    return ((r * 7919 + c * 104729) % 10000).astype(np.int32)


class RasterSample:
    """``map_batches`` callable: append ``elev:int32`` sampled from the
    broadcast raster at each row's (lon, lat); null where has_geo is false.
    Wrap in ``CachedStage`` so the array deserializes once per worker."""

    def __init__(self, raster_or_ref, lon_col: str = "lon",
                 lat_col: str = "lat", out_col: str = "elev"):
        import ray

        self.raster = (
            ray.get(raster_or_ref)
            if isinstance(raster_or_ref, ray.ObjectRef)
            else raster_or_ref
        )
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon_arr = batch.column(self.lon_col)
        lat_arr = batch.column(self.lat_col)
        valid = ~(
            pa.compute.is_null(lon_arr).to_numpy(zero_copy_only=False)
            | pa.compute.is_null(lat_arr).to_numpy(zero_copy_only=False)
        )
        lon = np.where(valid, lon_arr.to_numpy(zero_copy_only=False), 0).astype(np.int64)
        lat = np.where(valid, lat_arr.to_numpy(zero_copy_only=False), 0).astype(np.int64)
        row = np.minimum((lat + 900_000_000) // _CELL_FIXED, RASTER_ROWS - 1)
        col = np.minimum((lon + 1_800_000_000) // _CELL_FIXED, RASTER_COLS - 1)
        elev = self.raster[row, col]
        return batch.append_column(
            self.out_col,
            pa.array(elev.astype(np.int32), type=pa.int32(),
                     mask=~valid),
        )


def split_raster(raster: np.ndarray, tiles_y: int, tiles_x: int) -> dict:
    """Tiled raster layout: the raster splits into a (tiles_y × tiles_x)
    grid, each tile ``ray.put`` as its OWN object-store entry.  Workers
    fetch only the tiles their points touch (RasterSampleTiled) — at
    planet scale no worker ever holds the whole raster, and cold tiles
    never ship.  Returns the broadcast state dict (inner ObjectRefs stay
    refs inside the outer ``ray.put``, so the fetch really is lazy)."""
    import math

    import ray

    rows, cols = raster.shape
    th = math.ceil(rows / tiles_y)
    tw = math.ceil(cols / tiles_x)
    refs = {}
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            sub = raster[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            refs[(ty, tx)] = ray.put(np.ascontiguousarray(sub))
    return {"refs": refs, "tile_h": th, "tile_w": tw, "shape": raster.shape}


class RasterSampleTiled:
    """``map_batches`` callable over a TILED raster: same sampling contract
    as RasterSample, but each batch gathers per touched tile, fetching
    tiles lazily and caching them per worker (wrap in ``CachedStage`` so
    the cache lives as long as the worker)."""

    def __init__(self, state_or_ref, lon_col: str = "lon",
                 lat_col: str = "lat", out_col: str = "elev"):
        import ray

        st = (
            ray.get(state_or_ref)
            if isinstance(state_or_ref, ray.ObjectRef)
            else state_or_ref
        )
        self.refs = st["refs"]
        self.th = st["tile_h"]
        self.tw = st["tile_w"]
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.out_col = out_col
        self._cache: dict = {}

    def _tile(self, ty: int, tx: int) -> np.ndarray:
        key = (ty, tx)
        if key not in self._cache:
            import ray

            self._cache[key] = ray.get(self.refs[key])
        return self._cache[key]

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon_arr = batch.column(self.lon_col)
        lat_arr = batch.column(self.lat_col)
        valid = ~(
            pa.compute.is_null(lon_arr).to_numpy(zero_copy_only=False)
            | pa.compute.is_null(lat_arr).to_numpy(zero_copy_only=False)
        )
        lon = np.where(
            valid, lon_arr.to_numpy(zero_copy_only=False), 0
        ).astype(np.int64)
        lat = np.where(
            valid, lat_arr.to_numpy(zero_copy_only=False), 0
        ).astype(np.int64)
        row = np.minimum((lat + 900_000_000) // _CELL_FIXED, RASTER_ROWS - 1)
        col = np.minimum((lon + 1_800_000_000) // _CELL_FIXED, RASTER_COLS - 1)
        ty = row // self.th
        tx = col // self.tw
        elev = np.zeros(len(batch), dtype=np.int32)
        tkey = ty * 10_000 + tx
        for t in np.unique(tkey[valid]) if valid.any() else []:
            m = valid & (tkey == t)
            a, b = int(t) // 10_000, int(t) % 10_000
            tile = self._tile(a, b)
            elev[m] = tile[row[m] - a * self.th, col[m] - b * self.tw]
        return batch.append_column(
            self.out_col,
            pa.array(elev, type=pa.int32(), mask=~valid),
        )


# SQL fragment mirroring one sample: elev for a (lon, lat) pair, matching
# RasterSample's row/col mapping and synth_raster's formula exactly
SQL_ELEV = (
    "((LEAST(({lat} + 900000000) // 1000000, 1799) * 7919"
    " + LEAST(({lon} + 1800000000) // 1000000, 3599) * 104729) % 10000)"
)


def synth_slope() -> np.ndarray:
    """Terrain-roughness raster derived from ``synth_raster`` by clamped
    central differences: slope(r,c) = |E−W| + |N−S| with edge cells
    clamping the neighbor index — a focal (3×3-dependent) derivation
    computed ONCE on the full array and broadcast like any raster, the
    raster-algebra step of a slope/aspect pipeline.  Mirrored closed-form
    in SQL_SLOPE so the oracle reproduces every sampled value."""
    e = synth_raster().astype(np.int64)
    ce = np.minimum(np.arange(RASTER_COLS) + 1, RASTER_COLS - 1)
    cw = np.maximum(np.arange(RASTER_COLS) - 1, 0)
    rs = np.minimum(np.arange(RASTER_ROWS) + 1, RASTER_ROWS - 1)
    rn = np.maximum(np.arange(RASTER_ROWS) - 1, 0)
    dx = np.abs(e[:, ce] - e[:, cw])
    dy = np.abs(e[rs, :] - e[rn, :])
    return (dx + dy).astype(np.int32)


# slope at the cell of (lon, lat): elev-formula recomputed at the four
# clamped neighbors ({r}/{c} are the row/col SQL fragments)
SQL_SLOPE = (
    "(ABS((({r}) * 7919 + LEAST(({c}) + 1, 3599) * 104729) % 10000"
    "   - (({r}) * 7919 + GREATEST(({c}) - 1, 0) * 104729) % 10000)"
    " + ABS((LEAST(({r}) + 1, 1799) * 7919 + ({c}) * 104729) % 10000"
    "   - (GREATEST(({r}) - 1, 0) * 7919 + ({c}) * 104729) % 10000))"
)

SQL_ROW = "LEAST(({lat} + 900000000) // 1000000, 1799)"
SQL_COL = "LEAST(({lon} + 1800000000) // 1000000, 3599)"
