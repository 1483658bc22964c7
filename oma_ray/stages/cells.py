"""Cell-index assignment stage: grid / Morton ("S2-level-13-shaped") and hex
("H3-res-7-shaped") cell ids appended per row.  Pure-math, stateless —
runs as Ray tasks, no actor pool needed.  See oma_ray.functions.geo for the
scheme definitions and the pluggability note (real h3/s2 bindings slot in by
swapping the kernel functions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from oma_ray.functions.geo import cell_grid, cell_hex, cell_hilbert, cell_morton


class CellAssign:
    """Append ``cell_id:int64`` (row-major grid), ``cell_s2:uint64``
    (Morton), ``cell_h3:uint64`` (hex) from fixed-point lon/lat columns.
    Null coords → cell ids null."""

    def __init__(
        self,
        level: int = 13,
        hex_res: int = 7,
        lon_col: str = "lon",
        lat_col: str = "lat",
        which: tuple[str, ...] = ("grid", "morton", "hex"),
    ):
        self.level = level
        self.hex_res = hex_res
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.which = which

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col)
        lat = batch.column(self.lat_col)
        valid = ~pa.compute.is_null(lon).to_numpy(zero_copy_only=False)
        lon_np = lon.to_numpy(zero_copy_only=False)
        lat_np = lat.to_numpy(zero_copy_only=False)
        lo = lon_np[valid].astype(np.int64)
        la = lat_np[valid].astype(np.int64)

        def masked(vals: np.ndarray, typ) -> pa.Array:
            full = np.zeros(len(batch), dtype=vals.dtype if len(vals) else np.int64)
            full[valid] = vals
            return pa.array(full, type=typ, mask=~valid)

        if "grid" in self.which:
            batch = batch.append_column(
                "cell_id", masked(cell_grid(lo, la, self.level), pa.int64())
            )
        if "morton" in self.which:
            batch = batch.append_column(
                "cell_s2", masked(cell_morton(lo, la, self.level), pa.uint64())
            )
        if "hex" in self.which:
            batch = batch.append_column(
                "cell_h3", masked(cell_hex(lo, la, self.hex_res), pa.uint64())
            )
        if "hilbert" in self.which:
            batch = batch.append_column(
                "cell_hilbert",
                masked(cell_hilbert(lo, la, self.level), pa.int64()),
            )
        return batch
