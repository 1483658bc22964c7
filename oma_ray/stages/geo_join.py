"""Geospatial join operators over fixed-point integer coordinates.

The reference's only spatial joins are first-match bbox containment
(ChunkGenerator.java:549-574) and PIP hole assignment (Multipolygon.java:
134-186); a general tiling engine also needs the classic vector-join
family, each expressed Ray-Data-first here:

- ``geo_knn_join``      — k nearest PAGES per query point (few queries ×
  huge corpus): per-batch vectorized partial top-k → one keyed exchange
  bounded by #queries → per-block final top-k.  The exchange moves
  O(batches × queries × k) rows, never the corpus.
- ``nearest_point_join`` — nearest STATION per page (huge corpus × small
  broadcast side): pure per-batch argmin, NO shuffle — the ideal 100 TB
  shape (embarrassingly parallel, fuses with upstream stages).
- ``box_count_join``    — interval/range join of points against a
  broadcast box set with OVERLAP semantics (a point can hit several
  boxes, unlike the reference's first-match rule), pre-aggregated to
  per-box counts before the keyed exchange.
- ``grid_neighborhood`` — 3×3 focal sum over occupied grid cells (the
  raster-algebra "neighborhood" primitive on a sparse vector grid):
  per-cell counts → 9-offset scatter → second keyed combine → colocated
  join back to occupied cells.
- ``tile_pyramid``      — multi-resolution rollup of point counts to a
  stack of coarser grids in ONE pass (partials carry (level, cell) keys).

Distances use the SQL-mirrorable integer metric
``d2 = (|Δlon|//100)² + (|Δlat|//100)²`` — the ``//100`` scale keeps the
sum below 2.7e15 (int64- and float64-exact), and ``abs`` before the
division makes floor == truncation so numpy and DuckDB agree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from oma_ray.sources.parquet import from_pandas_clean

GRID_W = 8192  # matches stages/cells.py grid resolution and SQL_Q13


def grid_rowcol(lon, lat, width: int):
    """Fixed-point coords → (row, col) on a width×width world grid — THE
    shared cell mapping (SQL mirror: ``(lat+9e8)*W//1800000001`` etc.).
    Every cover/candidate co-location in this module and stages/pip.py
    derives from this one function; a divergent copy would silently
    de-co-locate candidates."""
    row = (np.asarray(lat, dtype=np.int64) + 900_000_000) * width // 1_800_000_001
    col = (np.asarray(lon, dtype=np.int64) + 1_800_000_000) * width // 3_600_000_001
    return row, col


def _d2(lon: np.ndarray, lat: np.ndarray, qlon: np.ndarray, qlat: np.ndarray):
    """Squared scaled distance matrix (len(qlon) × len(lon)), int64-exact."""
    a = np.abs(lon[None, :] - qlon[:, None]) // 100
    b = np.abs(lat[None, :] - qlat[:, None]) // 100
    return a * a + b * b


def _valid_coords(batch: pa.Table, lon_col: str, lat_col: str):
    import pyarrow.compute as pc

    lon = batch.column(lon_col)
    lat = batch.column(lat_col)
    # BOTH coordinates must be present: a half-null row would turn the
    # missing side's NaN into a garbage int64 and silently mis-assign
    valid = ~(
        pc.is_null(lon).to_numpy(zero_copy_only=False)
        | pc.is_null(lat).to_numpy(zero_copy_only=False)
    )
    lon = lon.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
    lat = lat.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
    return lon, lat, valid


def _expand_sorted_hits(sorted_keys: np.ndarray, probe_keys: np.ndarray):
    """Candidate expansion against a SORTED key column: for each probe key,
    the flat positions of its matching run.  Returns (probe_idx, positions)
    — the shared kernel of every grid index here (Box/Point/Nearest)."""
    lo = np.searchsorted(sorted_keys, probe_keys, side="left")
    hi = np.searchsorted(sorted_keys, probe_keys, side="right")
    reps = hi - lo
    if not reps.any():
        z = np.zeros(0, dtype=np.int64)
        return z, z
    probe_idx = np.repeat(np.arange(len(probe_keys), dtype=np.int64), reps)
    offs = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(reps) - reps, reps
    )
    return probe_idx, np.repeat(lo, reps) + offs


# above this many broadcast rows the dense |boxes|×|batch| mask matrix is the wrong
# shape — the indexed kernel takes over (forced low in the parity tests)
BOX_INDEX_MIN = 4096


def geo_knn_join(ds, query_ids, query_lons, query_lats, k: int = 8,
                 id_col: str = "page_id", lon_col: str = "lon",
                 lat_col: str = "lat"):
    """k nearest rows per query point: (query_id, id, rank, d2).

    rank is 1-based by (d2 asc, id asc).  Null-coordinate rows are skipped.
    """
    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    qid = np.asarray(query_ids, dtype=np.int64)
    qlon = np.asarray(query_lons, dtype=np.int64)
    qlat = np.asarray(query_lats, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        lon, lat, valid = _valid_coords(batch, lon_col, lat_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[valid]
        if not len(ids) or not len(qid):  # np.stack([]) would raise
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                    "d2": pa.array([], type=pa.int64()),
                }
            )
        d2 = _d2(lon, lat, qlon, qlat)
        kk = min(k, d2.shape[1])
        # per-query partial top-k by the FULL (d2, id) order: selecting by
        # d2 alone could evict the smaller-id row of a tie at the k-th
        # boundary, changing top-k MEMBERSHIP vs the oracle (the final
        # pass can only re-rank survivors).  Queries are few by contract,
        # so a lexsort per query is fine.
        part = np.stack([
            np.lexsort((ids, d2[j]))[:kk] for j in range(d2.shape[0])
        ])
        rows = np.repeat(qid, kk)
        cols = part.ravel()
        return pa.table(
            {
                "query_id": pa.array(rows, type=pa.int64()),
                id_col: pa.array(ids[cols], type=pa.int64()),
                "d2": pa.array(np.take_along_axis(d2, part, axis=1).ravel(),
                               type=pa.int64()),
            }
        )

    nparts = max(1, min(default_partitions(), len(qid)))
    part = ds.map_batches(partial, batch_format="pyarrow").repartition(
        nparts, keys=["query_id"]
    )

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                    "d2": pa.array([], type=pa.int64()),
                }
            )
        df = df.sort_values(["query_id", "d2", id_col])
        df = df.groupby("query_id", as_index=False).head(k).copy()
        df["rank"] = df.groupby("query_id").cumcount() + 1
        return from_pandas_clean(df[["query_id", id_col, "rank", "d2"]])

    from oma_ray.stages.dedup import _schema_anchor

    return _schema_anchor(
        part.map_batches(final, batch_format="pyarrow"),
        pa.table(
            {"query_id": pa.array([], type=pa.int64()),
             id_col: pa.array([], type=pa.int64()),
             "rank": pa.array([], type=pa.int64()),
             "d2": pa.array([], type=pa.int64())}
        ),
    )


class NearestIndex:
    """Grid index for exact nearest-point lookup over a LARGE point set:
    points bucketed by cell (width ``cell``), queries probe the
    (2k+1)×(2k+1) block of cells at growing k and stop once the best
    quantized d2 is STRICTLY below ((k·cell)//100)² — any point in an
    unexplored cell is ≥ that bound away, so the minimum (and its
    min-id tie-break) is exact.  Queries unresolved after ``max_ring``
    rounds (deep-empty regions) fall back to the dense kernel — bounded
    by the leftover count, never the batch."""

    def __init__(self, points_or_ref, cell: int | None = None,
                 point_id_col: str = "station_id"):
        import math

        import ray

        points = (
            ray.get(points_or_ref)
            if isinstance(points_or_ref, ray.ObjectRef) else points_or_ref
        )
        p_id = np.asarray(points[point_id_col], dtype=np.int64)
        order = np.argsort(p_id, kind="stable")
        self.p_id = p_id[order]
        self.p_lon = np.asarray(points["lon"], dtype=np.int64)[order]
        self.p_lat = np.asarray(points["lat"], dtype=np.int64)[order]
        n = max(1, len(self.p_id))
        # ~4 points per cell for a uniform set: probes usually stop at k≤1
        self.R = cell if cell is not None else max(
            100, 3_600_000_000 // max(1, math.isqrt(n) // 2)
        )
        self.ncols = 3_600_000_001 // self.R + 2
        key = self._cell(self.p_lon, self.p_lat)
        o2 = np.argsort(key, kind="stable")
        self._key = key[o2]
        self._row = o2

    def _cell(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        return ((lat + 1_800_000_000) // self.R) * self.ncols + (
            (lon + 1_800_000_000) // self.R
        )

    def nearest(self, lon: np.ndarray, lat: np.ndarray, max_ring: int = 8):
        """(best_point_row, best_d2, unresolved_query_idx).  Ties break to
        the smaller point id (rows are stored in id order and candidate
        selection prefers the lower row on equal d2)."""
        n = len(lon)
        best_d2 = np.full(n, 1 << 62, dtype=np.int64)
        best_row = np.full(n, -1, dtype=np.int64)
        if n == 0 or len(self.p_id) == 0:
            return best_row, best_d2, np.arange(n, dtype=np.int64)
        base_r = (lat + 1_800_000_000) // self.R
        base_c = (lon + 1_800_000_000) // self.R
        unresolved = np.arange(n, dtype=np.int64)
        k = 0
        while len(unresolved) and k <= max_ring:
            lon_u, lat_u = lon[unresolved], lat[unresolved]
            for dr in range(-k, k + 1):
                for dc in range(-k, k + 1):
                    if k and max(abs(dr), abs(dc)) != k:
                        continue  # inner block already probed at k-1
                    cell = (base_r[unresolved] + dr) * self.ncols + (
                        base_c[unresolved] + dc
                    )
                    qi, pos = _expand_sorted_hits(self._key, cell)
                    if not len(qi):
                        continue
                    pi = self._row[pos]
                    dlon = np.abs(lon_u[qi] - self.p_lon[pi]) // 100
                    dlat = np.abs(lat_u[qi] - self.p_lat[pi]) // 100
                    d2 = dlon * dlon + dlat * dlat
                    # per-query min with min-row tie-break, then fold into
                    # the running best (also min-row on ties)
                    g = unresolved[qi]
                    order = np.lexsort((pi, d2, g))
                    gs, d2s, pis = g[order], d2[order], pi[order]
                    first = np.ones(len(gs), dtype=bool)
                    first[1:] = gs[1:] != gs[:-1]
                    gs, d2s, pis = gs[first], d2s[first], pis[first]
                    better = (d2s < best_d2[gs]) | (
                        (d2s == best_d2[gs]) & (pis < best_row[gs])
                    )
                    best_d2[gs[better]] = d2s[better]
                    best_row[gs[better]] = pis[better]
            stop_bound = ((k * self.R) // 100) ** 2
            done = best_d2[unresolved] < stop_bound if k else np.zeros(
                len(unresolved), dtype=bool
            )
            unresolved = unresolved[~done]
            k += 1
        return best_row, best_d2, unresolved


def nearest_point_join(ds, points: dict, id_col: str = "page_id",
                       lon_col: str = "lon", lat_col: str = "lat",
                       point_id_col: str = "station_id",
                       index_min_points: int = BOX_INDEX_MIN,
                       index_cell: int | None = None):
    """Nearest broadcast point per row: (id, point_id, d2) — no shuffle.

    ``points`` holds parallel arrays ``{point_id_col, lon, lat}``; ties
    break toward the smaller point id (the arrays are scanned in id order
    and argmin keeps the first minimum).  Above ``index_min_points`` the
    dense |points|×|batch| matrix swaps for a per-worker ``NearestIndex``
    ring search (exact, same tie-break; dense fallback for queries in
    deep-empty regions) — forced-threshold parity test.
    """
    if len(np.asarray(points[point_id_col])) >= index_min_points:
        return _nearest_point_join_indexed(
            ds, points, id_col, lon_col, lat_col, point_id_col,
            index_cell,
        )
    p_id = np.asarray(points[point_id_col], dtype=np.int64)
    order = np.argsort(p_id, kind="stable")
    p_id = p_id[order]
    p_lon = np.asarray(points["lon"], dtype=np.int64)[order]
    p_lat = np.asarray(points["lat"], dtype=np.int64)[order]

    def fn(batch: pa.Table) -> pa.Table:
        lon, lat, valid = _valid_coords(batch, lon_col, lat_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[valid]
        if not len(ids):
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    point_id_col: pa.array([], type=pa.int64()),
                    "d2": pa.array([], type=pa.int64()),
                }
            )
        d2 = _d2(lon, lat, p_lon, p_lat)  # |points| × |batch|
        best = np.argmin(d2, axis=0)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                point_id_col: pa.array(p_id[best], type=pa.int64()),
                "d2": pa.array(d2[best, np.arange(len(ids))], type=pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _nearest_point_join_indexed(ds, points: dict, id_col: str, lon_col: str,
                                lat_col: str, point_id_col: str,
                                index_cell: int | None = None):
    """Indexed regime of nearest_point_join: ring search per worker, dense
    fallback only for ring-exhausted queries.  ``index_cell`` overrides the
    density-derived cell width (tests force a tiny cell to exercise the
    fallback branch)."""
    import ray

    from oma_ray.stages.taskcache import CachedStage

    pref = ray.put(points)

    class NearestFn:
        def __init__(self, ref):
            self.idx = NearestIndex(ref, cell=index_cell,
                                    point_id_col=point_id_col)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lon, lat, valid = _valid_coords(batch, lon_col, lat_col)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)[valid]
            if not len(ids):
                return pa.table(
                    {
                        id_col: pa.array([], type=pa.int64()),
                        point_id_col: pa.array([], type=pa.int64()),
                        "d2": pa.array([], type=pa.int64()),
                    }
                )
            row, d2, leftover = self.idx.nearest(lon, lat)
            if len(leftover):  # deep-empty regions: exact dense, bounded
                sub = _d2(lon[leftover], lat[leftover],
                          self.idx.p_lon, self.idx.p_lat)
                b = np.argmin(sub, axis=0)
                row[leftover] = b
                d2[leftover] = sub[b, np.arange(len(leftover))]
            return pa.table(
                {
                    id_col: pa.array(ids, type=pa.int64()),
                    point_id_col: pa.array(self.idx.p_id[row], type=pa.int64()),
                    "d2": pa.array(d2, type=pa.int64()),
                }
            )

    return ds.map_batches(CachedStage(NearestFn, pref), batch_format="pyarrow")


class BoxIndex:
    """Grid-bucketed rectangle index — the STRtree role, integer-exact.

    Boxes are bucketed under every grid cell their rectangle covers (one
    flat (cell, box) table sorted by cell); a point's candidates are its
    cell's bucket, verified with the exact inclusive-bounds test.  Per
    batch that is O(points × candidates-per-cell) instead of the dense
    O(points × boxes) mask — the scale path for large box sets.  Build it
    once per worker (``CachedStage`` around a ``ray.put`` of the columnar
    dict); lookups are pure numpy."""

    def __init__(self, boxes_or_ref, width: int = 256):
        import ray

        boxes = (
            ray.get(boxes_or_ref)
            if isinstance(boxes_or_ref, ray.ObjectRef) else boxes_or_ref
        )
        self.width = width
        self.box_id = np.asarray(boxes["box_id"], dtype=np.int64)
        self.minlon = np.asarray(boxes["minlon"], dtype=np.int64)
        self.maxlon = np.asarray(boxes["maxlon"], dtype=np.int64)
        self.minlat = np.asarray(boxes["minlat"], dtype=np.int64)
        self.maxlat = np.asarray(boxes["maxlat"], dtype=np.int64)
        cells, idx = _box_cover_cells(
            self.minlon, self.minlat, self.maxlon, self.maxlat, width
        )
        order = np.argsort(cells, kind="stable")
        self._cells = cells[order]
        self._cell_box = idx[order]

    def hits(self, lon: np.ndarray, lat: np.ndarray):
        """(point_idx, box_row_idx) for every inclusive containment pair."""
        if len(lon) == 0 or len(self._cells) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z
        row, col = grid_rowcol(lon, lat, self.width)
        cell = np.clip(row, 0, self.width - 1) * self.width + np.clip(
            col, 0, self.width - 1
        )
        pi, pos = _expand_sorted_hits(self._cells, cell)
        if not len(pi):
            z = np.zeros(0, dtype=np.int64)
            return z, z
        bi = self._cell_box[pos]
        ok = (
            (lon[pi] >= self.minlon[bi]) & (lon[pi] <= self.maxlon[bi])
            & (lat[pi] >= self.minlat[bi]) & (lat[pi] <= self.maxlat[bi])
        )
        return pi[ok], bi[ok]


def box_count_join(ds, boxes: dict, lon_col: str = "lon",
                   lat_col: str = "lat",
                   index_min_boxes: int = BOX_INDEX_MIN):
    """Points ⋈ broadcast boxes (inclusive bounds, OVERLAP semantics) →
    (box_id, n_pages) for boxes with ≥1 hit.

    Below ``index_min_boxes`` the kernel is the dense mask matrix
    (|boxes| × |batch| booleans — the fastest shape for small box sets);
    above it, a per-worker ``BoxIndex`` (grid-bucketed interval index,
    built once per worker through the task cache) prunes candidates by
    cell so per-batch work is O(points × candidates-per-cell).  Both
    regimes emit identical partials (forced-threshold parity test).
    """
    n_boxes = len(np.asarray(boxes["box_id"]))
    if n_boxes >= index_min_boxes:
        return _box_count_join_indexed(ds, boxes, lon_col, lat_col)
    minlon = np.asarray(boxes["minlon"], dtype=np.int64)[:, None]
    maxlon = np.asarray(boxes["maxlon"], dtype=np.int64)[:, None]
    minlat = np.asarray(boxes["minlat"], dtype=np.int64)[:, None]
    maxlat = np.asarray(boxes["maxlat"], dtype=np.int64)[:, None]
    box_id = np.asarray(boxes["box_id"], dtype=np.int64)

    def partial(batch: pa.Table) -> pd.DataFrame:
        lon, lat, _ = _valid_coords(batch, lon_col, lat_col)
        hit = (
            (lon[None, :] >= minlon) & (lon[None, :] <= maxlon)
            & (lat[None, :] >= minlat) & (lat[None, :] <= maxlat)
        )
        n = hit.sum(axis=1)
        nz = n > 0
        return pd.DataFrame({"box_id": box_id[nz], "n_pages": n[nz]})

    from oma_ray.pipelines.queries import _grouped_sums

    anchor = pa.table(
        {"box_id": pa.array([], type=pa.int64()),
         "n_pages": pa.array([], type=pa.int64())}
    )
    return _grouped_sums(ds, ["box_id"], partial, ["n_pages"], anchor=anchor)


def _box_count_join_indexed(ds, boxes: dict, lon_col: str, lat_col: str):
    """Indexed regime of box_count_join: one BoxIndex per worker."""
    import ray

    from oma_ray.pipelines.queries import _grouped_sums
    from oma_ray.stages.taskcache import CachedStage

    bref = ray.put(boxes)

    class Partial:
        def __init__(self, ref):
            self.idx = BoxIndex(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            lon, lat, _ = _valid_coords(batch, lon_col, lat_col)
            _, bi = self.idx.hits(lon, lat)
            if not len(bi):
                return pd.DataFrame({"box_id": [], "n_pages": []}).astype(np.int64)
            u, counts = np.unique(bi, return_counts=True)
            return pd.DataFrame(
                {"box_id": self.idx.box_id[u], "n_pages": counts.astype(np.int64)}
            )

    anchor = pa.table(
        {"box_id": pa.array([], type=pa.int64()),
         "n_pages": pa.array([], type=pa.int64())}
    )
    return _grouped_sums(
        ds, ["box_id"], CachedStage(Partial, bref), ["n_pages"], anchor=anchor
    )


def cell_counts(ds, lon_col: str = "lon", lat_col: str = "lat",
                width: int = GRID_W):
    """(cell_id, n_pages) over the fixed-point grid (row-major ids)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        lon, lat, _ = _valid_coords(batch, lon_col, lat_col)
        row, col = grid_rowcol(lon, lat, width)
        return pd.DataFrame(
            {
                "cell_id": row * width + col,
                "n_pages": np.ones(len(row), dtype=np.int64),
            }
        )

    from oma_ray.pipelines.queries import _grouped_sums

    anchor = pa.table(
        {"cell_id": pa.array([], type=pa.int64()),
         "n_pages": pa.array([], type=pa.int64())}
    )
    return _grouped_sums(ds, ["cell_id"], partial, ["n_pages"], anchor=anchor)


def grid_neighborhood(ds, lon_col: str = "lon", lat_col: str = "lat",
                      width: int = GRID_W):
    """3×3 focal sum over occupied grid cells:
    (cell_id, n_pages, neigh_pages) where neigh_pages sums n_pages over
    the cell and its ≤8 in-bounds neighbors.

    Shape: per-cell counts (one exchange on O(cells) rows) → 9-offset
    scatter + second keyed combine → colocated inner join back to the
    occupied-cell counts.  Both exchanges move cell-count rows, not
    points.
    """
    from oma_ray.stages.join import hash_join

    # two consumers (scatter input + join left): materialize so the full
    # input scan and count exchange run once — counts are one row per
    # occupied cell, the small-aggregate case (rollup.py's idiom)
    counts = cell_counts(ds, lon_col, lat_col, width).materialize()

    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

    def scatter(batch: pa.Table) -> pd.DataFrame:
        cell = batch.column("cell_id").to_numpy(zero_copy_only=False)
        n = batch.column("n_pages").to_numpy(zero_copy_only=False)
        row, col = cell // width, cell % width
        frames = []
        for dy, dx in offsets:
            r, c = row + dy, col + dx
            ok = (r >= 0) & (r < width) & (c >= 0) & (c < width)
            frames.append(
                pd.DataFrame({"cell_id": r[ok] * width + c[ok], "neigh_pages": n[ok]})
            )
        df = pd.concat(frames, ignore_index=True)
        return df.groupby("cell_id", as_index=False)["neigh_pages"].sum()

    from oma_ray.pipelines.queries import _grouped_sums as _gs  # combine shape

    neigh = _gs(
        counts, ["cell_id"], scatter, ["neigh_pages"],
        anchor=pa.table(
            {"cell_id": pa.array([], type=pa.int64()),
             "neigh_pages": pa.array([], type=pa.int64())}
        ),
    )
    from oma_ray.stages.dedup import _schema_anchor

    return _schema_anchor(
        hash_join(
            counts, neigh, on="cell_id",
            left_schema=pa.schema(
                [("cell_id", pa.int64()), ("n_pages", pa.int64())]
            ),
            right_schema=pa.schema(
                [("cell_id", pa.int64()), ("neigh_pages", pa.int64())]
            ),
        ),
        pa.table(
            {"cell_id": pa.array([], type=pa.int64()),
             "n_pages": pa.array([], type=pa.int64()),
             "neigh_pages": pa.array([], type=pa.int64())}
        ),
    )


def tile_pyramid(ds, widths: tuple[int, ...] = (8192, 1024, 128),
                 lon_col: str = "lon", lat_col: str = "lat"):
    """Multi-resolution counts in one pass: (level, cell_id, n_pages) for
    level i over a widths[i]-wide grid.  ``floor(x*W/D)`` at each W is
    computed directly (identical to dividing the finest grid down, since
    floor(floor(a/b)/c) == floor(a/(bc)) for positive ints)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        lon, lat, _ = _valid_coords(batch, lon_col, lat_col)
        frames = []
        for lvl, w in enumerate(widths):
            row, col = grid_rowcol(lat=lat, lon=lon, width=w)
            frames.append(
                pd.DataFrame(
                    {
                        "level": np.full(len(row), lvl, dtype=np.int64),
                        "cell_id": row * w + col,
                        "n_pages": np.ones(len(row), dtype=np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    from oma_ray.pipelines.queries import _grouped_sums

    anchor = pa.table(
        {"level": pa.array([], type=pa.int64()),
         "cell_id": pa.array([], type=pa.int64()),
         "n_pages": pa.array([], type=pa.int64())}
    )
    return _grouped_sums(ds, ["level", "cell_id"], partial, ["n_pages"],
                         anchor=anchor)


def box_anti_join(ds, boxes: dict, id_col: str = "page_id",
                  lon_col: str = "lon", lat_col: str = "lat",
                  index_min_boxes: int = BOX_INDEX_MIN):
    """Spatial anti-join: ids of rows whose point hits NO broadcast box —
    a pure per-batch filter (no shuffle), the complement of box_count_join.
    Same two regimes: dense mask below ``index_min_boxes``, per-worker
    ``BoxIndex`` above (parity-tested at a forced threshold)."""
    if len(np.asarray(boxes["box_id"])) >= index_min_boxes:
        import ray

        from oma_ray.stages.taskcache import CachedStage

        bref = ray.put(boxes)

        class AntiFn:
            def __init__(self, ref):
                self.idx = BoxIndex(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                lon, lat, valid = _valid_coords(batch, lon_col, lat_col)
                ids = batch.column(id_col).to_numpy(zero_copy_only=False)[valid]
                pi, _ = self.idx.hits(lon, lat)
                unhit = np.ones(len(ids), dtype=bool)
                unhit[pi] = False
                return pa.table({id_col: pa.array(ids[unhit], type=pa.int64())})

        return ds.map_batches(CachedStage(AntiFn, bref), batch_format="pyarrow")

    minlon = np.asarray(boxes["minlon"], dtype=np.int64)[:, None]
    maxlon = np.asarray(boxes["maxlon"], dtype=np.int64)[:, None]
    minlat = np.asarray(boxes["minlat"], dtype=np.int64)[:, None]
    maxlat = np.asarray(boxes["maxlat"], dtype=np.int64)[:, None]

    def fn(batch: pa.Table) -> pa.Table:
        lon, lat, valid = _valid_coords(batch, lon_col, lat_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[valid]
        hit = (
            (lon[None, :] >= minlon) & (lon[None, :] <= maxlon)
            & (lat[None, :] >= minlat) & (lat[None, :] <= maxlat)
        ).any(axis=0)
        return pa.table({id_col: pa.array(ids[~hit], type=pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


class PointIndex:
    """Radius-scoped grid index over a point set (the DWithin analogue of
    ``BoxIndex``): cells are sized to the coordinate-space radius bound
    R = (isqrt(r2)+1)·100 (safe because d2 uses |Δ|//100 quantization, so
    d2 ≤ r2 ⇒ |Δ| ≤ R on each axis), hence a query point's candidates all
    live in its 3×3 cell neighbourhood — exact superset, verified with the
    exact integer d2.  Build once per worker; lookups are pure numpy."""

    def __init__(self, points_or_ref, r2: int,
                 point_id_col: str = "station_id"):
        import math

        import ray

        points = (
            ray.get(points_or_ref)
            if isinstance(points_or_ref, ray.ObjectRef) else points_or_ref
        )
        self.p_id = np.asarray(points[point_id_col], dtype=np.int64)
        self.p_lon = np.asarray(points["lon"], dtype=np.int64)
        self.p_lat = np.asarray(points["lat"], dtype=np.int64)
        self.r2 = int(r2)
        self.R = (math.isqrt(max(int(r2), 0)) + 1) * 100
        self.ncols = 3_600_000_001 // self.R + 2
        key = self._cell(self.p_lon, self.p_lat)
        order = np.argsort(key, kind="stable")
        self._key = key[order]
        self._row = order

    def _cell(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        r = (lat + 1_800_000_000) // self.R
        c = (lon + 1_800_000_000) // self.R
        return r * self.ncols + c

    def pairs(self, lon: np.ndarray, lat: np.ndarray):
        """(query_idx, point_row_idx, d2) for every pair with d2 ≤ r2."""
        if len(lon) == 0 or len(self.p_id) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z, z
        base = self._cell(lon, lat)
        qi_all, pi_all = [], []
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                cell = base + dr * self.ncols + dc
                qi, pos = _expand_sorted_hits(self._key, cell)
                if not len(qi):
                    continue
                qi_all.append(qi)
                pi_all.append(self._row[pos])
        if not qi_all:
            z = np.zeros(0, dtype=np.int64)
            return z, z, z
        qi = np.concatenate(qi_all)
        pi = np.concatenate(pi_all)
        if self.ncols < 5:
            # world-scale radius (R > ~¼ of the lon extent): distinct
            # (dr,dc) offsets can ALIAS to the same cell key (e.g. ncols=2
            # makes (-1,+1) == (0,-1)), so a pair may be gathered twice —
            # dedupe candidates before the exact filter
            key = qi * np.int64(len(self.p_id)) + pi
            _, first = np.unique(key, return_index=True)
            qi, pi = qi[first], pi[first]
        dlon = np.abs(lon[qi] - self.p_lon[pi]) // 100
        dlat = np.abs(lat[qi] - self.p_lat[pi]) // 100
        d2 = dlon * dlon + dlat * dlat
        ok = d2 <= self.r2
        return qi[ok], pi[ok], d2[ok]


def within_distance_join(ds, points: dict, r2: int,
                         id_col: str = "page_id", lon_col: str = "lon",
                         lat_col: str = "lat",
                         point_id_col: str = "station_id",
                         index_min_points: int = BOX_INDEX_MIN):
    """DWithin join: all (row, point) pairs with d2 ≤ r2.

    Below ``index_min_points``: per-batch distance matrix against the
    broadcast point set (|points| × batch_size — fastest for small sets).
    Above: a per-worker ``PointIndex`` (radius-sized grid, 3×3 probe,
    exact verify) so per-batch work is O(rows × candidates-per-cell).
    Both regimes emit identical pairs (forced-threshold parity test).
    No shuffle either way."""
    if len(np.asarray(points[point_id_col])) >= index_min_points:
        import ray

        from oma_ray.stages.taskcache import CachedStage

        pref = ray.put(points)

        class IndexedFn:
            def __init__(self, ref):
                self.idx = PointIndex(ref, r2, point_id_col)

            def __call__(self, batch: pa.Table) -> pa.Table:
                lon, lat, valid = _valid_coords(batch, lon_col, lat_col)
                ids = batch.column(id_col).to_numpy(zero_copy_only=False)[valid]
                qi, pi, d2 = self.idx.pairs(lon, lat)
                return pa.table(
                    {
                        id_col: pa.array(ids[qi], type=pa.int64()),
                        point_id_col: pa.array(self.idx.p_id[pi], type=pa.int64()),
                        "d2": pa.array(d2, type=pa.int64()),
                    }
                )

        return ds.map_batches(CachedStage(IndexedFn, pref), batch_format="pyarrow")

    p_id = np.asarray(points[point_id_col], dtype=np.int64)
    p_lon = np.asarray(points["lon"], dtype=np.int64)
    p_lat = np.asarray(points["lat"], dtype=np.int64)

    def fn(batch: pa.Table) -> pa.Table:
        lon, lat, valid = _valid_coords(batch, lon_col, lat_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[valid]
        d2 = _d2(lon, lat, p_lon, p_lat)  # |points| × |batch|
        pi, ri = np.nonzero(d2 <= r2)
        return pa.table(
            {
                id_col: pa.array(ids[ri], type=pa.int64()),
                point_id_col: pa.array(p_id[pi], type=pa.int64()),
                "d2": pa.array(d2[pi, ri], type=pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def trajectory_lengths(ds, user_col: str = "user_id", ts_col: str = "ts",
                       order_col: str = "event_id", lon_col: str = "lon",
                       lat_col: str = "lat"):
    """Per-user movement aggregate over an event log: order each user's
    geo events by (ts, order_col) and sum the squared scaled step distances
    between consecutive ones → (user_id, n_hops, sum_step_d2).

    Keyed repartition puts every row of a user in exactly one block
    (sessionize_counts's contract), so per-block diffs == global diffs; the
    per-block pass is one lexsort + vectorized deltas.  Null-coordinate
    events are dropped BEFORE ordering (they are not trajectory fixes).
    """
    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()

    def project(batch: pa.Table) -> pa.Table:
        lon, lat, valid = _valid_coords(batch, lon_col, lat_col)
        return pa.table(
            {
                user_col: pa.array(
                    batch.column(user_col).to_numpy(zero_copy_only=False)[valid]
                ),
                ts_col: batch.column(ts_col).filter(pa.array(valid)),
                order_col: pa.array(
                    batch.column(order_col).to_numpy(zero_copy_only=False)[valid]
                ),
                "t_lon": pa.array(lon),
                "t_lat": pa.array(lat),
            }
        )

    part = ds.map_batches(project, batch_format="pyarrow").repartition(
        default_partitions(), keys=[user_col]
    )

    def block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return pa.table(
                {
                    user_col: pa.array([], type=pa.int64()),
                    "n_hops": pa.array([], type=pa.int64()),
                    "sum_step_d2": pa.array([], type=pa.int64()),
                }
            )
        df = df.sort_values([user_col, ts_col, order_col])
        user = df[user_col].to_numpy()
        lon = df["t_lon"].to_numpy()
        lat = df["t_lat"].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        same[1:] = user[1:] == user[:-1]
        a = np.zeros(len(df), dtype=np.int64)
        b = np.zeros(len(df), dtype=np.int64)
        a[1:] = np.abs(lon[1:] - lon[:-1]) // 100
        b[1:] = np.abs(lat[1:] - lat[:-1]) // 100
        step = np.where(same, a * a + b * b, 0)
        out = pd.DataFrame(
            {
                user_col: user,
                "n_hops": same.astype(np.int64),
                "sum_step_d2": step,
            }
        ).groupby(user_col, as_index=False).sum()
        return from_pandas_clean(out)

    from oma_ray.stages.dedup import _schema_anchor

    return _schema_anchor(
        part.map_batches(block, batch_format="pyarrow"),
        pa.table(
            {user_col: pa.array([], type=pa.int64()),
             "n_hops": pa.array([], type=pa.int64()),
             "sum_step_d2": pa.array([], type=pa.int64())}
        ),
    )


def _box_cover_cells(minlon, minlat, maxlon, maxlat, width: int):
    """Per-box grid-cell cover (row-major ids), vectorized per box set:
    returns (cell_ids, box_row_index) flattened across boxes."""
    rmin, cmin = (np.clip(v, 0, width - 1)
                  for v in grid_rowcol(minlon, minlat, width))
    rmax, cmax = (np.clip(v, 0, width - 1)
                  for v in grid_rowcol(maxlon, maxlat, width))
    cells, idx = [], []
    for i in range(len(minlon)):
        rows = np.arange(rmin[i], rmax[i] + 1, dtype=np.int64)
        cols = np.arange(cmin[i], cmax[i] + 1, dtype=np.int64)
        cc = (rows[:, None] * width + cols[None, :]).ravel()
        cells.append(cc)
        idx.append(np.full(len(cc), i, dtype=np.int64))
    if not cells:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    return np.concatenate(cells), np.concatenate(idx)


def box_overlap_join(a_ds, b_ds, *, width: int = 128,
                     num_partitions: int | None = None,
                     a_id: str = "a_id", b_id: str = "b_id",
                     with_area: bool = False):
    """Distributed interval-overlap join of two RECTANGLE datasets →
    (a_id, b_id) for every overlapping pair (inclusive bounds), each pair
    emitted EXACTLY ONCE.  ``with_area=True`` appends the geometric
    intersection area ``(min(maxlon)-max(minlon)) · (min(maxlat)-
    max(minlat))`` in fixed-point units² (0 for edge-touching pairs) —
    the rectangle OVERLAY join, same exchange, computed block-local from
    coordinates already co-located.

    Scale shape: both sides explode to grid-cell cover rows and co-partition
    by cell through ONE tagged keyed exchange; each block tests only the
    boxes sharing a cell (|A_cell| × |B_cell| vectorized interval masks).
    Duplicate suppression uses the REFERENCE-POINT method (the standard
    spatial-join dedup): a pair may share many cells, but its overlap
    region's min corner ``(max(minlon), max(minlat))`` lies in exactly one
    cell — and that cell is in BOTH covers — so a block emits a pair only
    when it owns that corner.  No second dedup exchange needed.

    Both inputs need columns ``(box_id, minlon, minlat, maxlon, maxlat)``.
    """
    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()

    def pad(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            cols = {
                c: batch.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
                for c in ("box_id", "minlon", "minlat", "maxlon", "maxlat")
            }
            cells, idx = _box_cover_cells(
                cols["minlon"], cols["minlat"], cols["maxlon"], cols["maxlat"],
                width,
            )
            return pa.table(
                {
                    "cell_id": pa.array(cells),
                    "__side": pa.array(np.full(len(cells), side, dtype=np.int8)),
                    **{
                        c: pa.array(cols[c][idx])
                        for c in ("box_id", "minlon", "minlat", "maxlon", "maxlat")
                    },
                }
            )

        return fn

    both = (
        a_ds.map_batches(pad(0), batch_format="pyarrow")
        .union(b_ds.map_batches(pad(1), batch_format="pyarrow"))
        .repartition(num_partitions, keys=["cell_id"])
    )

    def block_join(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = batch.column("__side").to_numpy(zero_copy_only=False)
        cell = batch.column("cell_id").to_numpy(zero_copy_only=False)
        cols = {
            c: batch.column(c).to_numpy(zero_copy_only=False)
            for c in ("box_id", "minlon", "minlat", "maxlon", "maxlat")
        }
        out_a, out_b, out_area = [], [], []
        # a block holds several cells; pairs must be tested per cell so the
        # reference-point ownership check is local to each
        for cc in np.unique(cell):
            am = (side == 0) & (cell == cc)
            bm = (side == 1) & (cell == cc)
            if not am.any() or not bm.any():
                continue
            alo, ahi = cols["minlon"][am][:, None], cols["maxlon"][am][:, None]
            blo, bhi = cols["minlon"][bm][None, :], cols["maxlon"][bm][None, :]
            alat0, alat1 = cols["minlat"][am][:, None], cols["maxlat"][am][:, None]
            blat0, blat1 = cols["minlat"][bm][None, :], cols["maxlat"][bm][None, :]
            hit = (alo <= bhi) & (blo <= ahi) & (alat0 <= blat1) & (blat0 <= alat1)
            if not hit.any():
                continue
            # reference point = overlap region's min corner; own it here?
            ref_lon = np.maximum(alo, blo)
            ref_lat = np.maximum(alat0, blat0)
            rrow, rcol = (np.clip(v, 0, width - 1)
                          for v in grid_rowcol(ref_lon, ref_lat, width))
            hit &= (rrow * width + rcol) == cc
            ai, bi = np.nonzero(hit)
            out_a.append(cols["box_id"][am][ai])
            out_b.append(cols["box_id"][bm][bi])
            if with_area:
                w_ov = (np.minimum(ahi, bhi) - np.maximum(alo, blo))[ai, bi]
                h_ov = (np.minimum(alat1, blat1)
                        - np.maximum(alat0, blat0))[ai, bi]
                out_area.append(w_ov * h_ov)
        empty_cols = {a_id: pa.array([], type=pa.int64()),
                      b_id: pa.array([], type=pa.int64())}
        if with_area:
            empty_cols["area"] = pa.array([], type=pa.int64())
        if not out_a:
            return pa.table(empty_cols)
        full = {
            a_id: pa.array(np.concatenate(out_a), type=pa.int64()),
            b_id: pa.array(np.concatenate(out_b), type=pa.int64()),
        }
        if with_area:
            full["area"] = pa.array(np.concatenate(out_area), type=pa.int64())
        return pa.table(full)

    from oma_ray.stages.dedup import _schema_anchor

    anchor_cols = {a_id: pa.array([], type=pa.int64()),
                   b_id: pa.array([], type=pa.int64())}
    if with_area:
        anchor_cols["area"] = pa.array([], type=pa.int64())
    return _schema_anchor(
        both.map_batches(block_join, batch_format="pyarrow"),
        pa.table(anchor_cols),
    )


class _NeighborExplode:
    """map_batches callable: each valid point → 9 copies keyed by its 3×3
    neighborhood of w-wide cells, home copy flagged.  Shared by the
    self-join and isolate kernels (same co-location argument: every point
    within one cell width of p has a copy in home(p))."""

    def __init__(self, w: int, id_col: str, lon_col: str, lat_col: str,
                 extra_cols: tuple = ()):
        self.w = w
        self.id_col, self.lon_col, self.lat_col = id_col, lon_col, lat_col
        self.extra_cols = extra_cols  # int64/bool passthroughs, tiled 9×

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        off = np.int64(1 << 20)
        valid = ~pc.is_null(batch.column(self.lon_col)).to_numpy(
            zero_copy_only=False)
        t = batch.filter(pa.array(valid))
        ids = t.column(self.id_col).to_numpy(zero_copy_only=False)
        lon = t.column(self.lon_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lat = t.column(self.lat_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cx, cy = lon // self.w, lat // self.w
        n = len(ids)
        dx = np.repeat(np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1],
                                dtype=np.int64), n)
        dy = np.repeat(np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1],
                                dtype=np.int64), n)
        key = ((np.tile(cx, 9) + dx + off) << np.int64(21)) + (
            np.tile(cy, 9) + dy + off)
        cols = {
            "key": pa.array(key),
            "pid": pa.array(np.tile(ids, 9).astype(np.int64)),
            "plon": pa.array(np.tile(lon, 9)),
            "plat": pa.array(np.tile(lat, 9)),
            "home": pa.array((dx == 0) & (dy == 0)),
        }
        for c in self.extra_cols:
            v = t.column(c).to_numpy(zero_copy_only=False)
            cols[c] = pa.array(np.tile(v, 9))
        return pa.table(cols)


def _cell_width(r2: int) -> int:
    import math

    w = 100 * (math.isqrt(int(r2)) + 1)  # cell width ≥ max match distance
    if w < 3600:  # keep packed cell coords inside 2^20
        raise ValueError(f"r2={r2} too small: cell width {w} < 3600")
    return w


def dwithin_self_join(ds, r2: int, id_col: str = "page_id",
                      lon_col: str = "lon", lat_col: str = "lat",
                      partitions: int | None = None):
    """All unordered point pairs with integer distance ``d2 <= r2`` — the
    fact × fact spatial SELF-join (co-located-page discovery), where both
    sides are too big for any broadcast regime.

    Shape: each point replicates to its 3×3 neighborhood of r-sized cells
    (9 copies of a 25-byte (key, id, lon, lat, home) row — page payloads
    never move), then ONE cell-keyed exchange co-locates every candidate
    pair.  Exactly-once emission without a dedup exchange: a pair is
    emitted only in the HOME cell of its min-id endpoint (the two home
    cells are always grid-adjacent, so that cell holds a copy of both).
    Per-cell work is occupancy² — the radius-sized-cell contract shared
    with PointIndex; skewed hot cells are bounded by how many points can
    physically sit within one radius.  d2 is the shared integer metric
    ``(|Δlon|//100)² + (|Δlat|//100)²`` (abs-before-divide).
    """
    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import _schema_anchor, ensure_hash_shuffle

    w = _cell_width(r2)
    empty = pa.table({
        "a_id": pa.array([], pa.int64()),
        "b_id": pa.array([], pa.int64()),
        "d2": pa.array([], pa.int64()),
    })

    explode = _NeighborExplode(w, id_col, lon_col, lat_col)

    def block_pairs(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return empty
        key = batch.column("key").to_numpy(zero_copy_only=False)
        pid = batch.column("pid").to_numpy(zero_copy_only=False)
        lon = batch.column("plon").to_numpy(zero_copy_only=False)
        lat = batch.column("plat").to_numpy(zero_copy_only=False)
        home = batch.column("home").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, pid, lon, lat, home = (a[order] for a in
                                    (key, pid, lon, lat, home))
        bounds = np.flatnonzero(np.diff(key)) + 1
        segs = zip(np.r_[0, bounds], np.r_[bounds, len(key)])
        a_out, b_out, d_out = [], [], []
        for s, e in segs:
            h = np.flatnonzero(home[s:e]) + s
            if not len(h):
                continue
            dlon = np.abs(lon[h, None] - lon[None, s:e]) // 100
            dlat = np.abs(lat[h, None] - lat[None, s:e]) // 100
            d2 = dlon * dlon + dlat * dlat
            m = (d2 <= r2) & (pid[h, None] < pid[None, s:e])
            hi, ai = np.nonzero(m)
            a_out.append(pid[h][hi])
            b_out.append(pid[s:e][ai])
            d_out.append(d2[hi, ai])
        if not a_out:
            return empty
        return pa.table({
            "a_id": pa.array(np.concatenate(a_out)),
            "b_id": pa.array(np.concatenate(b_out)),
            "d2": pa.array(np.concatenate(d_out)),
        })

    ensure_hash_shuffle()
    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .repartition(partitions or default_partitions(), keys=["key"])
        .map_batches(block_pairs, batch_format="pyarrow")
    )
    return _schema_anchor(out, empty)


def dwithin_isolates(ds, r2: int, id_col: str = "page_id",
                     lon_col: str = "lon", lat_col: str = "lat",
                     partitions: int | None = None):
    """Spatial outliers: ids of points with NO other point within ``d2 <=
    r2`` — the complement query of `dwithin_self_join`, answered in the
    SAME single cell-keyed exchange without materializing any pair: every
    point within range of p has a copy in home(p), so p is an isolate iff
    its home copy sees no in-radius other copy in its cell block.  Output
    is one row per isolate (O(points), never O(pairs))."""
    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import _schema_anchor, ensure_hash_shuffle

    w = _cell_width(r2)
    empty = pa.table({id_col: pa.array([], pa.int64())})

    def block_isolates(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return empty
        key = batch.column("key").to_numpy(zero_copy_only=False)
        pid = batch.column("pid").to_numpy(zero_copy_only=False)
        lon = batch.column("plon").to_numpy(zero_copy_only=False)
        lat = batch.column("plat").to_numpy(zero_copy_only=False)
        home = batch.column("home").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, pid, lon, lat, home = (a[order] for a in
                                    (key, pid, lon, lat, home))
        bounds = np.flatnonzero(np.diff(key)) + 1
        out = []
        for s, e in zip(np.r_[0, bounds], np.r_[bounds, len(key)]):
            h = np.flatnonzero(home[s:e]) + s
            if not len(h):
                continue
            dlon = np.abs(lon[h, None] - lon[None, s:e]) // 100
            dlat = np.abs(lat[h, None] - lat[None, s:e]) // 100
            d2 = dlon * dlon + dlat * dlat
            near = (d2 <= r2) & (pid[h, None] != pid[None, s:e])
            out.append(pid[h][~near.any(axis=1)])
        if not out:
            return empty
        return pa.table({id_col: pa.array(np.concatenate(out))})

    ensure_hash_shuffle()
    out = (
        ds.map_batches(_NeighborExplode(w, id_col, lon_col, lat_col),
                       batch_format="pyarrow")
        .repartition(partitions or default_partitions(), keys=["key"])
        .map_batches(block_isolates, batch_format="pyarrow")
    )
    return _schema_anchor(out, empty)


def segment_intersect_join(ds, *, cell: int = 50_000_000,
                           partitions: int | None = None):
    """Distributed segment-intersection self-join: all pairs of segments
    that PROPERLY cross (strict sign-opposed integer orientation tests on
    both sides; collinear/touching pairs excluded — the predicate the SQL
    oracle restates verbatim).

    Scale shape (the q101 pattern lifted from points to extents): each
    segment registers a copy in every grid cell its bbox overlaps, ONE
    cell-keyed exchange co-locates candidates, and per-cell work is
    occupancy-bounded.  Exactly-once emission without a dedup exchange:
    a crossing pair's bbox covers both contain the lexicographically-min
    shared cell ``(max(r0a, r0b), max(c0a, c0b))`` — the pair is emitted
    only there.  Candidate endpoints sharing a cell sit within
    ``2·(cell + seg_len)`` of each other, so int64 cross products are
    exact (callers bound ``seg_len``; synth fixture ≤ 5e7).

    Input columns: ``seg_id, ax, ay, bx, by``; output ``(a_id, b_id)``
    with ``a_id < b_id``.
    """
    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import _schema_anchor, ensure_hash_shuffle

    off = np.int64(4_000_000_000)
    empty = pa.table({"a_id": pa.array([], pa.int64()),
                      "b_id": pa.array([], pa.int64())})

    def explode(batch: pa.Table) -> pa.Table:
        cols = {k: batch.column(k).to_numpy(zero_copy_only=False)
                for k in ("seg_id", "ax", "ay", "bx", "by")}
        minx = np.minimum(cols["ax"], cols["bx"])
        maxx = np.maximum(cols["ax"], cols["bx"])
        miny = np.minimum(cols["ay"], cols["by"])
        maxy = np.maximum(cols["ay"], cols["by"])
        r0, r1 = (miny + off) // cell, (maxy + off) // cell
        c0, c1 = (minx + off) // cell, (maxx + off) // cell
        nrow, ncol = r1 - r0 + 1, c1 - c0 + 1
        n_cells = nrow * ncol
        seg_idx = np.repeat(np.arange(len(n_cells)), n_cells)
        first = np.concatenate([[0], np.cumsum(n_cells)[:-1]])
        within = np.arange(int(n_cells.sum())) - first[seg_idx]
        r = r0[seg_idx] + within // ncol[seg_idx]
        c = c0[seg_idx] + within % ncol[seg_idx]
        return pa.table({
            "key": pa.array(r * np.int64(1 << 20) + c),
            "sid": pa.array(cols["seg_id"][seg_idx]),
            "sax": pa.array(cols["ax"][seg_idx]),
            "say": pa.array(cols["ay"][seg_idx]),
            "sbx": pa.array(cols["bx"][seg_idx]),
            "sby": pa.array(cols["by"][seg_idx]),
            "r0": pa.array(r0[seg_idx]), "c0": pa.array(c0[seg_idx]),
        })

    def block_pairs(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return empty
        arr = {k: batch.column(k).to_numpy(zero_copy_only=False)
               for k in ("key", "sid", "sax", "say", "sbx", "sby",
                         "r0", "c0")}
        order = np.argsort(arr["key"], kind="stable")
        arr = {k: v[order] for k, v in arr.items()}
        key = arr["key"]
        bounds = np.flatnonzero(np.diff(key)) + 1
        out_a, out_b = [], []
        for s, e in zip(np.r_[0, bounds], np.r_[bounds, len(key)]):
            m = e - s
            if m < 2:
                continue
            i, j = np.triu_indices(m, k=1)
            i, j = i + s, j + s
            # exactly-once: emit only in the min shared bbox-cover cell
            rr = np.maximum(arr["r0"][i], arr["r0"][j])
            cc = np.maximum(arr["c0"][i], arr["c0"][j])
            here = (rr * np.int64(1 << 20) + cc) == key[s]
            i, j = i[here], j[here]
            if not len(i):
                continue
            ax, ay = arr["sax"][i], arr["say"][i]
            bx, by = arr["sbx"][i], arr["sby"][i]
            cx, cy = arr["sax"][j], arr["say"][j]
            dx, dy = arr["sbx"][j], arr["sby"][j]
            o1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            o2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
            o3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
            o4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
            cross = (((o1 > 0) != (o2 > 0)) & (o1 != 0) & (o2 != 0)
                     & ((o3 > 0) != (o4 > 0)) & (o3 != 0) & (o4 != 0))
            si, sj = arr["sid"][i][cross], arr["sid"][j][cross]
            out_a.append(np.minimum(si, sj))
            out_b.append(np.maximum(si, sj))
        if not out_a:
            return empty
        return pa.table({"a_id": pa.array(np.concatenate(out_a)),
                         "b_id": pa.array(np.concatenate(out_b))})

    ensure_hash_shuffle()
    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .repartition(partitions or default_partitions(), keys=["key"])
        .map_batches(block_pairs, batch_format="pyarrow")
    )
    return _schema_anchor(out, empty)


def dwithin_degrees(ds, r2: int, id_col: str = "page_id",
                    lon_col: str = "lon", lat_col: str = "lat",
                    partitions: int | None = None):
    """Per-point in-radius degree: ``(id, lon, lat, n_nbrs)`` with n_nbrs
    = count of OTHER points at ``d2 <= r2`` — the density primitive under
    DBSCAN core detection, same single cell-keyed exchange and O(points)
    output as `dwithin_isolates` (coords ride along so downstream phases
    need no re-join against the input)."""
    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import _schema_anchor, ensure_hash_shuffle

    w = _cell_width(r2)
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      lon_col: pa.array([], pa.int64()),
                      lat_col: pa.array([], pa.int64()),
                      "n_nbrs": pa.array([], pa.int64())})

    def block_degrees(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return empty
        key = batch.column("key").to_numpy(zero_copy_only=False)
        pid = batch.column("pid").to_numpy(zero_copy_only=False)
        lon = batch.column("plon").to_numpy(zero_copy_only=False)
        lat = batch.column("plat").to_numpy(zero_copy_only=False)
        home = batch.column("home").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, pid, lon, lat, home = (a[order] for a in
                                    (key, pid, lon, lat, home))
        bounds = np.flatnonzero(np.diff(key)) + 1
        oi, olon, olat, on = [], [], [], []
        for s, e in zip(np.r_[0, bounds], np.r_[bounds, len(key)]):
            h = np.flatnonzero(home[s:e]) + s
            if not len(h):
                continue
            dlon = np.abs(lon[h, None] - lon[None, s:e]) // 100
            dlat = np.abs(lat[h, None] - lat[None, s:e]) // 100
            d2 = dlon * dlon + dlat * dlat
            near = (d2 <= r2) & (pid[h, None] != pid[None, s:e])
            oi.append(pid[h])
            olon.append(lon[h])
            olat.append(lat[h])
            on.append(near.sum(axis=1).astype(np.int64))
        if not oi:
            return empty
        return pa.table({id_col: pa.array(np.concatenate(oi)),
                         lon_col: pa.array(np.concatenate(olon)),
                         lat_col: pa.array(np.concatenate(olat)),
                         "n_nbrs": pa.array(np.concatenate(on))})

    ensure_hash_shuffle()
    out = (
        ds.map_batches(_NeighborExplode(w, id_col, lon_col, lat_col),
                       batch_format="pyarrow")
        .repartition(partitions or default_partitions(), keys=["key"])
        .map_batches(block_degrees, batch_format="pyarrow")
    )
    return _schema_anchor(out, empty)


def dbscan(ds, r2: int, min_pts: int, id_col: str = "page_id",
           lon_col: str = "lon", lat_col: str = "lat",
           partitions: int | None = None):
    """Distributed DBSCAN over the shared integer d2 metric: core points
    have ≥ ``min_pts`` OTHER points within ``r2``; clusters are connected
    components of the core-core in-radius graph (labelled by min member
    core id); border points (non-core with an in-radius core) join the
    cluster of their MINIMUM-id in-radius core (a deterministic variant
    of DBSCAN's arbitrary border attachment); everything else is noise
    and not emitted.

    Scale shape — two cell-keyed exchanges plus the CC fixpoint:
    phase 1 computes degrees (`dwithin_degrees`); phase 2 re-explodes the
    core-tagged points and, in each home cell block, emits core-core
    edges (exactly-once via the min-id-home rule), one self-edge per core
    (so singleton cores become their own component without an anti-join),
    and border attachments (block-local min is the global min: every
    in-radius core has a copy in the border's home cell).  Components run
    in `connected_components` (union-find under the driver gate, min-label
    fixpoint above it); border→component resolution is one colocated
    `hash_join`.  Output: ``(id, comp, is_core)``.
    """
    from oma_ray.cluster import default_partitions
    from oma_ray.stages.cc import connected_components
    from oma_ray.stages.dedup import _schema_anchor, ensure_hash_shuffle
    from oma_ray.stages.join import hash_join

    w = _cell_width(r2)
    parts = partitions or default_partitions()
    deg = dwithin_degrees(ds, r2, id_col, lon_col, lat_col, parts)

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.column("n_nbrs").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "core", pa.array((n >= min_pts).astype(np.int64)))

    tagged = deg.map_batches(tag, batch_format="pyarrow")

    mixed_empty = pa.table({
        "kind": pa.array([], pa.int64()),
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
    })

    def block_emit(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return mixed_empty
        key = batch.column("key").to_numpy(zero_copy_only=False)
        pid = batch.column("pid").to_numpy(zero_copy_only=False)
        lon = batch.column("plon").to_numpy(zero_copy_only=False)
        lat = batch.column("plat").to_numpy(zero_copy_only=False)
        home = batch.column("home").to_numpy(zero_copy_only=False)
        core = batch.column("core").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, pid, lon, lat, home, core = (a[order] for a in
                                          (key, pid, lon, lat, home, core))
        bounds = np.flatnonzero(np.diff(key)) + 1
        kk, aa, bb = [], [], []
        for s, e in zip(np.r_[0, bounds], np.r_[bounds, len(key)]):
            h = np.flatnonzero(home[s:e]) + s
            if not len(h):
                continue
            dlon = np.abs(lon[h, None] - lon[None, s:e]) // 100
            dlat = np.abs(lat[h, None] - lat[None, s:e]) // 100
            near = (dlon * dlon + dlat * dlat <= r2)
            hcore = core[h].astype(bool)
            # core-core edges, exactly-once: min-id endpoint is home here
            m = (near & hcore[:, None] & (core[None, s:e] > 0)
                 & (pid[h, None] < pid[None, s:e]))
            hi, ai = np.nonzero(m)
            kk.append(np.zeros(len(hi), dtype=np.int64))
            aa.append(pid[h][hi])
            bb.append(pid[s:e][ai])
            # one self-edge per home core (singletons become components)
            hc = pid[h][hcore]
            kk.append(np.zeros(len(hc), dtype=np.int64))
            aa.append(hc)
            bb.append(hc)
            # border attachments: home non-core -> min in-radius core id
            bmask = (near & ~hcore[:, None] & (core[None, s:e] > 0)
                     & (pid[h, None] != pid[None, s:e]))
            cand = np.where(bmask, pid[None, s:e],
                            np.iinfo(np.int64).max)
            mc = cand.min(axis=1)
            has = bmask.any(axis=1)
            kk.append(np.ones(int(has.sum()), dtype=np.int64))
            aa.append(pid[h][has])
            bb.append(mc[has])
        if not kk:
            return mixed_empty
        return pa.table({"kind": pa.array(np.concatenate(kk)),
                         "a": pa.array(np.concatenate(aa)),
                         "b": pa.array(np.concatenate(bb))})

    ensure_hash_shuffle()
    mixed = (
        tagged.map_batches(
            _NeighborExplode(w, id_col, lon_col, lat_col,
                             extra_cols=("core",)),
            batch_format="pyarrow")
        .repartition(parts, keys=["key"])
        .map_batches(block_emit, batch_format="pyarrow")
    )
    mixed = _schema_anchor(mixed, mixed_empty).materialize()  # consumed 2×

    import pyarrow.dataset  # noqa: F401  (keep pa fully loaded in workers)

    edges = mixed.filter(expr="kind == 0")
    # map_batches projections, not select/rename: Ray 2.49's rename_columns
    # validates against a schema that can ignore a pending Project after a
    # materialized shuffle with empty blocks
    borders = mixed.filter(expr="kind == 1").map_batches(
        lambda b: pa.table({id_col: b.column("a"), "mc": b.column("b")}),
        batch_format="pyarrow")
    comp = connected_components(edges, "a", "b", num_partitions=parts)

    core_out = comp.map_batches(
        lambda b: pa.table({
            id_col: b.column("node"),
            "comp": b.column("comp"),
            "is_core": pa.array(np.ones(len(b), dtype=np.int64)),
        }), batch_format="pyarrow")

    joined = hash_join(
        borders, comp, on="mc", right_on="node",
        left_schema=pa.schema([(id_col, pa.int64()), ("mc", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()),
                                ("comp", pa.int64())]),
        num_partitions=parts)
    border_out = joined.map_batches(
        lambda b: pa.table({
            id_col: b.column(id_col),
            "comp": b.column("comp"),
            "is_core": pa.array(np.zeros(len(b), dtype=np.int64)),
        }), batch_format="pyarrow")

    out = core_out.union(border_out)
    return _schema_anchor(out, pa.table({
        id_col: pa.array([], pa.int64()),
        "comp": pa.array([], pa.int64()),
        "is_core": pa.array([], pa.int64())}))
