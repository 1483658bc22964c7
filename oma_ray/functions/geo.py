"""Vectorized geometry kernels (numpy, int64 arithmetic).

Semantic-parity notes reference /root/reference/de/kumakyoo/oma/:

- coordinates are fixed-point ``int32 = degrees * 1e7`` quantized with
  ``(int)(0.5 + 1e7 * deg)`` i.e. trunc-toward-zero (OSMXMLReader.java:75-77);
- point-in-polygon is an integer ray cast with Java ``long`` truncating
  division (Point.java:19-36);
- bbox containment is inclusive on all edges (Bounds.java:58-61);
- ring orientation test is the shoelace sum ``Σ (x2-x1)*(y2+y1) >= 0``
  (Area.java:128-135);
- ring closure requires >=3 points and first==last (Way.java:53-56).

All kernels are batch-oriented: they take numpy arrays and are meant to run
inside ``Dataset.map_batches`` bodies. No Python-level per-row loops on the
point axis; loops only over polygon *edges* or candidate polygons (small).
"""

from __future__ import annotations

import numpy as np

from oma_ray import QUANT

__all__ = [
    "quantize",
    "dequantize",
    "trunc_div",
    "points_in_ring",
    "points_in_polygon",
    "is_clockwise",
    "ring_closed",
    "bbox_contains",
    "bbox_intersects",
    "ring_bbox",
    "cell_grid",
    "cell_grid_decode",
    "cell_morton",
    "cell_hex",
    "simplify_ring",
]


def quantize(deg: np.ndarray) -> np.ndarray:
    """Degrees → fixed-point int32, matching ``(int)(0.5+1e7*deg)``.

    Java's ``(int)`` cast truncates toward zero (OSMXMLReader.java:75-77), so
    e.g. -0.00000004° → trunc(0.1) → 0 and -1.0° → trunc(-9999999.5) →
    -9999999.  ``np.trunc`` reproduces that exactly within float64 precision
    (|deg|*1e7 <= 1.8e9 << 2^53).
    """
    deg = np.asarray(deg, dtype=np.float64)
    return np.trunc(0.5 + QUANT * deg).astype(np.int32)


def dequantize(fixed: np.ndarray) -> np.ndarray:
    return np.asarray(fixed, dtype=np.float64) / QUANT


def trunc_div(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """C/Java-style truncating integer division on int64 arrays.

    numpy ``//`` floors; Java ``/`` on longs truncates toward zero
    (load-bearing for ray-cast parity, Point.java:31).
    """
    num = np.asarray(num, dtype=np.int64)
    den = np.asarray(den, dtype=np.int64)
    q = num // den
    r = num - q * den
    return q + ((r != 0) & ((num < 0) != (den < 0)))


def points_in_ring(
    plon: np.ndarray,
    plat: np.ndarray,
    rlon: np.ndarray,
    rlat: np.ndarray,
    *,
    edge_chunk: int = 4096,
) -> np.ndarray:
    """Vectorized integer ray cast of N points against one closed ring.

    Exact parity with Point.inside (Point.java:19-36): iterate edges
    ``(i, i+1)`` of the closed ring, skip horizontal edges, count a crossing
    when ``(y1<=lat) != (lat<y2)`` and the truncated-division x-intersection
    ``x1 + (x2-x1)*(lat-y1)/(y2-y1)`` is strictly left of the point.

    Products fit int64: |x2-x1| <= 3.6e9, |lat-y1| <= 1.8e9 → <= 6.5e18 <
    2^63.  Memory is bounded by chunking the edge axis.
    """
    plon = np.asarray(plon, dtype=np.int64)
    plat = np.asarray(plat, dtype=np.int64)
    rlon = np.asarray(rlon, dtype=np.int64)
    rlat = np.asarray(rlat, dtype=np.int64)
    n_edges = len(rlon) - 1
    if n_edges < 2 or len(plon) == 0:
        return np.zeros(len(plon), dtype=bool)

    crossings = np.zeros(len(plon), dtype=np.int64)
    lat = plat[:, None]
    lon = plon[:, None]
    for s in range(0, n_edges, edge_chunk):
        e = min(s + edge_chunk, n_edges)
        x1, y1 = rlon[s:e], rlat[s:e]
        x2, y2 = rlon[s + 1 : e + 1], rlat[s + 1 : e + 1]
        keep = y1 != y2
        den = np.where(keep, y2 - y1, 1)
        # Point.java:30 skips when (y1<=lat) != (lat<y2); a crossing is
        # counted when the two predicates agree (upward or downward edge)
        cross = (y1 <= lat) == (lat < y2)
        xint = x1 + trunc_div((x2 - x1) * (lat - y1), den)
        crossings += np.count_nonzero(cross & keep & (xint < lon), axis=1)
    return (crossings & 1).astype(bool)


def points_in_polygon(
    plon: np.ndarray,
    plat: np.ndarray,
    outer: tuple[np.ndarray, np.ndarray],
    holes: list[tuple[np.ndarray, np.ndarray]] | None = None,
) -> np.ndarray:
    """Point in (outer ring minus holes).  Holes use the same ray cast."""
    inside = points_in_ring(plon, plat, outer[0], outer[1])
    if holes:
        for hlon, hlat in holes:
            if not inside.any():
                break
            inside &= ~points_in_ring(plon, plat, hlon, hlat)
    return inside


def is_clockwise(rlon: np.ndarray, rlat: np.ndarray) -> bool:
    """Shoelace-sign orientation: ``Σ (x2-x1)*(y2+y1) >= 0`` (Area.java:128-135).

    PARITY QUIRK: the reference computes the per-edge product in 32-bit int
    arithmetic — ``(lon2-lon1)*(lat2+lat1)`` overflows and wraps modulo 2^32
    before being widened into the long accumulator, so for real-world
    coordinates the result is effectively pseudo-random per edge.  We
    replicate the wrap exactly (outer rings are normalized to satisfy this
    predicate, holes to violate it, Area.java:112-126); use
    ``is_clockwise_true`` for mathematically-correct orientation.
    """
    x = np.asarray(rlon, dtype=np.int64).astype(np.int32)
    y = np.asarray(rlat, dtype=np.int64).astype(np.int32)
    with np.errstate(over="ignore"):
        dx = np.subtract(np.roll(x, -1), x)   # int32 wrap, like Java int math
        sy = np.add(np.roll(y, -1), y)
        prod = np.multiply(dx, sy)
    return int(prod.astype(np.int64).sum()) >= 0


def is_clockwise_true(rlon: np.ndarray, rlat: np.ndarray) -> bool:
    """Overflow-free shoelace orientation (the engine's own geometry path)."""
    x = np.asarray(rlon, dtype=np.int64)
    y = np.asarray(rlat, dtype=np.int64)
    x2 = np.roll(x, -1)
    y2 = np.roll(y, -1)
    return int(((x2 - x) * (y2 + y)).sum()) >= 0


def ring_closed(rlon: np.ndarray, rlat: np.ndarray) -> bool:
    """Way.isClosed parity: >=3 points and first==last (Way.java:53-56)."""
    return len(rlon) >= 3 and rlon[0] == rlon[-1] and rlat[0] == rlat[-1]


def bbox_contains(
    minlon: np.ndarray, minlat: np.ndarray, maxlon: np.ndarray, maxlat: np.ndarray,
    lon: np.ndarray, lat: np.ndarray,
) -> np.ndarray:
    """Inclusive bbox containment (Bounds.java:58-61).  Broadcasts."""
    return (lon >= minlon) & (lon <= maxlon) & (lat >= minlat) & (lat <= maxlat)


def bbox_intersects(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Inclusive bbox intersection (Bounds.java:82-85).

    ``a``/``b`` are (..., 4) arrays of (minlon, minlat, maxlon, maxlat).
    """
    a = np.asarray(a)
    b = np.asarray(b)
    return (
        (b[..., 2] >= a[..., 0])
        & (b[..., 0] <= a[..., 2])
        & (b[..., 3] >= a[..., 1])
        & (b[..., 1] <= a[..., 3])
    )


def ring_bbox(rlon: np.ndarray, rlat: np.ndarray) -> tuple[int, int, int, int]:
    return int(np.min(rlon)), int(np.min(rlat)), int(np.max(rlon)), int(np.max(rlat))


# ---------------------------------------------------------------------------
# Cell indexes.
#
# The north star calls for H3 res-7 / S2 level-13 cell ids.  Neither library
# is available in this environment, so the engine ships three deterministic
# pure-numpy schemes with the same *role* (hierarchical, roughly-equal-area at
# fixed resolution, prefix-truncatable) and a pluggable seam — swap in real
# h3/s2 bindings by replacing these functions:
#
# - cell_grid:   row-major equirectangular grid (SQL-expressible — used for
#                the DuckDB-oracle-checked queries)
# - cell_morton: same grid, Z-order (Morton) bit-interleaved id — locality-
#                preserving like S2 level-13 (2^13 cells per axis ≈ 2.6 km at
#                the equator); truncating low bits coarsens the cell.
# - cell_hex:    axial hexagonal grid via cube-coordinate rounding — the
#                H3-res-7-shaped scheme (hex cells, ~1.2 km edge at res 7).
# ---------------------------------------------------------------------------

def cell_grid(lon: np.ndarray, lat: np.ndarray, level: int = 13) -> np.ndarray:
    """Row-major grid cell id: ``y_idx * 2^level + x_idx`` over the world bbox.

    x_idx spans [0, 2^level) over lon ∈ [-180, 180]; same for lat over
    [-90, 90] (so y cells are half the height of x cells' width).  Chosen to
    be trivially expressible in ANSI SQL for oracle checking.
    """
    n = np.int64(1) << level
    lon = np.asarray(lon, dtype=np.int64)
    lat = np.asarray(lat, dtype=np.int64)
    x = np.clip((lon + 1_800_000_000) * n // 3_600_000_001, 0, n - 1)
    y = np.clip((lat + 900_000_000) * n // 1_800_000_001, 0, n - 1)
    return (y * n + x).astype(np.int64)


def cell_grid_decode(cell: np.ndarray, level: int = 13) -> tuple[np.ndarray, np.ndarray]:
    """Cell id → (minlon, minlat, maxlon, maxlat) is derivable; returns (x, y)."""
    n = np.int64(1) << level
    cell = np.asarray(cell, dtype=np.int64)
    return cell % n, cell // n


def _interleave_bits(v: np.ndarray, level: int) -> np.ndarray:
    """Spread the low ``level`` bits of v so bit i lands at position 2i."""
    out = np.zeros_like(v)
    for i in range(level):
        out |= ((v >> i) & 1) << (2 * i)
    return out


def cell_morton(lon: np.ndarray, lat: np.ndarray, level: int = 13) -> np.ndarray:
    """Z-order (Morton) cell id at ``level`` bits per axis (S2-level-13 stand-in).

    Locality preserving: nearby points share id prefixes; ``cell >> 2k``
    coarsens by k levels.  uint64 result.
    """
    x, y = cell_grid_decode(cell_grid(lon, lat, level), level)
    return (
        _interleave_bits(x.astype(np.int64), level)
        | (_interleave_bits(y.astype(np.int64), level) << 1)
    ).astype(np.uint64)


def quadkey(lon: np.ndarray, lat: np.ndarray, level: int = 8) -> np.ndarray:
    """Bing-tile-system-style quadkey strings (public scheme): digit i
    (msb-first) is ``x_bit + 2*y_bit`` at depth i, so a quadkey's PREFIX is
    its ancestor tile — substring = coarsen, LIKE 'qk%' = spatial range.
    Encodes over `cell_grid`'s equirectangular integer grid (no Mercator:
    the formula stays integer-exact and ANSI-SQL-mirrorable with shifts).
    Returns a numpy ``S<level>`` byte-string array (vectorized build: one
    (n, level) digit matrix viewed as fixed-width bytes)."""
    x, y = cell_grid_decode(cell_grid(lon, lat, level), level)
    digits = np.empty((len(x), level), dtype=np.uint8)
    for i in range(level):
        sh = level - 1 - i
        digits[:, i] = (((x >> sh) & 1) + (((y >> sh) & 1) << 1) + 48).astype(
            np.uint8)
    return np.frombuffer(
        np.ascontiguousarray(digits).tobytes(), dtype=f"S{level}")


def hilbert_d(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    """Hilbert-curve index of grid cell (x, y) on a 2^level × 2^level grid.

    The true S2-style space-filling curve (S2 cell ids ARE Hilbert positions
    on each cube face): unlike Morton, EVERY pair of d-consecutive cells is
    grid-adjacent, so a contiguous d-range is a connected region — range
    scans over Hilbert-sorted data touch spatially compact sets.  Public
    algorithm (Wikipedia "Hilbert curve" xy2d), restated in a masked-step
    form so each of the ``level`` iterations reads only bits below the
    current one — which makes it expressible as a chain of SQL CTEs for the
    DuckDB oracle (see queries.py::_hilbert_sql_steps).

    Hierarchical: ``hilbert_d(x >> k, y >> k, level - k) == d >> 2k``
    (the curve is self-similar, property-tested).  Vectorized: ``level``
    numpy passes, no per-row Python.
    """
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    d = np.zeros_like(x)
    for b in range(level - 1, -1, -1):
        rx = (x >> b) & 1
        ry = (y >> b) & 1
        # quadrant order (0,0)→0, (0,1)→1, (1,1)→2, (1,0)→3  == (3*rx)^ry
        d += (np.int64(1) << (2 * b)) * ((3 * rx) ^ ry)
        mask = (np.int64(1) << b) - 1
        xm = x & mask
        ym = y & mask
        swap = ry == 0
        refl = swap & (rx == 1)
        nx = np.where(swap, np.where(refl, mask - ym, ym), xm)
        ny = np.where(swap, np.where(refl, mask - xm, xm), ym)
        x, y = nx, ny
    return d


def cell_hilbert(lon: np.ndarray, lat: np.ndarray, level: int = 13) -> np.ndarray:
    """Hilbert cell id at ``level`` bits per axis over `cell_grid`'s
    equirectangular integer grid — the locality-strongest of the three
    curve options (grid row-major < Morton < Hilbert).  int64 result in
    [0, 4^level)."""
    x, y = cell_grid_decode(cell_grid(lon, lat, level), level)
    return hilbert_d(x, y, level)


def hilbert_ranges(
    x0: int, x1: int, y0: int, y1: int, level: int, *, max_depth: int = 8
) -> np.ndarray:
    """S2-region-coverer-shaped range decomposition: disjoint, sorted,
    merged ``[d_lo, d_hi)`` Hilbert-index ranges covering every level-
    ``level`` cell intersecting the inclusive grid box [x0,x1]×[y0,y1].

    Recursive quadrant descent using the prefix property (a depth-k
    quadrant's cells are exactly the contiguous d-range
    ``[hilbert_d(cx,cy,k) << 2(L-k), +4^(L-k))``, so no curve-rotation
    state needs tracking): fully-inside quadrants emit their whole range,
    disjoint quadrants prune, partial quadrants split until ``max_depth``
    where they emit a superset range — the list stays O(perimeter at
    max_depth), never O(area).  Supersets are safe because callers re-check
    the exact predicate after the prune (index-scan semantics).  Returns an
    (n, 2) int64 array.
    """
    out: list[tuple[int, int]] = []
    shift_full = 2 * level

    def visit(k: int, cx: int, cy: int) -> None:
        sh = level - k
        lo_x, hi_x = cx << sh, ((cx + 1) << sh) - 1
        lo_y, hi_y = cy << sh, ((cy + 1) << sh) - 1
        if hi_x < x0 or lo_x > x1 or hi_y < y0 or lo_y > y1:
            return
        d = int(hilbert_d(np.array([cx]), np.array([cy]), k)[0]) if k else 0
        if (lo_x >= x0 and hi_x <= x1 and lo_y >= y0 and hi_y <= y1) or (
            k >= min(level, max_depth)
        ):
            base = d << (2 * sh)
            out.append((base, base + (1 << (2 * sh))))
            return
        for dy in (0, 1):
            for dx in (0, 1):
                visit(k + 1, cx * 2 + dx, cy * 2 + dy)

    visit(0, 0, 0)
    if not out:
        return np.empty((0, 2), dtype=np.int64)
    out.sort()
    merged = [list(out[0])]
    for lo, hi in out[1:]:
        if lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    assert merged[-1][1] <= 1 << shift_full
    return np.asarray(merged, dtype=np.int64)


def in_ranges(d: np.ndarray, ranges: np.ndarray) -> np.ndarray:
    """Vectorized membership of Hilbert indexes in sorted disjoint
    ``[lo, hi)`` ranges (one searchsorted pass)."""
    if not len(ranges):
        return np.zeros(len(d), dtype=bool)
    idx = np.searchsorted(ranges[:, 0], d, side="right") - 1
    safe = np.maximum(idx, 0)
    return (idx >= 0) & (d < ranges[safe, 1])


_GEOHASH32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", np.uint8)


def geohash(lon: np.ndarray, lat: np.ndarray, precision: int = 6) -> np.ndarray:
    """Geohash strings (public base-32 scheme): bits alternate lon/lat
    msb-first (lon leads), 5 bits per character — so, like the quadkey,
    a geohash's PREFIX is its ancestor cell (substring = coarsen).
    Encoded over the same clipped integer grids as `cell_grid` so every
    bit is ANSI-SQL-mirrorable with shifts.  Vectorized digit-matrix →
    fixed-width byte strings (``S<precision>``); one numpy pass."""
    nbits = 5 * precision
    nx = (nbits + 1) // 2
    ny = nbits // 2
    lon = np.asarray(lon, dtype=np.int64)
    lat = np.asarray(lat, dtype=np.int64)
    x = np.clip((lon + 1_800_000_000) * (np.int64(1) << nx)
                // 3_600_000_001, 0, (1 << nx) - 1)
    y = np.clip((lat + 900_000_000) * (np.int64(1) << ny)
                // 1_800_000_001, 0, (1 << ny) - 1)
    g = np.zeros(len(x), dtype=np.int64)
    for b in range(nbits):
        src = x if b % 2 == 0 else y
        top = (nx if b % 2 == 0 else ny) - 1
        bit = (src >> (top - b // 2)) & 1
        g |= bit << (nbits - 1 - b)
    digits = np.empty((len(x), precision), dtype=np.uint8)
    for j in range(precision):
        digits[:, j] = _GEOHASH32[(g >> (5 * (precision - 1 - j))) & 31]
    return np.frombuffer(
        np.ascontiguousarray(digits).tobytes(), dtype=f"S{precision}")


def cell_hex(lon: np.ndarray, lat: np.ndarray, res: int = 7) -> np.ndarray:
    """Axial hex-grid cell id (H3-res-7 stand-in), vectorized cube rounding.

    Pointy-top hexes in equirectangular lon/lat space with edge size
    ``360° / (7 * 2^res)`` degrees (≈0.4° at res 7 → ~45 km; res is
    pluggable).  Returns uint64 ``(q + 2^31) << 32 | (r + 2^31)``.
    """
    size = 3_600_000_000.0 / (7 * (1 << res))
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    qf = (np.sqrt(3.0) / 3.0 * x - 1.0 / 3.0 * y) / size
    rf = (2.0 / 3.0 * y) / size
    # cube rounding
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    qi = q.astype(np.int64) + (1 << 31)
    ri = r.astype(np.int64) + (1 << 31)
    return ((qi.astype(np.uint64)) << np.uint64(32)) | ri.astype(np.uint64)


def simplify_ring(lon: np.ndarray, lat: np.ndarray, eps: int) -> np.ndarray:
    """Douglas-Peucker polyline/ring simplification in EXACT integer
    arithmetic: keep a vertex iff its perpendicular distance to the current
    chord exceeds ``eps`` fixed-point units (``dist > eps`` ⇔
    ``cross² > eps² · |chord|²`` — no float, no tolerance).

    The per-vertex work is finding the FARTHEST point from the chord, and
    since the chord is constant within a segment, argmax over distance ==
    argmax over |cross| — so when the segment's coordinate spans keep
    ``px·dy`` products inside int64 (sub-chords shrink fast, so almost
    every segment after the first splits qualifies), the scan is pure
    vectorized int64 and only the ONE winning candidate pays an exact
    Python-int threshold comparison.  World-spanning chords (products
    ≥ 2^62) fall back to object-int arrays for the scan too.

    Returns a boolean keep-mask over the input vertices (first and last
    always kept).  Iterative stack, no recursion depth limit.
    """
    lon = np.asarray(lon, dtype=np.int64)
    lat = np.asarray(lat, dtype=np.int64)
    n = len(lon)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    eps2 = int(eps) * int(eps)
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay = int(lon[a]), int(lat[a])
        dx, dy = int(lon[b]) - ax, int(lat[b]) - ay
        seg2 = dx * dx + dy * dy
        idx = np.arange(a + 1, b)
        px = lon[idx] - ax
        py = lat[idx] - ay
        max_p = max(int(np.abs(px).max()), int(np.abs(py).max()), 1)
        max_d = max(abs(dx), abs(dy), 1)
        if seg2 == 0:
            # degenerate chord: fall back to max point-to-point distance
            if max_p < 2**31:  # px² + py² fits int64
                dd = px * px + py * py
                far = int(np.argmax(dd))
                best = int(dd[far])
            else:
                ddo = [int(x) * int(x) + int(y) * int(y)
                       for x, y in zip(px, py)]
                far = int(np.argmax(np.array(ddo, dtype=object)))
                best = ddo[far]
            if best <= eps2:
                continue
            m = idx[far]
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
            continue
        if max_p * max_d < 2**62:  # each product < 2^62, |sum| < 2^63
            cross = np.abs(px * dy - py * dx)
        else:
            cross = np.array(
                [abs(int(x) * dy - int(y) * dx) for x, y in zip(px, py)],
                dtype=object,
            )
        far = int(np.argmax(cross))
        # exact threshold check on the single winner only
        if int(cross[far]) * int(cross[far]) <= eps2 * seg2:
            continue
        m = idx[far]
        keep[m] = True
        stack.append((a, m))
        stack.append((m, b))
    return keep


def radial_simplify(x: np.ndarray, y: np.ndarray, eps2: int) -> np.ndarray:
    """Radial-distance trajectory simplification: keep the first fix and
    every later fix whose squared distance to the LAST KEPT fix is
    ``>= eps2``.  The recurrence is inherently sequential (each decision
    depends on the previous kept fix), so this is the per-trajectory
    kernel run inside a user-keyed ``map_batches`` block — bounded by
    trajectory length, never by table size.

    Returns the kept indices as an int64 array (always starts with 0).
    """
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    kx, ky = int(x[0]), int(y[0])
    kept = [0]
    for i in range(1, len(x)):
        dx, dy = int(x[i]) - kx, int(y[i]) - ky
        if dx * dx + dy * dy >= eps2:
            kept.append(i)
            kx, ky = int(x[i]), int(y[i])
    return np.asarray(kept, dtype=np.int64)


def radial_invariant_ok(x: np.ndarray, y: np.ndarray, kept: np.ndarray,
                        eps2: int) -> bool:
    """Verify the radial-simplification contract over an ACTUAL output:
    the first fix is kept, every consecutive kept pair is >= eps apart,
    and every dropped fix is < eps from its last kept predecessor.  Used
    both by q183's embedded exactness gate (recomputed over the kernel's
    real output, not a bound that holds by construction) and by the
    hypothesis brute test."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    kept = np.asarray(kept, dtype=np.int64)
    if len(kept) == 0 or kept[0] != 0:
        return False
    dx = np.diff(x[kept])
    dy = np.diff(y[kept])
    if ((dx * dx + dy * dy) < eps2).any():
        return False
    # map every fix to its last kept predecessor; dropped ⇒ < eps away
    last = kept[np.searchsorted(kept, np.arange(len(x)), side="right") - 1]
    drop = np.ones(len(x), dtype=bool)
    drop[kept] = False
    ddx = x[drop] - x[last[drop]]
    ddy = y[drop] - y[last[drop]]
    return bool(((ddx * ddx + ddy * ddy) < eps2).all())
