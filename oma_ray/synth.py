"""Deterministic synthetic inputs (no external data, no RNG state).

Everything is a pure integer-arithmetic function of a row id, so that

- the numpy page synthesizer (used inside ``map_batches``) and
- the DuckDB oracle SQL in ``__ray_entry__.oracle_sql()``

compute *bit-identical* values independently.  The page table shape follows
BASELINE.json's input_hint: ``(url:string, warc_ts:timestamp, html:binary,
text:string, lang:string)``.  Point distribution mixes uniform-globe with
three hot-spot clusters (~30% of rows) to exercise salted-key skew handling
(FIXTURES.md F1).

The admin-polygon and bbs-grid fixtures mirror FIXTURES.md F2/F3; the bbs
parser implements the reference expansion semantics exactly
(ChunkGenerator.java:68-97): 4-token line = one box, 6-token line = stepped
grid, half-open iteration ``for v=from; v<to; v+=step``, boxes filtered to
those intersecting the global bbox, whole-world catch-all appended last.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from oma_ray import WORLD

# --- canonical geo formulas (mirrored in oracle SQL; keep in sync!) --------
#
# base_lon = ((id * 2654435761) % 3600000000) - 1800000000
# base_lat = ((id * 2246822519) % 1800000000) - 900000000
# hot      = (id % 10) < 3
# hot_ix   = id % 3
# hot centers: 0 → (-739_800_000, 407_500_000)   "nyc"
#              1 → (  -1_200_000, 515_000_000)   "london"
#              2 → (1_397_000_000, 356_900_000)  "tokyo"
# off_lon  = ((id * 1103515245) % 1000000) - 500000   (±0.05°)
# off_lat  = ((id * 1299709)    % 1000000) - 500000
# (Knuth/lcg multipliers so small ids scatter globally; products stay
# within int64 for ids < ~3e9 — plenty for the bench scales here)
# lon      = hot ? center_lon[hot_ix] + off_lon : base_lon
# lat      = hot ? center_lat[hot_ix] + off_lat : base_lat
# has_geo  = (id % 23) != 0
# ts       = epoch 2024-01-01 + (id * 7919) % 63072000 seconds  (2 years)
# n_links  = id % 4; outlink j (1..n_links) → host (id * 48271 + j) % 1000

HOT_LON = np.array([-739_800_000, -1_200_000, 1_397_000_000], dtype=np.int64)
HOT_LAT = np.array([407_500_000, 515_000_000, 356_900_000], dtype=np.int64)
TS_BASE = 1_704_067_200  # 2024-01-01T00:00:00Z epoch seconds


def geo_for_ids(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lon_1e7:int64, lat_1e7:int64, has_geo:bool) for row ids."""
    ids = np.asarray(ids, dtype=np.int64)
    base_lon = ((ids * 2654435761) % 3_600_000_000) - 1_800_000_000
    base_lat = ((ids * 2246822519) % 1_800_000_000) - 900_000_000
    hot = (ids % 10) < 3
    hot_ix = ids % 3
    off_lon = ((ids * 1103515245) % 1_000_000) - 500_000
    off_lat = ((ids * 1299709) % 1_000_000) - 500_000
    lon = np.where(hot, HOT_LON[hot_ix] + off_lon, base_lon)
    lat = np.where(hot, HOT_LAT[hot_ix] + off_lat, base_lat)
    has_geo = (ids % 23) != 0
    return lon, lat, has_geo


# SQL fragments computing the same values from a column `{id}` (DuckDB int64).
SQL_LON = (
    "CASE WHEN ({id}) % 10 < 3 THEN "
    "(CASE ({id}) % 3 WHEN 0 THEN -739800000 WHEN 1 THEN -1200000 "
    "ELSE 1397000000 END) + (({id}) * 1103515245) % 1000000 - 500000 "
    "ELSE (({id}) * 2654435761) % 3600000000 - 1800000000 END"
)
SQL_LAT = (
    "CASE WHEN ({id}) % 10 < 3 THEN "
    "(CASE ({id}) % 3 WHEN 0 THEN 407500000 WHEN 1 THEN 515000000 "
    "ELSE 356900000 END) + (({id}) * 1299709) % 1000000 - 500000 "
    "ELSE (({id}) * 2246822519) % 1800000000 - 900000000 END"
)
SQL_HAS_GEO = "(({id}) % 23) <> 0"


def format_coord(fixed: int) -> str:
    """Fixed-point int → decimal-degree string that the Java-parity quantizer
    maps back to exactly ``fixed``.

    The reference quantizer ``(int)(0.5 + 1e7*deg)`` (OSMXMLReader.java:75-77)
    truncates toward zero, so for negative targets f the parsed value v=1e7*deg
    must land in the open-closed window (f-1.5, f-0.5]; emitting the exact
    decimal for ``f-1`` puts v at f-1 → 0.5+v = f-0.5, safely mid-window under
    float64 parse error.  Non-negative targets round-trip from their exact
    7-decimal representation.
    """
    f = int(fixed)
    if f < 0:
        f -= 1
    sign = "-" if f < 0 else ""
    a = abs(f)
    return f"{sign}{a // 10_000_000}.{a % 10_000_000:07d}"


def synth_pages_batch(batch: pa.Table, *, replicate: int = 1) -> pa.Table:
    """documents batch → pages batch (vectorized; the only Python loop builds
    the html template strings, which is input *synthesis*, not engine code).

    Input columns: doc_id, text, lang.  Output: page_id, url, warc_ts, html,
    text, lang.  ``text`` passes through byte-identical (BASELINE.json
    per-row invariant).  ``replicate`` fans each doc out R times with
    ``page_id = doc_id * R + j`` (bench-scale inputs).
    """
    doc_id = batch.column("doc_id").to_numpy()
    text = batch.column("text")
    lang = batch.column("lang")
    r = int(replicate)
    if r > 1:
        idx = np.repeat(np.arange(len(doc_id)), r)
        page_id = doc_id.repeat(r) * r + np.tile(np.arange(r), len(doc_id))
        text = text.take(pa.array(idx))
        lang = lang.take(pa.array(idx))
    else:
        page_id = doc_id

    import pyarrow.compute as pc

    lon, lat, has_geo = geo_for_ids(page_id)
    ts_us = (TS_BASE + (page_id * 7919) % 63_072_000) * 1_000_000

    def coord_str(fixed: np.ndarray) -> pa.Array:
        # vectorized format_coord (same windowing rule; see its docstring)
        f = np.where(fixed < 0, fixed - 1, fixed)
        a = np.abs(f)
        return pc.binary_join_element_wise(
            pa.array(np.where(f < 0, "-", ""), type=pa.string()),
            pc.cast(pa.array(a // 10_000_000), pa.string()),
            ".",
            pc.utf8_lpad(pc.cast(pa.array(a % 10_000_000), pa.string()), 7, "0"),
            "",
        )

    ids_str = pc.cast(pa.array(page_id), pa.string())
    urls = pc.binary_join_element_wise(
        "https://site",
        pc.cast(pa.array(page_id % 1000), pa.string()),
        ".example/p/", ids_str, "",
    )
    # NB: binary_join_element_wise treats its LAST argument as the separator
    geo_meta = pc.if_else(
        pa.array(has_geo),
        pc.binary_join_element_wise(
            '<meta name="geo.position" content="',
            coord_str(lat), ";", coord_str(lon), '">', "",
        ),
        "",
    )
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    # outlinks (host link graph fixture; mirrored in SQL_Q76/SQL_Q77):
    #   n_links = id % 4;  link j (1-based, j <= n_links) targets host
    #   (id * 48271 + j) % 1000 — same host namespace as `urls` above
    def anchor(j: int) -> pa.Array:
        k = pa.array((page_id * 48271 + j) % 1000)
        a = pc.binary_join_element_wise(
            '<a href="https://site', pc.cast(k, pa.string()),
            '.example/p/x">l</a>', "",
        )
        return pc.if_else(pa.array(page_id % 4 >= j), a, "")

    links = pc.binary_join_element_wise(anchor(1), anchor(2), anchor(3), "")
    html = pc.binary_join_element_wise(
        "<html><head>", geo_meta, "<title>p", ids_str,
        "</title></head><body>", links, text, "</body></html>", "",
    )

    return pa.table(
        {
            "page_id": pa.array(page_id, type=pa.int64()),
            "url": urls,
            "warc_ts": pa.array(ts_us, type=pa.timestamp("us")),
            "html": html.cast(pa.binary()),
            "text": text,
            "lang": lang,
        }
    )


def make_pages_dataset(sf_dir: str, *, replicate: int = 1, parallelism: int | None = None,
                       **read_kwargs):
    """read documents.parquet → synthesize the pages table (lazy Dataset).

    The documents file is small but fans out ``replicate``× into wide rows
    (html), so block structure matters: the read is split into ~2 blocks per
    CPU and the synth batch size is scaled down by the fan-out so one output
    batch stays ~8k pages — otherwise a single-block read makes the whole
    synth one serial task and downstream stages starve.
    """
    import ray

    from oma_ray.sources.parquet import read_parquet_clean

    if parallelism is None:
        try:
            parallelism = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            parallelism = 16
    import os

    path = f"{sf_dir}/documents.parquet"
    if os.path.getsize(path) < 100_000_000:
        # a single small seed file reads as ONE Ray task (seconds of serial
        # time before any fan-out); driver-side read + from_arrow +
        # repartition gets the fan-out started immediately.  Real multi-file
        # inputs take the parallel read_parquet path below.
        import pyarrow.parquet as pqt
        import ray.data as rd

        table = pqt.read_table(path, columns=["doc_id", "text", "lang"])
        ds = rd.from_arrow(table.replace_schema_metadata(None))
        ds = ds.repartition(parallelism)
    else:
        ds = read_parquet_clean(
            path, columns=["doc_id", "text", "lang"],
            override_num_blocks=parallelism, **read_kwargs,
        )
    batch_size = max(32, 8192 // max(1, replicate))
    return ds.map_batches(
        lambda b: synth_pages_batch(b, replicate=replicate),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


# --- bbs grid ---------------------------------------------------------------

def parse_bbs(text: str, global_bbox: tuple[int, int, int, int] = WORLD) -> np.ndarray:
    """Expand a .bbs config into an ordered (N, 4) int64 box array.

    Exact reference semantics (ChunkGenerator.java:68-97): per line, 6 tokens
    = ``lon_from lon_to lon_step lat_from lat_to lat_step`` iterated half-open
    with the given steps; 4 tokens = a single box (step = extent).  Boxes not
    intersecting ``global_bbox`` (inclusive test, Bounds.java:82-85) are
    dropped; a whole-world catch-all is appended last.  Ordering is
    load-bearing: first containing box wins (ChunkGenerator.java:549-556).
    """
    gminlon, gminlat, gmaxlon, gmaxlat = global_bbox
    boxes: list[tuple[int, int, int, int]] = []
    for line in text.splitlines():
        toks = line.split()
        if not toks:
            continue
        if len(toks) == 6:
            lon_from, lon_to, lon_step, lat_from, lat_to, lat_step = map(int, toks)
        else:
            lon_from, lon_to, lat_from, lat_to = map(int, toks)
            lon_step = lon_to - lon_from
            lat_step = lat_to - lat_from
        lon = lon_from
        while lon < lon_to:
            lat = lat_from
            while lat < lat_to:
                b = (lon, lat, lon + lon_step, lat + lat_step)
                if (
                    b[2] >= gminlon and b[0] <= gmaxlon
                    and b[3] >= gminlat and b[1] <= gmaxlat
                ):
                    boxes.append(b)
                lat += lat_step
            lon += lon_step
    boxes.append(WORLD)
    return np.asarray(boxes, dtype=np.int64)


def default_bbs_text() -> str:
    """The reference's default lat-banded grid (default.bbs:1-10), re-stated."""
    return "\n".join(
        [
            "-1800000000 1800000000 10000000 -450000000 450000000 10000000",
            "-1800000000 1800000000 20000000 450000000 600000000 10000000",
            "-1800000000 1800000000 20000000 -600000000 -450000000 10000000",
            "-1800000000 1800000000 30000000 600000000 750000000 10000000",
            "-1800000000 1800000000 30000000 -750000000 -600000000 10000000",
            "-1800000000 1800000000 100000000 750000000 850000000 20000000",
            "-1800000000 1800000000 100000000 -850000000 -750000000 20000000",
            "-1800000000 1800000000 850000000 900000000",
            "-1800000000 1800000000 -900000000 -850000000",
            "-1800000000 1800000000 100000000 -800000000 800000000 100000000",
        ]
    )


# --- admin polygons ---------------------------------------------------------

def synth_admin_polygons(n: int = 200) -> dict[str, list]:
    """Deterministic polygon fixture (FIXTURES.md F2) as plain columns.

    Convex-ish 8-gons on a world-spanning lattice; every 7th polygon gets a
    centered square hole; every 11th polygon is nested inside its
    predecessor (province-inside-country) to exercise first-match.  Also
    three polygons pinned over the hot-spot cluster centers so the spatial
    join sees skew.  Coordinates fixed-point int32-range ints; rings closed
    (first == last).
    """
    admin_id, name = [], []
    ring_lon, ring_lat, holes_lon, holes_lat = [], [], [], []

    def add(pid, cx, cy, radius, label, hole=False):
        angles = np.arange(9) % 8  # 8 vertices + closure
        # deterministic per-vertex radius wobble
        rad = radius * (80 + ((pid * 13 + angles * 7) % 40)) // 100
        th = angles * 2 * np.pi / 8 + pid * 0.1
        lon = (cx + rad * np.cos(th)).astype(np.int64)
        lat = (cy + rad * np.sin(th) // 2).astype(np.int64)
        lon[-1], lat[-1] = lon[0], lat[0]
        lon = np.clip(lon, WORLD[0], WORLD[2])
        lat = np.clip(lat, WORLD[1], WORLD[3])
        admin_id.append(pid)
        name.append(label)
        ring_lon.append(lon.tolist())
        ring_lat.append(lat.tolist())
        if hole:
            h = radius // 5
            hl = [cx - h, cx + h, cx + h, cx - h, cx - h]
            ha = [cy - h // 2, cy - h // 2, cy + h // 2, cy + h // 2, cy - h // 2]
            holes_lon.append([hl])
            holes_lat.append([ha])
        else:
            holes_lon.append([])
            holes_lat.append([])

    pid = 0
    for i, (hx, hy) in enumerate(zip(HOT_LON, HOT_LAT)):
        add(pid, int(hx), int(hy), 600_000, f"hotspot{i}")
        pid += 1
    cols = max(1, int(np.sqrt(max(1, n - 3)) * 2))
    k = 0
    while pid < n:
        cx = -1_700_000_000 + (k % cols) * (3_400_000_000 // cols)
        cy = -800_000_000 + (k // cols) * 97_000_000 % 1_600_000_000
        radius = 40_000_000 + (k * 17) % 30_000_000
        if pid % 11 == 0 and pid > 3:
            # nested: small polygon inside the previous one's center
            prev = ring_lon[-1], ring_lat[-1]
            cx = int(np.mean(prev[0][:-1]))
            cy = int(np.mean(prev[1][:-1]))
            radius //= 4
        add(pid, cx, cy, radius, f"admin{pid}", hole=(pid % 7 == 0))
        pid += 1
        k += 1
    return {
        "admin_id": admin_id,
        "name": name,
        "ring_lon": ring_lon,
        "ring_lat": ring_lat,
        "holes_lon": holes_lon,
        "holes_lat": holes_lat,
    }


# --- SQL-mirrorable point/box fixtures (geo join operators) -----------------
#
# Unlike the admin polygons above (cos/sin rings — PIP is checked by golden
# differentials, not SQL), these fixtures are PURE INTEGER formulas of a
# sequence index so a DuckDB oracle regenerates them bit-identically with
# ``range(n)``.  Every operand is non-negative before ``%``, so numpy,
# Python and DuckDB agree on the remainder.

def synth_stations(n: int = 64) -> dict[str, np.ndarray]:
    """Deterministic "measurement station" points: id, fixed-point lon/lat,
    and an integer observation value."""
    i = np.arange(n, dtype=np.int64)
    return {
        "station_id": i,
        "lon": (i * 2654435761 + 777_777_777) % 3_600_000_000 - 1_800_000_000,
        "lat": (i * 2246822519 + 555_555_555) % 1_800_000_000 - 900_000_000,
        "value": (i * 7919) % 100_000,
    }


def sql_stations_cte(n: int = 64) -> str:
    """DuckDB CTE body computing ``synth_stations(n)`` exactly."""
    return (
        f"SELECT i AS station_id, "
        f"(i * 2654435761 + 777777777) % 3600000000 - 1800000000 AS lon, "
        f"(i * 2246822519 + 555555555) % 1800000000 - 900000000 AS lat, "
        f"(i * 7919) % 100000 AS value FROM range({n}) t(i)"
    )


def synth_boxes(n: int = 64, start: int = 0) -> dict[str, np.ndarray]:
    """Deterministic query boxes (range-join fixture): wide intervals that
    overlap each other, so one point can fall in several boxes.  ``start``
    offsets the index range (disjoint fixture sets from one formula)."""
    i = np.arange(start, start + n, dtype=np.int64)
    cx = (i * 2654435761 + 987_654_321) % 3_400_000_000 - 1_700_000_000
    cy = (i * 2246822519 + 123_456_789) % 1_600_000_000 - 800_000_000
    hw = 30_000_000 + (i * 7_919_333) % 120_000_000
    hh = 15_000_000 + (i * 10_472_941) % 60_000_000
    return {
        "box_id": i,
        "minlon": cx - hw, "maxlon": cx + hw,
        "minlat": cy - hh, "maxlat": cy + hh,
    }


def sql_boxes_cte(n: int = 64, start: int = 0) -> str:
    """DuckDB CTE body computing ``synth_boxes(n, start)`` exactly."""
    return (
        f"SELECT i AS box_id, "
        f"(i * 2654435761 + 987654321) % 3400000000 - 1700000000 - (30000000 + (i * 7919333) % 120000000) AS minlon, "
        f"(i * 2654435761 + 987654321) % 3400000000 - 1700000000 + (30000000 + (i * 7919333) % 120000000) AS maxlon, "
        f"(i * 2246822519 + 123456789) % 1600000000 - 800000000 - (15000000 + (i * 10472941) % 60000000) AS minlat, "
        f"(i * 2246822519 + 123456789) % 1600000000 - 800000000 + (15000000 + (i * 10472941) % 60000000) AS maxlat "
        f"FROM range({start}, {start + n}) t(i)"
    )


def synth_segments(n: int = 256) -> dict[str, np.ndarray]:
    """Deterministic line segments (intersection-join fixture): anchors
    confined to a metro-scale 4e8 × 2e8 window (world-spread anchors from
    one multiplicative-hash lattice never overlap at n=256 — the
    three-distance theorem makes near pairs in x far in y), deltas
    bounded by ±5e7 fixed-point units so orientation cross products stay
    far inside int64 (|Δseg| ≤ 5e7, endpoint spans ≤ 5e8 ⇒ |cross| ≤
    2.5e16 < 2^63)."""
    i = np.arange(n, dtype=np.int64)
    ax = (i * 2654435761 + 111_111_111) % 400_000_000 - 200_000_000
    ay = (i * 2246822519 + 222_222_222) % 200_000_000 - 100_000_000
    return {
        "seg_id": i,
        "ax": ax, "ay": ay,
        "bx": ax + (i * 7_919_333 + 13) % 100_000_001 - 50_000_000,
        "by": ay + (i * 10_472_941 + 7) % 100_000_001 - 50_000_000,
    }


def sql_segments_cte(n: int = 256) -> str:
    """DuckDB CTE body computing ``synth_segments(n)`` exactly."""
    return (
        f"SELECT i AS seg_id, "
        f"(i * 2654435761 + 111111111) % 400000000 - 200000000 AS ax, "
        f"(i * 2246822519 + 222222222) % 200000000 - 100000000 AS ay, "
        f"(i * 2654435761 + 111111111) % 400000000 - 200000000 "
        f"+ (i * 7919333 + 13) % 100000001 - 50000000 AS bx, "
        f"(i * 2246822519 + 222222222) % 200000000 - 100000000 "
        f"+ (i * 10472941 + 7) % 100000001 - 50000000 AS by "
        f"FROM range({n}) t(i)"
    )
