"""OSM → tiled/typed entries: the engine's Oma-conformance path.

Logical re-expression of the reference's three stages (Oma.java:43-47) that
produces, for a parsed OSM input, the same multiset of
(chunk_type, chunk_bounds, block_key, slice_value, element) entries as
decoding the reference's .oma output — the differential-test contract
(SURVEY §5).  Byte-level format fidelity is NOT a goal; assignment and
routing fidelity is.

The heavy-data equivalents of each step live elsewhere in the engine
(broadcast joins, BbsGrid.assign_*, classify stages); this module wires the
*semantics* — including the reference's quirks:

- unresolved way-node refs surface as coords 0x7fffffff
  (ChunkGenerator.java:326-327, README.md:35); unresolved restriction
  via-nodes keep their marked-id bytes as garbage coords
  (Reunify.java:433-447 + addRelationWays 'n' branch)
- untagged, unreferenced nodes/ways are dropped (Reunify.java:953,1019)
- relations route by type: multipolygon/boundary → areas,
  restriction/destination_sign → stitched ways, leftover members →
  collections; reverse membership is built from the COLLECTION stream only
  (Reunify.java:283-373,887-930)
- collections and coordinate-less/missing-coord geometries go to the
  chunk-table miss index len(bounds) with NoBounds
  (ChunkGenerator.java:496-498,549-574; Bounds.getNoBounds)
- way/area splitting and classification per stages/classify.py
"""

from __future__ import annotations

import numpy as np

from oma_ray.functions.geo import is_clockwise
from oma_ray.functions.rings import assemble_areas, from_to_ways
from oma_ray.stages.classify import TypeConfig, classify_plain, classify_way_split
from oma_ray.stages.tiles import BbsGrid

MAXC = 0x7FFFFFFF
NO_BOUNDS = (MAXC, MAXC, MAXC, MAXC)
ID_MARKER = 0x7F00000000000000


def _signed32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _marked_point(node_id: int) -> tuple[int, int]:
    """Unresolved via-node: the 8-byte marked id re-read as two ints
    (Reunify.writeNodeLocation + addRelationWays 'n' branch)."""
    v = ID_MARKER + node_id
    return _signed32(v >> 32), _signed32(v)


def _norm_ring(ring: list[tuple], outer: bool) -> tuple:
    """Orientation normalization at final write (Area.java:112-126 via
    writeGeo): outer rings forced to isClockWise (shoelace sum>=0), holes to
    the opposite.  Operates on the OPEN ring (wraparound shoelace)."""
    lon = np.array([p[0] for p in ring], dtype=np.int64)
    lat = np.array([p[1] for p in ring], dtype=np.int64)
    cw = is_clockwise(lon, lat)
    if outer != cw:
        ring = list(reversed(ring))
    return tuple(ring)


def _meta_sig(meta: dict, preserve: set, force_id: bool = False) -> tuple:
    return (
        meta["id"] if ("id" in preserve or force_id) else 0,
        meta["version"] if "version" in preserve else 0,
        meta["timestamp"] if "timestamp" in preserve else 0,
        meta["changeset"] if "changeset" in preserve else 0,
        meta["uid"] if "user" in preserve else 0,
        meta["user"] if "user" in preserve else "",
    )


def convert_osm(
    nodes: list[dict],
    ways: list[dict],
    rels: list[dict],
    bbs_text: str,
    cfg: TypeConfig,
    *,
    preserve: set | None = None,
    one_element: bool = False,
) -> list[tuple]:
    """→ multiset (list) of entry signatures:
    (chunk_type, bounds, key, value, meta_sig, tags_frozenset,
    members_frozenset, geo).
    """
    from oma_ray.synth import parse_bbs

    preserve = preserve if preserve is not None else {"id", "version", "timestamp", "changeset", "user"}

    # --- stage 1: reunify ---------------------------------------------------
    node_loc = {n["id"]: (n["lon"], n["lat"]) for n in nodes}
    if nodes:
        lons = [n["lon"] for n in nodes]
        lats = [n["lat"] for n in nodes]
        global_bbox = (min(lons), min(lats), max(lons), max(lats))
    else:
        global_bbox = (-1_800_000_000, -900_000_000, 1_800_000_000, 900_000_000)

    way_geo = {}
    for w in ways:
        way_geo[w["id"]] = [node_loc.get(r, (MAXC, MAXC)) for r in w["refs"]]

    area_rels, way_rels, collections = [], [], []
    for r in rels:
        rtype = r["tags"].get("type")
        consumed = set()
        if rtype in ("multipolygon", "boundary"):
            frags = []
            for i, (mtype, ref, role) in enumerate(r["members"]):
                if mtype == "way" and role in ("outer", "inner"):
                    consumed.add(i)
                    if ref in way_geo:
                        frags.append((role, way_geo[ref]))
            area_rels.append((r, frags))
        if rtype in ("restriction", "destination_sign"):
            ffrom, fvia, fto = [], [], []
            for i, (mtype, ref, role) in enumerate(r["members"]):
                if mtype == "way" and role in ("from", "to", "via", "intersection"):
                    consumed.add(i)
                    if ref in way_geo:
                        g = list(way_geo[ref])
                        (ffrom if role == "from" else fto if role == "to" else fvia).append(g)
                elif mtype == "node" and role in ("via", "intersection"):
                    consumed.add(i)
                    fvia.append([node_loc.get(ref, _marked_point(ref))])
            way_rels.append((r, ffrom, fvia, fto))
        leftover = [
            (mtype, ref, role)
            for i, (mtype, ref, role) in enumerate(r["members"])
            if i not in consumed
        ]
        if leftover:
            collections.append((r, leftover))

    # reverse membership from the collection stream (member idx = position in
    # the collection's leftover list)
    members_map: dict[str, dict[int, list]] = {"n": {}, "w": {}, "r": {}}
    for r, leftover in collections:
        for i, (mtype, ref, role) in enumerate(leftover):
            members_map[mtype[0]].setdefault(ref, []).append((r["id"], role, i))

    grid = BbsGrid(parse_bbs(bbs_text, global_bbox))
    boxes = [tuple(b) for b in grid.boxes]
    miss = len(boxes)

    def tile_of_points(pts: list[tuple]) -> int:
        lon = np.array([p[0] for p in pts], dtype=np.int64)
        lat = np.array([p[1] for p in pts], dtype=np.int64)
        return int(
            grid.assign_bboxes(
                np.array([lon.min()]), np.array([lat.min()]),
                np.array([lon.max()]), np.array([lat.max()]),
            )[0]
        )

    def bounds_of(tile: int) -> tuple:
        return boxes[tile] if tile < miss else NO_BOUNDS

    entries: list[tuple] = []

    def emit(chunk_type, tile, assignments, meta_sig, tags, members, geo):
        for key, value in assignments:
            entries.append(
                (chunk_type, bounds_of(tile), key, value, meta_sig,
                 frozenset(tags.items()), frozenset(members), geo)
            )

    # --- nodes --------------------------------------------------------------
    for n in nodes:
        mlist = members_map["n"].get(n["id"])
        if not n["tags"] and mlist is None:
            continue  # Reunify.java:953
        tile = tile_of_points([(n["lon"], n["lat"])])
        final_tags, assigns = classify_plain(cfg, "N", n["tags"], one_element)
        emit("N", tile, assigns, _meta_sig(n, preserve), final_tags,
             mlist or [], (n["lon"], n["lat"]))

    # --- ways (incl. split/area semantics) ----------------------------------
    def emit_way_family(meta_sig, tags, members, coords):
        """One resolved way through the W-chunk split machinery."""
        tile = tile_of_points(coords)
        closed = len(coords) >= 3 and coords[0] == coords[-1]
        final_tags, area_assigns, split_tags = classify_way_split(
            cfg, tags, closed, one_element
        )
        if area_assigns:
            geo = (_norm_ring(list(coords[:-1]), outer=True), ())
            emit("A", tile, [(k, v) for _t, k, v in area_assigns], meta_sig,
                 final_tags, members, geo)
        if split_tags is not None:
            ftags, assigns = classify_plain(cfg, "W", split_tags, one_element)
            emit("W", tile, assigns, meta_sig, ftags, members, tuple(coords))

    for w in ways:
        mlist = members_map["w"].get(w["id"])
        if not w["tags"] and mlist is None:
            continue  # Reunify.java:1019
        emit_way_family(
            _meta_sig(w, preserve), w["tags"], mlist or [],
            [node_loc.get(r, (MAXC, MAXC)) for r in w["refs"]],
        )

    # --- restriction ways ---------------------------------------------------
    for r, ffrom, fvia, fto in way_rels:
        mlist = members_map["r"].get(r["id"], [])
        for way_pts in from_to_ways(ffrom, fvia, fto):
            emit_way_family(_meta_sig(r, preserve), r["tags"], mlist, way_pts)

    # --- multipolygon / boundary areas --------------------------------------
    for r, frags in area_rels:
        mlist = members_map["r"].get(r["id"], [])
        outer = [list(g) for role, g in frags if role == "outer"]
        inner = [list(g) for role, g in frags if role == "inner"]
        for ring, holes in assemble_areas(outer, inner):
            open_outer = ring[:-1]
            open_holes = [h[:-1] for h in holes]
            pts = list(open_outer) + [p for h in open_holes for p in h]
            # stage-2 patches marked coords to MAX before containment; our
            # coords are already resolved-or-MAX
            tile = tile_of_points(pts)
            geo = (
                _norm_ring(open_outer, outer=True),
                tuple(_norm_ring(h, outer=False) for h in open_holes),
            )
            final_tags, assigns = classify_plain(cfg, "A", r["tags"], one_element)
            emit("A", tile, assigns, _meta_sig(r, preserve), final_tags, mlist, geo)

    # --- collections --------------------------------------------------------
    for r, leftover in collections:
        mlist = members_map["r"].get(r["id"], [])
        final_tags, assigns = classify_plain(cfg, "C", r["tags"], one_element)
        emit("C", miss, assigns, _meta_sig(r, preserve, force_id=True),
             final_tags, mlist, ())

    return entries


def entries_from_oma(path: str, preserve: set | None = None) -> list[tuple]:
    """Decode a reference .oma file into the same signature shape."""
    from oma_ray.sources.oma_file import decode_oma

    out = []
    for e in decode_oma(path):
        out.append(
            (
                e.chunk_type,
                e.bounds,
                e.key,
                e.value,
                (e.id, e.version, e.timestamp, e.changeset, e.uid, e.user),
                frozenset(e.tags.items()),
                frozenset(e.members),
                e.geo,
            )
        )
    return out
