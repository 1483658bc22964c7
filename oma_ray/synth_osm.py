"""Deterministic OSM XML conformance fixture (FIXTURES.md F4).

Hand-crafted to exercise every routing path of the reference conversion:
tagged/untagged/discardable-only nodes, open/closed ways, IS_AREA and
EXCEPTIONS truth-table cases, area=yes overrides, missing node refs,
multipolygons with split outer rings/holes/orphan inners, restrictions with
explicit and inferred vias, destination_sign, boundary, collections and
leftover members, lifecycle-prefixed tags.
"""

import numpy as np


def osm_fixture_xml() -> str:
    def node(i, lon, lat, tags="", meta='version="2" timestamp="2024-03-01T10:00:00Z" changeset="7" uid="42" user="tester"'):
        if tags:
            return f'<node id="{i}" lon="{lon}" lat="{lat}" {meta}>{tags}</node>'
        return f'<node id="{i}" lon="{lon}" lat="{lat}" {meta}/>'

    def tag(k, v):
        return f'<tag k="{k}" v="{v}"/>'

    def way(i, refs, tags=""):
        nds = "".join(f'<nd ref="{r}"/>' for r in refs)
        return (
            f'<way id="{i}" version="1" timestamp="2024-04-02T11:30:00Z" '
            f'changeset="8" uid="43" user="mapper">{nds}{tags}</way>'
        )

    def rel(i, members, tags):
        ms = "".join(
            f'<member type="{t}" ref="{r}" role="{ro}"/>' for t, r, ro in members
        )
        return (
            f'<relation id="{i}" version="3" timestamp="2024-05-03T12:00:00Z" '
            f'changeset="9" uid="44" user="relator">{ms}{tags}</relation>'
        )

    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<osm version="0.6" generator="oma_ray-fixture">',
        '<bounds minlat="51.0" minlon="7.0" maxlat="52.0" maxlon="8.0"/>',
        # --- nodes ---
        node(1, "7.1000001", "51.1000001", tag("highway", "crossing")),
        node(2, "7.11", "51.11"),
        node(3, "7.12", "51.115"),
        node(4, "7.13", "51.12"),
        node(5, "7.14", "51.125"),
        node(6, "7.15", "51.13"),  # untagged, unreferenced → dropped
        node(7, "7.16", "51.135", tag("created_by", "editor")),  # discardable → dropped
        node(8, "7.17", "51.14", tag("abandoned:amenity", "restaurant")),
        node(9, "7.18", "51.145", tag("amenity", "bench") + tag("name", "B")),
        # building square
        node(10, "7.2", "51.2"), node(11, "7.201", "51.2"),
        node(12, "7.201", "51.201"), node(13, "7.2", "51.201"),
        # closed highway triangle
        node(14, "7.3", "51.3"), node(15, "7.302", "51.3"), node(16, "7.301", "51.302"),
        # mp outer ring (two fragments) + hole + orphan inner
        node(20, "7.4", "51.4"), node(21, "7.42", "51.4"), node(22, "7.42", "51.42"),
        node(23, "7.4", "51.42"),
        node(24, "7.405", "51.405"), node(25, "7.415", "51.405"), node(26, "7.41", "51.415"),
        node(27, "7.6", "51.6"), node(28, "7.61", "51.6"), node(29, "7.605", "51.61"),
        # restriction 1
        node(30, "7.5", "51.5"), node(31, "7.51", "51.5"), node(32, "7.51", "51.51"),
        # restriction 2 (via inferred)
        node(33, "7.55", "51.55"), node(34, "7.56", "51.55"), node(35, "7.56", "51.56"),
        # services closed way (EXCEPTIONS → area)
        node(36, "7.7", "51.7"), node(37, "7.702", "51.7"), node(38, "7.701", "51.702"),
        # area=yes unmatched-key square
        node(39, "7.8", "51.8"), node(40, "7.801", "51.8"), node(41, "7.8005", "51.801"),
        # --- ways ---
        way(101, [2, 3, 4, 5], tag("highway", "track")),
        way(102, [10, 11, 12, 13, 10], tag("building", "yes")),
        way(103, [14, 15, 16, 14], tag("highway", "track")),
        way(104, [20, 21, 22]),                      # mp outer fragment 1 (untagged)
        way(105, [22, 23, 20]),                      # mp outer fragment 2
        way(106, [24, 25, 26, 24]),                  # hole ring
        way(107, [27, 28, 29, 27]),                  # orphan inner (outside outer)
        way(108, [30, 31], tag("highway", "residential")),
        way(109, [31, 32], tag("highway", "residential")),
        way(110, [33, 34], tag("highway", "service")),
        way(111, [34, 35], tag("highway", "service")),
        way(112, [1, 999], tag("highway", "path")),  # missing node ref
        way(113, [36, 37, 38, 36], tag("highway", "services")),
        way(114, [39, 40, 41, 39], tag("area", "yes") + tag("foo", "bar")),
        way(115, [8, 9], tag("abandoned:highway", "track") + tag("name", "old")),
        # --- relations ---
        rel(
            201,
            [
                ("way", 104, "outer"), ("way", 105, "outer"),
                ("way", 106, "inner"), ("way", 107, "inner"),
                ("node", 9, "label"),
            ],
            tag("type", "multipolygon") + tag("landuse", "forest"),
        ),
        rel(
            202,
            [("way", 108, "from"), ("node", 31, "via"), ("way", 109, "to")],
            tag("type", "restriction") + tag("restriction", "no_left_turn"),
        ),
        rel(
            203,
            [("way", 110, "from"), ("way", 111, "to")],
            tag("type", "restriction") + tag("restriction", "no_u_turn"),
        ),
        rel(
            204,
            [("way", 104, "outer"), ("way", 105, "outer")],
            tag("type", "boundary") + tag("boundary", "administrative"),
        ),
        rel(
            205,
            [("node", 1, ""), ("way", 101, ""), ("relation", 202, "")],
            tag("type", "route") + tag("route", "bus"),
        ),
        rel(
            206,
            [("way", 108, "via"), ("node", 30, "via"), ("way", 109, "to")],
            tag("type", "destination_sign") + tag("destination", "Centrum"),
        ),
        "</osm>",
    ]
    return "\n".join(parts)


def synth_big_osm(n_nodes: int, seed: int = 42):
    """Deterministic extract: a road grid over one 1°×1° area.  Every way
    references existing nodes (plus a few dangling refs for the
    missing-node path); relations mix multipolygons, restrictions and
    route collections."""
    rng = np.random.default_rng(seed)
    lon0, lat0 = 100_000_000, 480_000_000  # 10E 48N
    lons = lon0 + rng.integers(0, 10_000_000, n_nodes)
    lats = lat0 + rng.integers(0, 10_000_000, n_nodes)
    highway = rng.random(n_nodes) < 0.05

    def meta(i):
        return {
            "id": int(i), "version": 1, "timestamp": 1_700_000_000 + int(i) % 1000,
            "changeset": 7, "uid": 1, "user": "stress",
        }

    nodes = []
    for i in range(n_nodes):
        tags = {}
        if highway[i]:
            tags = {"highway": "crossing"}
        nodes.append({**meta(i + 1), "lon": int(lons[i]), "lat": int(lats[i]),
                      "tags": tags})

    n_ways = n_nodes // 5
    ways = []
    for w in range(n_ways):
        k = 2 + int(rng.integers(0, 8))
        refs = (1 + rng.integers(0, n_nodes, k)).tolist()
        if w % 97 == 0:
            refs.append(10_000_000_000 + w)  # dangling ref → MAXC coords
        closed = w % 7 == 0
        if closed:
            refs.append(refs[0])
        tags = (
            {"building": "yes"} if closed and w % 14 == 0
            else {"highway": "residential", "name": f"w{w}"}
        )
        ways.append({**meta(1_000_000 + w), "refs": [int(r) for r in refs],
                     "tags": tags})

    n_rels = max(1, n_nodes // 100)
    rels = []
    for r in range(n_rels):
        kind = r % 3
        if kind == 0:
            members = [
                ("way", int(1_000_000 + (r * 13 + j) % n_ways), "outer")
                for j in range(2)
            ]
            tags = {"type": "multipolygon", "landuse": "forest"}
        elif kind == 1:
            members = [
                ("way", int(1_000_000 + (r * 7) % n_ways), "from"),
                ("node", int(1 + (r * 11) % n_nodes), "via"),
                ("way", int(1_000_000 + (r * 7 + 1) % n_ways), "to"),
            ]
            tags = {"type": "restriction", "restriction": "no_left_turn"}
        else:
            members = [
                ("node", int(1 + (r * 3 + j) % n_nodes), "stop")
                for j in range(3)
            ]
            tags = {"type": "route", "route": "bus"}
        rels.append({**meta(2_000_000 + r), "members": members, "tags": tags})
    return nodes, ways, rels
