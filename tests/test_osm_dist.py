"""Distributed reunify (pipelines/osm_dist.py) parity: the Dataset-based
J1/J2/J3 path must produce the exact multiset the golden-tested driver-side
``convert_osm`` produces on the conformance fixture (VERDICT r01 next-step
#4: "a test that runs the *distributed* path on the existing golden fixture
and matches the same multiset convert_osm produces")."""

from collections import Counter

from oma_ray.pipelines.osm import convert_osm
from oma_ray.pipelines.osm_dist import convert_osm_distributed
from oma_ray.sources.osm_xml import read_osm_xml
from oma_ray.stages.classify import TypeConfig
from oma_ray.synth import default_bbs_text
from oma_ray.synth_osm import osm_fixture_xml


def test_distributed_matches_driver_path(ray_session):
    nodes, ways, rels = read_osm_xml(osm_fixture_xml())
    cfg = TypeConfig.default()
    ref = Counter(convert_osm(nodes, ways, rels, default_bbs_text(), cfg))
    got = Counter(
        convert_osm_distributed(nodes, ways, rels, default_bbs_text(), cfg)
    )
    assert got == ref


def test_distributed_one_element_mode(ray_session):
    nodes, ways, rels = read_osm_xml(osm_fixture_xml())
    cfg = TypeConfig.default()
    ref = Counter(
        convert_osm(nodes, ways, rels, default_bbs_text(), cfg, one_element=True)
    )
    got = Counter(
        convert_osm_distributed(
            nodes, ways, rels, default_bbs_text(), cfg, one_element=True
        )
    )
    assert got == ref


def test_distributed_membership_join_path(ray_session):
    """Above ``memb_broadcast_max`` the reverse-membership attach switches
    from broadcast to a hash-shuffle join; forcing the threshold to 0 must
    not change the multiset (VERDICT r02 next-step #2: broadcast retained
    only under a size threshold)."""
    nodes, ways, rels = read_osm_xml(osm_fixture_xml())
    cfg = TypeConfig.default()
    ref = Counter(convert_osm(nodes, ways, rels, default_bbs_text(), cfg))
    got = Counter(
        convert_osm_distributed(
            nodes, ways, rels, default_bbs_text(), cfg, memb_broadcast_max=0
        )
    )
    assert got == ref


def test_distributed_node_join_path(ray_session):
    """Above ``node_broadcast_max_bytes`` the J1 coordinate attach switches
    from the fused broadcast-searchsorted stage to the explode →
    hash-join → regroup pipeline; forcing the threshold to 0 must not
    change the multiset (the planet-scale regime, exercised at fixture
    scale)."""
    nodes, ways, rels = read_osm_xml(osm_fixture_xml())
    cfg = TypeConfig.default()
    ref = Counter(convert_osm(nodes, ways, rels, default_bbs_text(), cfg))
    got = Counter(
        convert_osm_distributed(
            nodes, ways, rels, default_bbs_text(), cfg,
            node_broadcast_max_bytes=0,
        )
    )
    assert got == ref


def test_pbf_to_distributed_end_to_end(ray_session, tmp_path):
    """Full scale path: PBF file → blob-parallel decode → distributed
    reunify — matches the driver-side conversion of the same elements."""
    from oma_ray.pipelines.osm_dist import convert_pbf_distributed
    from oma_ray.sources.pbf import write_pbf

    nodes, ways, rels = read_osm_xml(osm_fixture_xml())
    p = str(tmp_path / "f.pbf")
    write_pbf(p, nodes, ways, rels, block_size=7)
    cfg = TypeConfig.default()
    ref = Counter(convert_osm(nodes, ways, rels, default_bbs_text(), cfg))
    got = Counter(convert_pbf_distributed(p, default_bbs_text(), cfg))
    assert got == ref


def test_distributed_degenerate_inputs(ray_session):
    """Empty element classes must flow through every stream: nodes-only
    (no ways/relations), ways-without-relations, and relations whose
    members are all unresolved — the empty-exchange/schema-anchor paths."""
    cfg = TypeConfig.default()
    meta = {"version": 1, "timestamp": 1, "changeset": 1, "uid": 1,
            "user": "u"}
    n1 = {"id": 1, "lon": 100, "lat": 200, "tags": {"highway": "stop"},
          **meta}
    n2 = {"id": 2, "lon": 300, "lat": 400, "tags": {}, **meta}
    w1 = {"id": 10, "refs": [1, 2], "tags": {"highway": "residential"},
          **meta}
    r1 = {"id": 20, "members": [("way", 999, "outer")],
          "tags": {"type": "multipolygon", "landuse": "forest"}, **meta}

    for nodes, ways, rels in (
        ([n1, n2], [], []),          # nodes only
        ([n1, n2], [w1], []),        # no relations at all
        ([], [], []),                # fully empty input
        ([n1], [], [r1]),            # relation with only unresolved members
    ):
        ref = Counter(convert_osm(nodes, ways, rels, default_bbs_text(), cfg))
        got = Counter(
            convert_osm_distributed(nodes, ways, rels, default_bbs_text(), cfg)
        )
        assert got == ref, (len(nodes), len(ways), len(rels))


def test_distributed_full_join_regime(ray_session):
    """Both RAM-threshold regimes forced OFF together (the planet-file
    configuration: membership attach AND node-coordinate attach as
    joins) — the multiset must not change."""
    nodes, ways, rels = read_osm_xml(osm_fixture_xml())
    cfg = TypeConfig.default()
    ref = Counter(convert_osm(nodes, ways, rels, default_bbs_text(), cfg))
    got = Counter(
        convert_osm_distributed(
            nodes, ways, rels, default_bbs_text(), cfg,
            memb_broadcast_max=0, node_broadcast_max_bytes=0,
        )
    )
    assert got == ref
