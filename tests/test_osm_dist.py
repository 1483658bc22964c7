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
