"""CLI converter parity: same flags, same semantics as the reference jar
(Oma.java:155-268); output containers decode to the jar's golden multisets."""

from collections import Counter

import pytest

from oma_ray.cli import main, parse_preserve
from oma_ray.pipelines.osm import entries_from_oma


def test_cli_default_matches_golden(tmp_path):
    out = str(tmp_path / "o.oma")
    assert main(["-p", "all", "tests/golden/fixture.osm", out]) == 0
    assert Counter(entries_from_oma(out)) == Counter(
        entries_from_oma("tests/golden/default.oma")
    )


def test_cli_one_element_uncompressed(tmp_path):
    out = str(tmp_path / "o.oma")
    assert main(["-p", "all", "-1", "-0", "tests/golden/fixture.osm", out]) == 0
    assert Counter(entries_from_oma(out)) == Counter(
        entries_from_oma("tests/golden/one_element.oma")
    )


def test_cli_pbf_input(tmp_path):
    from oma_ray.sources.osm_xml import read_osm_xml
    from oma_ray.sources.pbf import write_pbf
    from oma_ray.synth_osm import osm_fixture_xml

    nodes, ways, rels = read_osm_xml(osm_fixture_xml())
    pbf = str(tmp_path / "f.pbf")
    write_pbf(pbf, nodes, ways, rels)
    out = str(tmp_path / "o.oma")
    assert main(["-p", "all", pbf, out]) == 0
    assert Counter(entries_from_oma(out)) == Counter(
        entries_from_oma("tests/golden/default.oma")
    )


def test_cli_preserve_parsing():
    assert parse_preserve("all") == {"id", "version", "timestamp",
                                     "changeset", "user"}
    assert parse_preserve("none") == set()
    assert parse_preserve("id,ts,cs") == {"id", "timestamp", "changeset"}
    assert parse_preserve("v,uid") == {"version", "user"}
    with pytest.raises(SystemExit):
        parse_preserve("all,id")
    with pytest.raises(SystemExit):
        parse_preserve("bogus")


def test_cli_errors():
    with pytest.raises(SystemExit):
        main([])
    with pytest.raises(SystemExit):
        main(["-b"])
    with pytest.raises(SystemExit):
        main(["-x", "f.osm"])
    with pytest.raises(SystemExit):
        main(["a.osm", "b.oma", "c.extra"])
