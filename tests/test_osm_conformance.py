"""Golden differential test: our conversion vs the reference oma.jar.

Runs ``java -jar /root/reference/oma.jar -p all`` on the synthetic fixture,
decodes the resulting .oma with our reader, and compares the full entry
multiset — (chunk_type, chunk_bounds, block_key, slice_value, meta, tags,
members, geometry) — against ``convert_osm``.  Tags and members compare as
sets (the reference iterates Java HashMaps: order is unspecified,
ElementWithID.java:126-134); everything else must match exactly, including
the reference's int32-overflow orientation quirk (see geo.is_clockwise).
"""

import collections
import os
import pathlib
import shutil
import subprocess

import pytest

JAR = "/root/reference/oma.jar"
needs_java = pytest.mark.skipif(shutil.which("java") is None, reason="no JVM")


def _run_reference(workdir, xml: str, name: str, extra_args=()):
    osm = workdir / f"{name}.osm"
    osm.write_text(xml)
    out = workdir / f"{name}.oma"
    tmpdir = workdir / f"tmp_{name}"
    tmpdir.mkdir()
    subprocess.run(
        ["java", "-jar", JAR, "-p", "all", "-tmp", str(tmpdir), *extra_args,
         str(osm), str(out)],
        check=True, capture_output=True, timeout=300,
    )
    return str(out)


GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "golden"


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    """Golden .oma files: cached under tests/golden/ (regenerate with
    scripts/make_golden.py — each jar run takes minutes due to its forced-GC
    loops); set RUN_JAR=1 to invoke the jar live instead."""
    from oma_ray.synth_osm import osm_fixture_xml

    xml = osm_fixture_xml()
    if os.environ.get("RUN_JAR") == "1":
        d = tmp_path_factory.mktemp("oma_golden")
        return {
            "xml": xml,
            "default": _run_reference(d, xml, "default"),
            "one_element": _run_reference(d, xml, "one", extra_args=("-1",)),
            "uncompressed": _run_reference(d, xml, "plain", extra_args=("-0",)),
        }
    cached = GOLDEN_DIR / "fixture.osm"
    assert cached.read_text() == xml, (
        "fixture changed: regenerate goldens with scripts/make_golden.py"
    )
    return {
        "xml": xml,
        "default": str(GOLDEN_DIR / "default.oma"),
        "one_element": str(GOLDEN_DIR / "one_element.oma"),
        "uncompressed": str(GOLDEN_DIR / "uncompressed.oma"),
    }


def _mine(xml: str, one_element: bool = False):
    from oma_ray.pipelines.osm import convert_osm
    from oma_ray.sources.osm_xml import read_osm_xml
    from oma_ray.stages.classify import TypeConfig

    nodes, ways, rels = read_osm_xml(xml)
    with open("/root/reference/default.bbs") as f:
        bbs = f.read()
    return convert_osm(nodes, ways, rels, bbs, TypeConfig.default(),
                       one_element=one_element)


def _assert_equal_multisets(mine, theirs):
    cm, ct = collections.Counter(mine), collections.Counter(theirs)
    only_mine = list((cm - ct).elements())
    only_theirs = list((ct - cm).elements())
    assert not only_mine and not only_theirs, (
        f"{len(only_mine)} only in ours (e.g. {only_mine[:2]}), "
        f"{len(only_theirs)} only in reference (e.g. {only_theirs[:2]})"
    )


@needs_java
def test_full_conversion_matches_reference(golden):
    from oma_ray.pipelines.osm import entries_from_oma

    theirs = entries_from_oma(golden["default"])
    assert len(theirs) > 15  # sanity: fixture exercises many paths
    _assert_equal_multisets(_mine(golden["xml"]), theirs)


@needs_java
def test_one_element_mode_matches_reference(golden):
    from oma_ray.pipelines.osm import entries_from_oma

    theirs = entries_from_oma(golden["one_element"])
    _assert_equal_multisets(_mine(golden["xml"], one_element=True), theirs)


@needs_java
def test_uncompressed_mode_decodes_identically(golden):
    from oma_ray.pipelines.osm import entries_from_oma

    a = entries_from_oma(golden["default"])
    b = entries_from_oma(golden["uncompressed"])
    assert collections.Counter(a) == collections.Counter(b)


needs_jar_env = pytest.mark.skipif(
    os.environ.get("RUN_JAR") != "1", reason="set RUN_JAR=1 to run the jar"
)


@needs_java
@needs_jar_env
def test_jar_two_level_split_is_byte_invariant(tmp_path):
    """The reference's two-level prechunk split (ChunkGenerator.java:
    165-192,302-399; triggered whenever #bounds >= max_chunks) is an
    fd/memory workaround with NO effect on output bytes: the jar's
    ``-c 2`` output (42k bounds → two-level, verbose confirms
    "Using two-level splitting") is byte-identical to its default run.
    This is why the engine's partitioned-parquet sink needs no analogue
    (COVERAGE.md K-gaps) — measured, not assumed."""
    from oma_ray.synth_osm import osm_fixture_xml

    xml = osm_fixture_xml()
    default = _run_reference(tmp_path, xml, "default")
    c2 = _run_reference(tmp_path, xml, "c2", extra_args=("-c", "2"))
    assert open(default, "rb").read() == open(c2, "rb").read()


@needs_java
@needs_jar_env
def test_jar_continuation_chunks_decode_identically(tmp_path):
    """Memory-pressure continuation chunks (TypeAnalysis.java:499-514):
    run the jar on a 30k-node synthetic extract with a constrained heap
    (-Xmx260m) and a memlimit above the post-allocation free heap
    (-m 220m) so ``memavail() < memlimit`` trips mid-chunk ("Memory low.
    Splitting chunk."), producing duplicate-bounds chunk-table rows; our
    reader must decode that file to the EXACT entry multiset of the
    unconstrained run, and the writer's ``chunk_max_elements`` form must
    round-trip the same multiset."""
    from collections import Counter

    from oma_ray.pipelines.osm import entries_from_oma
    from oma_ray.sources.oma_file import oma_index
    from oma_ray.sources.pbf import write_pbf
    from oma_ray.synth_osm import synth_big_osm

    nodes, ways, rels = synth_big_osm(30000)
    pbf = str(tmp_path / "big.pbf")
    write_pbf(pbf, nodes, ways, rels)

    def run(name, java_args=(), oma_args=()):
        out = tmp_path / f"{name}.oma"
        tmpd = tmp_path / f"tmp_{name}"
        tmpd.mkdir()
        r = subprocess.run(
            ["java", *java_args, "-jar", JAR, "-p", "all", "-v", "-v",
             "-v", "-tmp", str(tmpd), *oma_args, pbf, str(out)],
            check=True, capture_output=True, timeout=600, text=True,
        )
        return str(out), r.stdout

    ref, _ = run("ref")
    forced, log = run("forced", java_args=("-Xmx260m",),
                      oma_args=("-m", "220m"))
    assert "Memory low" in log, "constrained run must actually split"

    ix = oma_index(forced)
    keyc = collections.Counter(
        (c[2], tuple(c[3])) for c in ix["chunks"])
    assert any(v > 1 for v in keyc.values()), "no continuation chunks"

    a = Counter(entries_from_oma(forced))
    b = Counter(entries_from_oma(ref))
    assert a == b
