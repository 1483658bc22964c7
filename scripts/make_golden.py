"""Regenerate the cached golden .oma files under tests/golden/ by running the
reference jar on the conformance fixture.  Usage: python scripts/make_golden.py
"""

import pathlib
import subprocess
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from oma_ray.synth_osm import osm_fixture_xml  # noqa: E402

JAR = "/root/reference/oma.jar"
GOLDEN = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"


def main():
    GOLDEN.mkdir(parents=True, exist_ok=True)
    xml = osm_fixture_xml()
    (GOLDEN / "fixture.osm").write_text(xml)
    with tempfile.TemporaryDirectory() as td:
        osm = pathlib.Path(td) / "f.osm"
        osm.write_text(xml)
        # binary-format fixtures: same elements, encoded by our writers
        from oma_ray.sources.o5m import write_o5m
        from oma_ray.sources.osm_xml import read_osm_xml
        from oma_ray.sources.pbf import write_pbf

        nodes, ways, rels = read_osm_xml(xml)
        write_pbf(str(pathlib.Path(td) / "f.pbf"), nodes, ways, rels)
        write_o5m(str(pathlib.Path(td) / "f.o5m"), nodes, ways, rels)
        jobs = [
            ("default", "f.osm", ()),
            ("one_element", "f.osm", ("-1",)),
            ("uncompressed", "f.osm", ("-0",)),
            ("fixture_pbf", "f.pbf", ()),
            ("fixture_o5m", "f.o5m", ()),
        ]
        for name, src, extra in jobs:
            tmpd = pathlib.Path(td) / f"tmp_{name}"
            tmpd.mkdir()
            out = GOLDEN / f"{name}.oma"
            subprocess.run(
                ["java", "-jar", JAR, "-p", "all", "-tmp", str(tmpd), *extra,
                 str(pathlib.Path(td) / src), str(out)],
                check=True, capture_output=True, timeout=600,
            )
            print(name, out.stat().st_size, "bytes")


if __name__ == "__main__":
    main()
