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
        for name, extra in [
            ("default", ()), ("one_element", ("-1",)), ("uncompressed", ("-0",)),
        ]:
            tmpd = pathlib.Path(td) / f"tmp_{name}"
            tmpd.mkdir()
            out = GOLDEN / f"{name}.oma"
            subprocess.run(
                ["java", "-jar", JAR, "-p", "all", "-tmp", str(tmpd), *extra,
                 str(osm), str(out)],
                check=True, capture_output=True, timeout=600,
            )
            print(name, out.stat().st_size, "bytes")


if __name__ == "__main__":
    main()
