"""Input-format sniffing + reader dispatch (S1, OSMReader.java:8-16).

Magic bytes per Tools.java:21-22,56-75:
- O5M: first 7 bytes  ff e0 04 'o5m2'
- PBF: bytes 4..9     0a 09 'OSM'  (after the 4-byte BlobHeader length)
- OMA: 'OMA' (our own container, sources/oma_file.py)
- anything else: OSM XML

Dispatches to the XML (sources/osm_xml.py), O5M (sources/o5m.py) and PBF
(sources/pbf.py) decoders; PBF additionally has a blob-parallel Ray
Dataset path (``pbf.read_pbf_table``).
"""

from __future__ import annotations

O5M_MAGIC = bytes([0xFF, 0xE0, 0x04]) + b"o5m2"
PBF_MAGIC = bytes([0x0A, 0x09]) + b"OSM"


def detect_format(path: str) -> str:
    with open(path, "rb") as f:
        head = f.read(16)
    if head[:7] == O5M_MAGIC:
        return "o5m"
    if head[4:9] == PBF_MAGIC:
        return "pbf"
    if head[:3] == b"OMA":
        return "oma"
    return "xml"


def read_osm_any(path: str):
    """→ (nodes, ways, relations) for any supported OSM input format."""
    fmt = detect_format(path)
    if fmt == "xml":
        from oma_ray.sources.osm_xml import read_osm_xml

        return read_osm_xml(path)
    if fmt == "o5m":
        from oma_ray.sources.o5m import read_osm_o5m

        return read_osm_o5m(path)
    if fmt == "pbf":
        from oma_ray.sources.pbf import read_osm_pbf

        return read_osm_pbf(path)
    raise ValueError(f"{path} is an OMA container, not an OSM input")
