"""Input-format sniffing + reader dispatch (S1, OSMReader.java:8-16).

Magic bytes per Tools.java:21-22,56-75:
- O5M: first 7 bytes  ff e0 04 'o5m2'
- PBF: bytes 4..9     0a 09 'OSM'  (after the 4-byte BlobHeader length)
- OMA: 'OMA' (our own container, sources/oma_file.py)
- anything else: OSM XML

O5M and PBF decoding is not yet implemented (the reference's hand-rolled
decoders are single-cursor streams, O5MReader.java:38-280 /
PBFReader.java:22-553; the Ray mapping is one read task per file /
independently-inflatable PBF blob → ``flat_map``).  They dispatch to a
clearly-marked NotImplementedError until then so format detection and the
dispatch seam are real and tested.
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
    if fmt in ("o5m", "pbf"):
        raise NotImplementedError(
            f"{fmt} decoding not implemented yet; convert to XML or extend "
            f"oma_ray.sources (see module docstring for the decoder plan)"
        )
    raise ValueError(f"{path} is an OMA container, not an OSM input")
