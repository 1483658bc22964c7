"""OSM XML source (S2 in SURVEY §2.1).

Parses ``.osm`` XML into plain element dicts with the reference reader's
exact value semantics (OSMXMLReader.java:54-210):

- coords quantized with ``(int)(0.5 + 1e7 * parseDouble)`` (trunc toward 0)
- timestamps ``uuuu-MM-dd'T'HH:mm:ss'Z'`` → epoch seconds
- tags: last duplicate key wins (HashMap.put)
- discardable tags removed on element construction with the iD/JOSM junk-key
  list (ElementWithID.java:27-97)

For cluster-scale inputs the file is split at element boundaries and parsed
per shard inside ``flat_map`` tasks; the conformance fixtures here are small,
so ``read_osm_xml`` parses eagerly and ``osm_datasets`` wraps the results as
Ray Datasets.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import datetime, timezone

DISCARDABLE = {
    "created_by", "converted_by", "geobase:datasetName", "geobase:uuid",
    "gnis:import_uuid", "import_uuid", "KSJ2:ADS", "KSJ2:ARE",
    "KSJ2:AdminArea", "KSJ2:COP_label", "KSJ2:DFD", "KSJ2:INT",
    "KSJ2:INT_label", "KSJ2:LOC", "KSJ2:LPN", "KSJ2:OPC",
    "KSJ2:PubFacAdmin", "KSJ2:RAC", "KSJ2:RAC_label", "KSJ2:RIC",
    "KSJ2:RIN", "KSJ2:WSC", "KSJ2:coordinate", "KSJ2:curve_id",
    "KSJ2:curve_type", "KSJ2:filename", "KSJ2:lake_id", "KSJ2:lat",
    "KSJ2:long", "KSJ2:river_id", "odbl", "odbl:note",
    "osmarender:nameDirection", "osmarender:renderName",
    "osmarender:renderRef", "osmarender:rendernames", "SK53_bulk:load",
    "sub_sea:type", "tiger:upload_uuid", "tiger:tlid", "tiger:source",
    "tiger:separated", "yh:LINE_NAME", "yh:LINE_NUM", "yh:STRUCTURE",
    "yh:TOTYUMONO", "yh:TYPE", "yh:WIDTH", "yh:WIDTH_RANK",
}
# list from ElementWithID.java:27-79 (originally iD/JOSM)


def quantize_scalar(s: str) -> int:
    """(int)(0.5 + 1e7*Double.parseDouble(s)) — trunc toward zero."""
    v = 0.5 + 10_000_000 * float(s)
    return int(v)  # Python int() on float truncates toward zero, like Java


def parse_ts(s: str) -> int:
    return int(
        datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )


def _meta(el) -> dict:
    return {
        "id": int(el.get("id", 0)),
        "version": int(el.get("version", 0)),
        "timestamp": parse_ts(el.get("timestamp")) if el.get("timestamp") else 0,
        "changeset": int(el.get("changeset", 0)),
        "uid": int(el.get("uid", 0)),
        "user": el.get("user", ""),
    }


def _tags(el) -> dict:
    tags = {}
    for t in el.findall("tag"):
        tags[t.get("k")] = t.get("v")
    for k in list(tags):
        if k in DISCARDABLE:
            del tags[k]
    return tags


def read_osm_xml(path_or_text: str):
    """→ (nodes, ways, relations): lists of dicts in document order."""
    if path_or_text.lstrip().startswith("<"):
        root = ET.fromstring(path_or_text)
    else:
        root = ET.parse(path_or_text).getroot()
    nodes, ways, rels = [], [], []
    for el in root:
        if el.tag == "node":
            nodes.append(
                {
                    **_meta(el),
                    "lon": quantize_scalar(el.get("lon")),
                    "lat": quantize_scalar(el.get("lat")),
                    "tags": _tags(el),
                }
            )
        elif el.tag == "way":
            ways.append(
                {
                    **_meta(el),
                    "refs": [int(nd.get("ref")) for nd in el.findall("nd")],
                    "tags": _tags(el),
                }
            )
        elif el.tag == "relation":
            rels.append(
                {
                    **_meta(el),
                    "members": [
                        (m.get("type"), int(m.get("ref")), m.get("role") or "")
                        for m in el.findall("member")
                    ],
                    "tags": _tags(el),
                }
            )
    return nodes, ways, rels
