"""Decoder for .oma files produced by the reference converter.

Used as the differential-test oracle: run ``java -jar oma.jar`` on a fixture,
decode its output here, and compare against this engine's pipeline results.

File layout (writer citations):
- header: "OMA" + version byte + features byte + global bbox (4×int) +
  chunk-table offset (long) at byte 21 (ChunkGenerator.java:196-215,
  TypeAnalysis.java:275-286)
- optional typed header entries: 'c' compression header
  (TypeAnalysis.java:288-302), 't' type header (possibly deflated,
  TypeAnalysis.java:304-377), 0 = end of header
- chunk table at the offset: int count + per chunk (long start, byte type,
  bbox 4×int) (TypeAnalysis.java:696-712)
- chunk: int jump → blocks…; jump table at chunk_start+jump: smallInt count,
  per block (int offset-from-chunk-start, string key, ""=other)
  (TypeAnalysis.java:528-567)
- block: int jump → slices…; table: smallInt count, per slice (int
  offset-from-block-start, string value, ""=other) (TypeAnalysis.java:588-637)
- slice: int element count, [int compressed length], payload (DEFLATE when
  zipped); delta state resets per slice (TypeAnalysis.java:639-674)
- element payload: geo (delta coords), tags, members, meta gated by the
  features byte; collections always carry id (Node/Way/Area/Collection
  readers; ElementWithID.java:100-187)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from oma_ray.functions.codec import OmaReader, inflate

NO_BOUNDS = (0x7FFFFFFF, 0x7FFFFFFF, 0x7FFFFFFF, 0x7FFFFFFF)


@dataclass
class OmaEntry:
    chunk_type: str
    bounds: tuple
    key: str
    value: str
    elem_type: str
    id: int = 0
    version: int = 0
    timestamp: int = 0
    changeset: int = 0
    uid: int = 0
    user: str = ""
    tags: dict = field(default_factory=dict)
    members: tuple = ()
    geo: tuple = ()

    def signature(self) -> tuple:
        return (
            self.chunk_type,
            self.bounds,
            self.key,
            self.value,
            self.id,
            frozenset(self.tags.items()),
            frozenset(self.members),
            self.geo,
        )


def _read_meta(r: OmaReader, features: int, always_id: bool) -> dict:
    out = {}
    if always_id or (features & 1):
        out["id"] = r.read_long()
    if features & 2:
        out["version"] = r.read_small_int()
    if features & 4:
        out["timestamp"] = r.read_long()
    if features & 8:
        out["changeset"] = r.read_long()
    if features & 16:
        out["uid"] = r.read_int()
        out["user"] = r.read_string()
    return out


def _read_element(r: OmaReader, chunk_type: str, features: int) -> dict:
    geo: tuple = ()
    if chunk_type == "N":
        geo = (r.read_delta_x(), r.read_delta_y())
    elif chunk_type == "W":
        n = r.read_small_int()
        geo = tuple((r.read_delta_x(), r.read_delta_y()) for _ in range(n))
    elif chunk_type == "A":
        n = r.read_small_int()
        outer = tuple((r.read_delta_x(), r.read_delta_y()) for _ in range(n))
        nh = r.read_small_int()
        holes = []
        for _ in range(nh):
            m = r.read_small_int()
            holes.append(tuple((r.read_delta_x(), r.read_delta_y()) for _ in range(m)))
        geo = (outer, tuple(holes))
    elif chunk_type == "C":
        r.read_small_int()  # geo placeholder 0

    taz = r.read_small_int()
    tags = {}
    for _ in range(taz):
        k = r.read_string()
        tags[k] = r.read_string()
    maz = r.read_small_int()
    members = tuple(
        (r.read_long(), r.read_string(), r.read_small_int()) for _ in range(maz)
    )
    meta = _read_meta(r, features, always_id=(chunk_type == "C"))
    return {"geo": geo, "tags": tags, "members": members, **meta}


def decode_oma(path: str) -> list[OmaEntry]:
    with open(path, "rb") as f:
        buf = f.read()
    r = OmaReader(buf)
    magic = r.read_bytes(3)
    assert magic == b"OMA", magic
    r.read_byte()  # version
    features = r.read_byte()
    bbox = (r.read_int(), r.read_int(), r.read_int(), r.read_int())
    table_off = r.read_long()

    zipped = False
    # scan header entries until 0 byte (TypeAnalysis.java:255 end-of-header)
    while True:
        t = r.read_byte()
        if t == 0:
            break
        base = t & 0x7F
        if base == ord("c"):
            end = r.read_int()
            name = r.read_string()
            zipped = name == "DEFLATE"
            r.pos = end
        elif base == ord("t"):
            end = r.read_int()
            r.pos = end
        else:
            raise ValueError(f"unknown header entry {t}")

    rt = OmaReader(buf, table_off)
    n_chunks = rt.read_int()
    chunks = []
    for _ in range(n_chunks):
        start = rt.read_long()
        ctype = chr(rt.read_byte())
        b = (rt.read_int(), rt.read_int(), rt.read_int(), rt.read_int())
        chunks.append((start, ctype, b))

    entries: list[OmaEntry] = []
    for start, ctype, b in chunks:
        rc = OmaReader(buf, start)
        jump = rc.read_int()
        rb = OmaReader(buf, start + jump)
        n_blocks = rb.read_small_int()
        blocks = [(rb.read_int(), rb.read_string()) for _ in range(n_blocks)]
        for boff, key in blocks:
            block_start = start + boff
            rblk = OmaReader(buf, block_start)
            bjump = rblk.read_int()
            rst = OmaReader(buf, block_start + bjump)
            n_slices = rst.read_small_int()
            slices = [(rst.read_int(), rst.read_string()) for _ in range(n_slices)]
            for soff, value in slices:
                rs = OmaReader(buf, block_start + soff)
                n_elems = rs.read_int()
                if zipped:
                    clen = rs.read_int()
                    payload = inflate(rs.read_bytes(clen))
                    re = OmaReader(payload)
                else:
                    re = rs
                re.reset_delta()
                for _ in range(n_elems):
                    e = _read_element(re, ctype, features)
                    entries.append(
                        OmaEntry(
                            chunk_type=ctype, bounds=b, key=key, value=value,
                            elem_type=ctype, tags=e["tags"], members=e["members"],
                            geo=e["geo"], id=e.get("id", 0),
                            version=e.get("version", 0),
                            timestamp=e.get("timestamp", 0),
                            changeset=e.get("changeset", 0),
                            uid=e.get("uid", 0), user=e.get("user", ""),
                        )
                    )
    return entries
