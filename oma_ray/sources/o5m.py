"""O5M source (S3 in SURVEY §2.1; format per O5MReader.java:38-280 +
PackedIntegerReader.java:8-49).

O5M is a single sequential stream of datasets
``[type byte][varint length][payload]`` with cross-dataset delta state (id,
timestamp, changeset, lon, lat, per-type member ref) and a 15,000-entry
sliding string-pair reference table — inherently one cursor, so the Ray
mapping is one read task per file (``flat_map`` of file → elements), as the
SURVEY prescribes; parallelism comes from many input files, not from
splitting one.

Wire semantics mirrored from the reference:

- signed numbers: first byte carries sign in bit 0 (… value = -v-1 when
  set) — the same zigzag decoding as PBF's ``s()``
- dataset types: 0x10 node, 0x11 way, 0x12 relation, 0xdb bbox, 0xff reset
  (deltas only — the reference does NOT clear the string table on reset,
  O5MReader.java:91-100), everything else skipped
- meta cascade: version==0 → no meta; accumulated timestamp==0 → no
  changeset/uid/user (O5MReader.java:158-184)
- string pairs: inline (lead 0x00) or a 1-2-byte back-reference into the
  ring table; pairs with combined length ≤250 enter the ring
  (O5MReader.java:210-249) — uid length counts in varint bytes
- tag maps last-duplicate-wins + discardable-key filter on construction
  (ElementWithID.java:95)

``write_o5m`` is a fixture-grade writer that emits the same subset
(including back-references, so the reader's ring-table path is exercised)
for differential tests against the reference jar.
"""

from __future__ import annotations

from oma_ray.sources.osm_xml import DISCARDABLE

TABLE_SIZE = 15000
MEMBER_TYPES = ("node", "way", "relation")


# --- scalar varints (single-cursor format → scalar decode is the hot path
# only per element head; payloads are tiny) ----------------------------------

class _Cur:
    __slots__ = ("b", "i", "n")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0
        self.n = len(b)

    def eof(self) -> bool:
        return self.i >= self.n

    def byte(self) -> int:
        v = self.b[self.i]
        self.i += 1
        return v

    def u(self) -> int:
        val = 0
        shift = 0
        while True:
            x = self.b[self.i]
            self.i += 1
            val |= (x & 0x7F) << shift
            if x < 0x80:
                return val
            shift += 7

    def s(self) -> int:
        u = self.u()
        return -(u >> 1) - 1 if (u & 1) else (u >> 1)

    def cstr(self) -> bytes:
        j = self.b.index(0, self.i)
        v = self.b[self.i : j]
        self.i = j + 1
        return v


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _svarint(v: int) -> bytes:
    return _uvarint((v << 1) if v >= 0 else ((-v - 1) << 1 | 1))


def _varint_len(v: int) -> int:
    """Byte length of v's unsigned varint (getLength, O5MReader.java:269-280)."""
    return max(1, (v.bit_length() + 6) // 7)


# --- reader -----------------------------------------------------------------

class _State:
    def __init__(self):
        self.id = 0
        self.ts = 0
        self.cs = 0
        self.lon = 0
        self.lat = 0
        self.ref = [0, 0, 0]
        self.table: list[tuple[str, str]] = [("", "")] * TABLE_SIZE
        self.tab_index = 0

    def reset_deltas(self):
        self.id = self.ts = self.cs = self.lon = self.lat = 0
        self.ref = [0, 0, 0]

    def store(self, pair: tuple[str, str], len0: int, len1: int):
        if len0 + len1 <= 250:
            self.table[self.tab_index] = pair
            self.tab_index = (self.tab_index + 1) % TABLE_SIZE

    def lookup(self, index: int) -> tuple[str, str]:
        return self.table[(self.tab_index + TABLE_SIZE - index) % TABLE_SIZE]


def _read_pair(c: _Cur, st: _State, integer: bool, nozero: bool) -> tuple[str, str]:
    index = c.byte()
    if index != 0:
        if index >= 0x80:
            index = index - 0x80 + (c.byte() << 7)
        return st.lookup(index)
    if integer:
        if nozero:
            first = chr(c.byte())
            len0 = 1
        else:
            value = c.u()
            first = str(value)
            len0 = _varint_len(value)
            if value != 0:
                c.byte()  # the 0x00 separating uid and user name
    else:
        fb = c.cstr()
        first = fb.decode()
        len0 = len(fb)
    sb = c.cstr()
    second = sb.decode()
    pair = (first, second)
    st.store(pair, len0, len(sb))
    return pair


def _basic_info(c: _Cur, st: _State) -> dict:
    st.id += c.s()
    version = c.u()
    if version == 0:
        return {"id": st.id, "version": 0, "timestamp": 0, "changeset": 0,
                "uid": 0, "user": ""}
    st.ts += c.s()
    if st.ts == 0:
        return {"id": st.id, "version": version, "timestamp": 0,
                "changeset": 0, "uid": 0, "user": ""}
    st.cs += c.s()
    uid_s, user = _read_pair(c, st, integer=True, nozero=False)
    return {"id": st.id, "version": version, "timestamp": st.ts,
            "changeset": st.cs, "uid": int(uid_s), "user": user}


def _tags(c: _Cur, st: _State) -> dict:
    tags = {}
    while not c.eof():
        k, v = _read_pair(c, st, integer=False, nozero=False)
        tags[k] = v
    for k in list(tags):
        if k in DISCARDABLE:
            del tags[k]
    return tags


def read_osm_o5m(path: str):
    """Eager decode → (nodes, ways, relations) in document order; the
    conformance-path counterpart of ``read_osm_xml``."""
    with open(path, "rb") as f:
        data = f.read()
    c = _Cur(data)
    st = _State()
    nodes, ways, rels = [], [], []
    while not c.eof():
        eid = c.byte()
        if eid >= 0xF0:
            if eid == 0xFF:
                st.reset_deltas()
            continue  # 0xfe eof marker carries no payload
        ln = c.u()
        p = _Cur(c.b[c.i : c.i + ln])
        c.i += ln
        if eid == 0x10:
            e = _basic_info(p, st)
            st.lon += p.s()
            st.lat += p.s()
            e["lon"] = st.lon
            e["lat"] = st.lat
            e["tags"] = _tags(p, st)
            nodes.append(e)
        elif eid == 0x11:
            e = _basic_info(p, st)
            reflen = p.u()
            rc = _Cur(p.b[p.i : p.i + reflen])
            p.i += reflen
            refs = []
            while not rc.eof():
                st.ref[0] += rc.s()
                refs.append(st.ref[0])
            e["refs"] = refs
            e["tags"] = _tags(p, st)
            ways.append(e)
        elif eid == 0x12:
            e = _basic_info(p, st)
            memlen = p.u()
            mc = _Cur(p.b[p.i : p.i + memlen])
            p.i += memlen
            members = []
            while not mc.eof():
                delta = mc.s()
                tchar, role = _read_pair(mc, st, integer=True, nozero=True)
                t = ord(tchar[0]) - ord("0")
                st.ref[t] += delta
                members.append((MEMBER_TYPES[t], st.ref[t], role))
            e["members"] = members
            e["tags"] = _tags(p, st)
            rels.append(e)
        # 0xdb bbox and 0xe0 header: skipped (payload already consumed)
    return nodes, ways, rels


# --- fixture-grade writer ---------------------------------------------------

class _WState:
    """Writer-side mirror of the reader's ring table: pair → most-recent
    ring slot, so back-references are emitted exactly where the reference
    reader would resolve them."""

    def __init__(self):
        self.slot: dict[tuple[str, str], int] = {}
        self.ring: list[tuple[str, str] | None] = [None] * TABLE_SIZE
        self.tab_index = 0

    def ref_of(self, pair) -> int | None:
        pos = self.slot.get(pair)
        if pos is None or self.ring[pos] != pair:
            return None
        index = (self.tab_index - pos) % TABLE_SIZE
        return index if 0 < index < TABLE_SIZE else None

    def store(self, pair, len0: int, len1: int):
        if len0 + len1 <= 250:
            old = self.ring[self.tab_index]
            if old is not None and self.slot.get(old) == self.tab_index:
                del self.slot[old]
            self.ring[self.tab_index] = pair
            self.slot[pair] = self.tab_index
            self.tab_index = (self.tab_index + 1) % TABLE_SIZE


def _enc_ref(index: int) -> bytes:
    if index < 0x80:
        return bytes([index])
    return bytes([0x80 | (index & 0x7F), index >> 7])


def _enc_pair(ws: _WState, pair: tuple[str, str], integer: bool,
              nozero: bool) -> bytes:
    ref = ws.ref_of(pair)
    if ref is not None:
        return _enc_ref(ref)
    first, second = pair
    sb = second.encode()
    if integer:
        if nozero:
            body = bytes([0]) + first.encode()[:1] + sb + bytes([0])
            len0 = 1
        else:
            uid = int(first)
            body = bytes([0]) + _uvarint(uid)
            if uid != 0:
                body += bytes([0])
            body += sb + bytes([0])
            len0 = _varint_len(uid)
    else:
        fb = first.encode()
        body = bytes([0]) + fb + bytes([0]) + sb + bytes([0])
        len0 = len(fb)
    ws.store(pair, len0, len(sb))
    return body


class _WDeltas:
    def __init__(self):
        self.id = 0
        self.ts = 0
        self.cs = 0
        self.lon = 0
        self.lat = 0
        self.ref = [0, 0, 0]


def _enc_basic(ws: _WState, d: _WDeltas, e: dict) -> bytes:
    out = _svarint(e["id"] - d.id)
    d.id = e["id"]
    out += _uvarint(e["version"])
    if e["version"] == 0:
        return out
    out += _svarint(e["timestamp"] - d.ts)
    d.ts = e["timestamp"]
    if e["timestamp"] == 0:
        return out
    out += _svarint(e["changeset"] - d.cs)
    d.cs = e["changeset"]
    out += _enc_pair(ws, (str(e["uid"]), e["user"]), integer=True, nozero=False)
    return out


def _enc_tags(ws: _WState, tags: dict) -> bytes:
    return b"".join(
        _enc_pair(ws, (k, v), integer=False, nozero=False)
        for k, v in tags.items()
    )


def _dataset(eid: int, payload: bytes) -> bytes:
    return bytes([eid]) + _uvarint(len(payload)) + payload


def write_o5m(path: str, nodes: list, ways: list, rels: list,
              bbox: tuple | None = None) -> str:
    """Fixture-grade O5M writer (subset the reference reader accepts,
    including ring-table back-references)."""
    ws = _WState()
    d = _WDeltas()
    out = bytearray()
    out += bytes([0xFF])  # reset marker
    out += _dataset(0xE0, b"o5m2")
    if bbox is not None:
        minlon, minlat, maxlon, maxlat = bbox
        out += _dataset(
            0xDB,
            _svarint(minlon) + _svarint(minlat) + _svarint(maxlon)
            + _svarint(maxlat),
        )
    for n in nodes:
        p = _enc_basic(ws, d, n)
        p += _svarint(n["lon"] - d.lon)
        d.lon = n["lon"]
        p += _svarint(n["lat"] - d.lat)
        d.lat = n["lat"]
        p += _enc_tags(ws, n["tags"])
        out += _dataset(0x10, p)
    for w in ways:
        p = _enc_basic(ws, d, w)
        refs = b""
        for r in w["refs"]:
            refs += _svarint(r - d.ref[0])
            d.ref[0] = r
        p += _uvarint(len(refs)) + refs
        p += _enc_tags(ws, w["tags"])
        out += _dataset(0x11, p)
    for r in rels:
        p = _enc_basic(ws, d, r)
        mems = b""
        for mtype, ref, role in r["members"]:
            t = MEMBER_TYPES.index(mtype)
            mems += _svarint(ref - d.ref[t])
            d.ref[t] = ref
            mems += _enc_pair(ws, (str(t), role), integer=True, nozero=True)
        p += _uvarint(len(mems)) + mems
        p += _enc_tags(ws, r["tags"])
        out += _dataset(0x12, p)
    out += bytes([0xFE])
    with open(path, "wb") as f:
        f.write(bytes(out))
    return path
