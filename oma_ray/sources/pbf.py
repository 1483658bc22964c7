"""OSM PBF source (S4 in SURVEY §2.1; format spec per PBFReader.java:22-553).

A PBF file is a sequence of
``[int32-BE header_len][BlobHeader][Blob of header.datasize bytes]`` frames.
Each Blob inflates (zlib) to a HeaderBlock (``OSMHeader``) or a
PrimitiveBlock (``OSMData``) holding a per-block string table plus groups of
DenseNodes / Ways / Relations.  Blobs are **independently decompressible**,
which is the whole Ray story: ``pbf_blob_index`` scans the frame offsets
driver-side (cheap seeks, no inflation), then each blob decodes in its own
task (``read_pbf_table``) — embarrassingly parallel, exactly the SURVEY §2.1
mapping.

Decoder semantics mirror the reference exactly:

- coords are used as 1e7 fixed-point directly (granularity=100 nanodeg, the
  PBF default; the reference hard-assumes it — PBFReader.java:339-360 — and
  we raise on any other granularity/offset rather than silently diverge)
- DenseNodes ids/lat/lon and DenseInfo ts/changeset/uid/user are zigzag
  deltas; DenseInfo version is absolute (PBFReader.java:396-419)
- way refs and relation member ids are zigzag deltas (PBFReader.java:259-296)
- tag maps are last-duplicate-wins; the discardable-key filter applies on
  construction like every reader (ElementWithID.java:95)
- header bbox is nanodegrees with truncating /100 (PBFReader.java:177-180)

Packed varint runs decode vectorized (numpy; one pass over the byte buffer),
so DenseNodes — the bulk of any planet file — never loops per node for
ids/coords (the np.cumsum delta decode the SURVEY calls for).

``write_pbf`` is a fixture-grade writer (zlib-only, one group per element
kind, explicit Info on every element) used to build golden-test inputs for
differential runs against the reference jar.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from oma_ray.sources.osm_xml import DISCARDABLE

GRANULARITY = 100  # nanodegrees per unit == 1e-7 degrees, the PBF default


# --- varint primitives ------------------------------------------------------

def decode_varints(buf: bytes | memoryview) -> np.ndarray:
    """All varints of a packed buffer → uint64 array, vectorized: byte
    positions with the continuation bit clear terminate a varint; each
    byte contributes its low 7 bits shifted by 7×(offset within varint),
    folded per varint with ``np.add.reduceat``."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = (b & 0x80) == 0
    end_idx = np.nonzero(ends)[0]
    starts = np.concatenate([[0], end_idx[:-1] + 1])
    vid = np.cumsum(np.concatenate([[False], ends[:-1]]))
    pos = np.arange(b.size, dtype=np.int64) - starts[vid]
    contrib = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


def unzigzag(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u, dtype=np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(np.int64)


def encode_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


class Cur:
    """Scalar cursor over one protobuf message (field framing only — the
    hot packed payloads go through ``decode_varints``)."""

    __slots__ = ("b", "i", "n")

    def __init__(self, b: bytes | memoryview):
        self.b = b
        self.i = 0
        self.n = len(b)

    def u(self) -> int:
        val = 0
        shift = 0
        b = self.b
        i = self.i
        while True:
            x = b[i]
            i += 1
            val |= (x & 0x7F) << shift
            if x < 0x80:
                self.i = i
                return val
            shift += 7

    def bytes_(self):
        ln = self.u()
        v = self.b[self.i : self.i + ln]
        self.i += ln
        return v

    def fields(self):
        """Yield (field_no, value) — varint fields yield ints, length-
        delimited fields yield memoryview-ish byte slices; 32/64-bit
        fixed fields are skipped (absent from OSM PBF)."""
        while self.i < self.n:
            tag = self.u()
            wt = tag & 7
            nr = tag >> 3
            if wt == 0:
                yield nr, self.u()
            elif wt == 2:
                yield nr, self.bytes_()
            elif wt == 1:
                self.i += 8
            elif wt == 5:
                self.i += 4
            else:
                raise ValueError(f"unsupported protobuf wire type {wt}")


# --- blob framing -----------------------------------------------------------

def pbf_blob_index(path: str) -> list[dict]:
    """Frame scan without inflation: one dict per blob
    ``{path, type, offset, size}`` where offset/size delimit the raw Blob
    message.  Drives the per-blob task fan-out."""
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (hlen,) = struct.unpack(">i", head)
            bh = f.read(hlen)
            btype, datasize = _blob_header(bh)
            offset = f.tell()
            out.append({"path": path, "type": btype, "offset": offset,
                        "size": datasize})
            f.seek(datasize, 1)
    return out


def _blob_header(buf: bytes) -> tuple[str, int]:
    btype, datasize = "", 0
    for nr, v in Cur(buf).fields():
        if nr == 1:
            btype = bytes(v).decode()
        elif nr == 3:
            datasize = v
    return btype, datasize


def inflate_blob(raw: bytes) -> bytes:
    """Blob message → uncompressed payload (raw or zlib; the reference
    supports zlib only — PBFReader.java:113-121 — we accept both)."""
    for nr, v in Cur(raw).fields():
        if nr == 1:
            return bytes(v)
        if nr == 3:
            return zlib.decompress(bytes(v))
    raise ValueError("PBF blob carries no raw or zlib data")


# --- block decoding ---------------------------------------------------------

def _string_table(buf) -> list[str]:
    return [bytes(v).decode() for nr, v in Cur(buf).fields() if nr == 1]


def _clean_tags(tags: dict) -> dict:
    for k in list(tags):
        if k in DISCARDABLE:
            del tags[k]
    return tags


def _decode_info(buf) -> tuple[int, int, int, int, int]:
    version = ts = cs = uid = user_sid = 0
    for nr, v in Cur(buf).fields():
        if nr == 1:
            version = v
        elif nr == 2:
            ts = v
        elif nr == 3:
            cs = v
        elif nr == 4:
            uid = v
        elif nr == 5:
            user_sid = v
    return version, ts, cs, uid, user_sid


def _decode_dense(buf, st: list[str]) -> list[dict]:
    ids = lats = lons = None
    kv = np.empty(0, dtype=np.uint64)
    versions = np.empty(0, dtype=np.uint64)
    tss = css = uids = users = None
    for nr, v in Cur(buf).fields():
        if nr == 1:
            ids = np.cumsum(unzigzag(decode_varints(v)))
        elif nr == 5:
            for inr, iv in Cur(v).fields():
                if inr == 1:
                    versions = decode_varints(iv)
                elif inr == 2:
                    tss = np.cumsum(unzigzag(decode_varints(iv)))
                elif inr == 3:
                    css = np.cumsum(unzigzag(decode_varints(iv)))
                elif inr == 4:
                    uids = np.cumsum(unzigzag(decode_varints(iv)))
                elif inr == 5:
                    users = np.cumsum(unzigzag(decode_varints(iv)))
        elif nr == 8:
            lats = np.cumsum(unzigzag(decode_varints(v)))
        elif nr == 9:
            lons = np.cumsum(unzigzag(decode_varints(v)))
        elif nr == 10:
            kv = decode_varints(v)
    if ids is None:
        return []
    n = len(ids)
    zero = np.zeros(n, dtype=np.int64)
    versions = versions.astype(np.int64) if len(versions) else zero
    tss = tss if tss is not None else zero
    css = css if css is not None else zero
    uids = uids if uids is not None else zero
    users = users if users is not None else zero
    # per-node tag slices: kv is (k,v)* pairs per node, 0-delimited
    out = []
    p = 0
    kvi = kv.astype(np.int64)
    for i in range(n):
        tags = {}
        while p < len(kvi) and kvi[p] != 0:
            tags[st[kvi[p]]] = st[kvi[p + 1]]
            p += 2
        p += 1  # the 0 delimiter
        out.append(
            {
                "id": int(ids[i]),
                "version": int(versions[i]),
                "timestamp": int(tss[i]),
                "changeset": int(css[i]),
                "uid": int(uids[i]),
                "user": st[int(users[i])] if len(st) else "",
                "lon": int(np.int32(lons[i])),
                "lat": int(np.int32(lats[i])),
                "tags": _clean_tags(tags),
            }
        )
    return out


def _tags_from(keys_buf, vals_buf, st) -> dict:
    tags = {}
    if keys_buf is not None and vals_buf is not None:
        ks = decode_varints(keys_buf).astype(np.int64)
        vs = decode_varints(vals_buf).astype(np.int64)
        for k, v in zip(ks, vs):
            tags[st[k]] = st[v]
    return _clean_tags(tags)


def _decode_way(buf, st) -> dict:
    wid = 0
    keys_buf = vals_buf = None
    refs = []
    info = (0, 0, 0, 0, 0)
    for nr, v in Cur(buf).fields():
        if nr == 1:
            wid = v
        elif nr == 2:
            keys_buf = v
        elif nr == 3:
            vals_buf = v
        elif nr == 4:
            info = _decode_info(v)
        elif nr == 8:
            refs = np.cumsum(unzigzag(decode_varints(v))).tolist()
    version, ts, cs, uid, user_sid = info
    return {
        "id": wid, "version": version, "timestamp": ts, "changeset": cs,
        "uid": uid, "user": st[user_sid] if st else "",
        "refs": [int(r) for r in refs],
        "tags": _tags_from(keys_buf, vals_buf, st),
    }


_MEMBER_TYPES = ("node", "way", "relation")


def _decode_relation(buf, st) -> dict:
    rid = 0
    keys_buf = vals_buf = None
    roles = mems = types = None
    info = (0, 0, 0, 0, 0)
    for nr, v in Cur(buf).fields():
        if nr == 1:
            rid = v
        elif nr == 2:
            keys_buf = v
        elif nr == 3:
            vals_buf = v
        elif nr == 4:
            info = _decode_info(v)
        elif nr == 8:
            roles = decode_varints(v).astype(np.int64)
        elif nr == 9:
            mems = np.cumsum(unzigzag(decode_varints(v)))
        elif nr == 10:
            types = decode_varints(v).astype(np.int64)
    members = []
    if mems is not None:
        for i in range(len(mems)):
            members.append(
                (_MEMBER_TYPES[types[i]], int(mems[i]),
                 st[roles[i]] if roles is not None else "")
            )
    version, ts, cs, uid, user_sid = info
    return {
        "id": rid, "version": version, "timestamp": ts, "changeset": cs,
        "uid": uid, "user": st[user_sid] if st else "",
        "members": members,
        "tags": _tags_from(keys_buf, vals_buf, st),
    }


def decode_primitive_block(data: bytes) -> tuple[list, list, list]:
    """Uncompressed PrimitiveBlock → (nodes, ways, relations) dict lists."""
    st: list[str] = []
    groups = []
    for nr, v in Cur(data).fields():
        if nr == 1:
            st = _string_table(v)
        elif nr == 2:
            groups.append(v)
        elif nr == 17:
            if v != GRANULARITY:
                raise NotImplementedError(
                    f"PBF granularity {v} != 100 nanodeg unsupported "
                    "(reference assumes the default, PBFReader.java:339-360)"
                )
        elif nr == 19 or nr == 20:
            if v != 0:
                raise NotImplementedError("PBF lat/lon offsets unsupported")
    nodes, ways, rels = [], [], []
    for g in groups:
        for nr, v in Cur(g).fields():
            if nr == 2:
                nodes.extend(_decode_dense(v, st))
            elif nr == 3:
                ways.append(_decode_way(v, st))
            elif nr == 4:
                rels.append(_decode_relation(v, st))
            # nr == 1: non-dense nodes — not emitted by any mainstream
            # writer; the reference doesn't handle them either
    return nodes, ways, rels


def decode_header_block(data: bytes) -> tuple | None:
    """→ (minlon, minlat, maxlon, maxlat) fixed-point, or None.  Truncating
    /100 like the reference (PBFReader.java:177-180)."""
    bbox = None
    for nr, v in Cur(data).fields():
        if nr == 1:
            left = right = top = bottom = 0
            for bnr, bv in Cur(v).fields():
                val = unzigzag(np.array([bv], dtype=np.uint64))[0]
                if bnr == 1:
                    left = val
                elif bnr == 2:
                    right = val
                elif bnr == 3:
                    top = val
                elif bnr == 4:
                    bottom = val
            trunc = lambda x: int(x / 100) if x >= 0 else -int(-x / 100)
            bbox = (trunc(left), trunc(bottom), trunc(right), trunc(top))
        elif nr == 4:
            feat = bytes(v).decode()
            if feat not in ("OsmSchema-V0.6", "DenseNodes"):
                raise NotImplementedError(f"required PBF feature: {feat}")
    return bbox


# --- whole-file paths -------------------------------------------------------

def read_osm_pbf(path: str):
    """Eager decode → (nodes, ways, relations); the conformance-path
    counterpart of ``read_osm_xml`` (document order preserved)."""
    nodes, ways, rels = [], [], []
    for blob in pbf_blob_index(path):
        with open(path, "rb") as f:
            f.seek(blob["offset"])
            raw = f.read(blob["size"])
        data = inflate_blob(raw)
        if blob["type"] == "OSMHeader":
            decode_header_block(data)  # validates features
        elif blob["type"] == "OSMData":
            n, w, r = decode_primitive_block(data)
            nodes.extend(n)
            ways.extend(w)
            rels.extend(r)
    return nodes, ways, rels


def elements_to_table(nodes: list, ways: list, rels: list):
    """Unified Arrow table over all three element kinds (the distributed-
    reunify input schema): list columns instead of maps so every downstream
    op stays zero-copy Arrow."""
    import pyarrow as pa

    kind, ids, ver, ts, cs, uid, user = [], [], [], [], [], [], []
    lon, lat = [], []
    refs, mtypes, mrefs, mroles = [], [], [], []
    tkeys, tvals = [], []

    def push(kd, e, ln=0, lt=0, rf=None, mb=None):
        kind.append(kd)
        ids.append(e["id"])
        ver.append(e["version"])
        ts.append(e["timestamp"])
        cs.append(e["changeset"])
        uid.append(e["uid"])
        user.append(e["user"])
        lon.append(ln)
        lat.append(lt)
        refs.append(rf or [])
        mb = mb or []
        mtypes.append([m[0] for m in mb])
        mrefs.append([m[1] for m in mb])
        mroles.append([m[2] for m in mb])
        tkeys.append(list(e["tags"].keys()))
        tvals.append(list(e["tags"].values()))

    for n in nodes:
        push("node", n, n["lon"], n["lat"])
    for w in ways:
        push("way", w, rf=w["refs"])
    for r in rels:
        push("relation", r, mb=r["members"])
    return pa.table(
        {
            "kind": pa.array(kind, type=pa.string()),
            "id": pa.array(ids, type=pa.int64()),
            "version": pa.array(ver, type=pa.int32()),
            "timestamp": pa.array(ts, type=pa.int64()),
            "changeset": pa.array(cs, type=pa.int64()),
            "uid": pa.array(uid, type=pa.int32()),
            "user": pa.array(user, type=pa.string()),
            "lon": pa.array(lon, type=pa.int32()),
            "lat": pa.array(lat, type=pa.int32()),
            "refs": pa.array(refs, type=pa.list_(pa.int64())),
            "member_types": pa.array(mtypes, type=pa.list_(pa.string())),
            "member_refs": pa.array(mrefs, type=pa.list_(pa.int64())),
            "member_roles": pa.array(mroles, type=pa.list_(pa.string())),
            "tag_keys": pa.array(tkeys, type=pa.list_(pa.string())),
            "tag_vals": pa.array(tvals, type=pa.list_(pa.string())),
        }
    )


def read_pbf_table(paths: str | list[str]):
    """Ray scale path: one decode task per OSMData blob → Dataset of
    unified element rows.  The blob index is tiny driver-side metadata;
    payload bytes are read and inflated inside each task.  Accepts one
    path or a list (a planet mirror split across files indexes the same
    way — blobs are the unit of parallelism either way)."""
    import pyarrow as pa
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    blobs = [
        b for p in paths for b in pbf_blob_index(p) if b["type"] == "OSMData"
    ]

    def decode_batch(batch: pa.Table) -> pa.Table:
        tables = []
        for row in batch.to_pylist():
            with open(row["path"], "rb") as f:
                f.seek(row["offset"])
                raw = f.read(row["size"])
            n, w, r = decode_primitive_block(inflate_blob(raw))
            tables.append(elements_to_table(n, w, r))
        return pa.concat_tables(tables)

    return rd.from_items(blobs).map_batches(
        decode_batch, batch_format="pyarrow", batch_size=1
    )


# --- fixture-grade writer ---------------------------------------------------

def _field(nr: int, wt: int, payload: bytes | int) -> bytes:
    tag = encode_varint((nr << 3) | wt)
    if wt == 0:
        return tag + encode_varint(payload)
    return tag + encode_varint(len(payload)) + payload


def _packed(nr: int, vals) -> bytes:
    body = b"".join(encode_varint(v) for v in vals)
    return _field(nr, 2, body)


class _StringTable:
    def __init__(self):
        self.strings = [""]
        self.index = {"": 0}

    def sid(self, s: str) -> int:
        if s not in self.index:
            self.index[s] = len(self.strings)
            self.strings.append(s)
        return self.index[s]

    def encoded(self) -> bytes:
        return b"".join(_field(1, 2, s.encode()) for s in self.strings)


def _info_bytes(e: dict, st: _StringTable) -> bytes:
    return (
        _field(1, 0, e["version"]) + _field(2, 0, e["timestamp"])
        + _field(3, 0, e["changeset"]) + _field(4, 0, e["uid"])
        + _field(5, 0, st.sid(e["user"]))
    )


def _dense_group(nodes: list, st: _StringTable) -> bytes:
    ids = [n["id"] for n in nodes]
    lats = [n["lat"] for n in nodes]
    lons = [n["lon"] for n in nodes]
    d = lambda xs: [zigzag(x - (xs[i - 1] if i else 0)) for i, x in enumerate(xs)]
    kv = []
    for n in nodes:
        for k, v in n["tags"].items():
            kv.extend([st.sid(k), st.sid(v)])
        kv.append(0)
    dense_info = (
        _packed(1, [n["version"] for n in nodes])
        + _packed(2, d([n["timestamp"] for n in nodes]))
        + _packed(3, d([n["changeset"] for n in nodes]))
        + _packed(4, d([n["uid"] for n in nodes]))
        + _packed(5, d([st.sid(n["user"]) for n in nodes]))
    )
    dense = (
        _packed(1, d(ids)) + _field(5, 2, dense_info)
        + _packed(8, d(lats)) + _packed(9, d(lons)) + _packed(10, kv)
    )
    return _field(2, 2, dense)


def _way_group(ways: list, st: _StringTable) -> bytes:
    body = b""
    for w in ways:
        refs = w["refs"]
        deltas = [zigzag(r - (refs[i - 1] if i else 0)) for i, r in enumerate(refs)]
        msg = (
            _field(1, 0, w["id"])
            + _packed(2, [st.sid(k) for k in w["tags"]])
            + _packed(3, [st.sid(v) for v in w["tags"].values()])
            + _field(4, 2, _info_bytes(w, st))
            + _packed(8, deltas)
        )
        body += _field(3, 2, msg)
    return body


def _rel_group(rels: list, st: _StringTable) -> bytes:
    body = b""
    for r in rels:
        mrefs = [m[1] for m in r["members"]]
        deltas = [zigzag(x - (mrefs[i - 1] if i else 0)) for i, x in enumerate(mrefs)]
        msg = (
            _field(1, 0, r["id"])
            + _packed(2, [st.sid(k) for k in r["tags"]])
            + _packed(3, [st.sid(v) for v in r["tags"].values()])
            + _field(4, 2, _info_bytes(r, st))
            + _packed(8, [st.sid(m[2]) for m in r["members"]])
            + _packed(9, deltas)
            + _packed(10, [_MEMBER_TYPES.index(m[0]) for m in r["members"]])
        )
        body += _field(4, 2, msg)
    return body


def write_pbf(path: str, nodes: list, ways: list, rels: list,
              bbox: tuple | None = None, block_size: int = 8000) -> str:
    """Fixture-grade PBF writer: zlib blobs, ONE primitive group per
    blob (the reference keeps only the LAST group of a block —
    PBFReader.java:193-200 overwrites ``pg`` per field — and real-world
    writers emit one group per block anyway), elements chunked to
    ``block_size`` per blob, explicit Info everywhere.  Used to build
    differential-test inputs."""
    header = _field(4, 2, b"OsmSchema-V0.6") + _field(4, 2, b"DenseNodes")
    if bbox is not None:
        minlon, minlat, maxlon, maxlat = bbox
        bb = (
            _field(1, 0, zigzag(minlon * 100)) + _field(2, 0, zigzag(maxlon * 100))
            + _field(3, 0, zigzag(maxlat * 100)) + _field(4, 0, zigzag(minlat * 100))
        )
        header = _field(1, 2, bb) + header

    blobs: list[tuple[str, bytes]] = [("OSMHeader", header)]
    for elems, group_fn in ((nodes, _dense_group), (ways, _way_group),
                            (rels, _rel_group)):
        for i in range(0, len(elems), block_size):
            chunk = elems[i : i + block_size]
            if not chunk:
                continue
            st = _StringTable()
            body = group_fn(chunk, st)
            block = _field(1, 2, st.encoded()) + _field(2, 2, body)
            blobs.append(("OSMData", block))

    with open(path, "wb") as f:
        for btype, payload in blobs:
            z = zlib.compress(payload, 9)
            blob = _field(2, 0, len(payload)) + _field(3, 2, z)
            bh = _field(1, 2, btype.encode()) + _field(3, 0, len(blob))
            f.write(struct.pack(">i", len(bh)))
            f.write(bh)
            f.write(blob)
    return path
