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


def _parse_header_entries(span: bytes, base_off: int) -> bool:
    """Scan header entries until the 0 terminator
    (TypeAnalysis.java:255 end-of-header); → whether slices are DEFLATEd.
    ``span`` starts at absolute file offset ``base_off`` (entry `end`
    offsets are absolute)."""
    r = OmaReader(span)
    zipped = False
    while True:
        t = r.read_byte()
        if t == 0:
            break
        base = t & 0x7F
        if base == ord("c"):
            end = r.read_int()
            name = r.read_string()
            zipped = name == "DEFLATE"
            r.pos = end - base_off
        elif base == ord("t"):
            end = r.read_int()
            r.pos = end - base_off
        else:
            raise ValueError(f"unknown header entry {t}")
    return zipped


def oma_index(path: str) -> dict:
    """Driver-side metadata of a ``.oma`` container — fixed header, header
    entries, and the chunk table — via three bounded reads (never the
    payload): {features, zipped, bbox, chunks: [(start, end, ctype,
    bounds), ...]}.  Chunk byte ranges come from the sorted starts (the
    writer lays chunks contiguously before the table,
    TypeAnalysis.java:275-286,696-712)."""
    import os

    with open(path, "rb") as f:
        fixed = f.read(29)
        r = OmaReader(fixed)
        magic = r.read_bytes(3)
        assert magic == b"OMA", magic
        r.read_byte()  # version
        features = r.read_byte()
        bbox = (r.read_int(), r.read_int(), r.read_int(), r.read_int())
        table_off = r.read_long()

        f.seek(table_off)
        rt = OmaReader(f.read(os.path.getsize(path) - table_off))
        n_chunks = rt.read_int()
        chunks = []
        for _ in range(n_chunks):
            start = rt.read_long()
            ctype = chr(rt.read_byte())
            b = (rt.read_int(), rt.read_int(), rt.read_int(), rt.read_int())
            chunks.append((start, ctype, b))

        first_chunk = min((c[0] for c in chunks), default=table_off)
        f.seek(29)
        zipped = _parse_header_entries(f.read(first_chunk - 29), 29)

    starts = sorted(c[0] for c in chunks)
    ends = {
        s: (starts[i + 1] if i + 1 < len(starts) else table_off)
        for i, s in enumerate(starts)
    }
    return {
        "features": features,
        "zipped": zipped,
        "bbox": bbox,
        "chunks": [(s, ends[s], ct, b) for (s, ct, b) in chunks],
    }


def decode_block(buf: bytes, ctype: str, bounds: tuple, key: str,
                 features: int, zipped: bool) -> list[OmaEntry]:
    """Decode ONE block's bytes (``buf`` starts at the block start; slice
    offsets are block-relative and delta state resets per slice,
    TypeAnalysis.java:588-674) — the per-task unit of the parallel
    reader."""
    rblk = OmaReader(buf)
    bjump = rblk.read_int()
    rst = OmaReader(buf, bjump)
    n_slices = rst.read_small_int()
    slices = [(rst.read_int(), rst.read_string()) for _ in range(n_slices)]
    entries: list[OmaEntry] = []
    for soff, value in slices:
        rs = OmaReader(buf, soff)
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
                    chunk_type=ctype, bounds=bounds, key=key, value=value,
                    elem_type=ctype, tags=e["tags"], members=e["members"],
                    geo=e["geo"], id=e.get("id", 0),
                    version=e.get("version", 0),
                    timestamp=e.get("timestamp", 0),
                    changeset=e.get("changeset", 0),
                    uid=e.get("uid", 0), user=e.get("user", ""),
                )
            )
    return entries


def _chunk_blocks(buf: bytes) -> list[tuple]:
    """Block jump table of one chunk's bytes → [(block_off, end, key)],
    block byte ranges chunk-relative (blocks are laid contiguously before
    the chunk's jump table, TypeAnalysis.java:528-567)."""
    rc = OmaReader(buf)
    jump = rc.read_int()
    rb = OmaReader(buf, jump)
    n_blocks = rb.read_small_int()
    blocks = [(rb.read_int(), rb.read_string()) for _ in range(n_blocks)]
    offs = sorted(b[0] for b in blocks)
    end_of = {
        o: (offs[i + 1] if i + 1 < len(offs) else jump)
        for i, o in enumerate(offs)
    }
    return [(boff, end_of[boff], key) for boff, key in blocks]


def decode_chunk(buf: bytes, ctype: str, bounds: tuple, features: int,
                 zipped: bool) -> list[OmaEntry]:
    """Decode ONE chunk's bytes (``buf`` starts at the chunk start)."""
    entries: list[OmaEntry] = []
    for boff, bend, key in _chunk_blocks(buf):
        entries.extend(
            decode_block(buf[boff:bend], ctype, bounds, key, features, zipped)
        )
    return entries


def decode_oma(path: str) -> list[OmaEntry]:
    idx = oma_index(path)
    with open(path, "rb") as f:
        buf = f.read()
    entries: list[OmaEntry] = []
    for start, end, ctype, b in idx["chunks"]:
        entries.extend(
            decode_chunk(buf[start:end], ctype, b, idx["features"],
                         idx["zipped"])
        )
    return entries


def decode_block_columns(buf: bytes, ctype: str, bounds: tuple, key: str,
                         features: int, zipped: bool):
    """Decode ONE block straight into the partitioned-conversion flat
    Arrow schema (``pipelines.oma_out.entries_to_table`` layout) — the
    reader task's fast path.  The wire scan stays sequential (element
    boundaries depend on parsed contents), but it appends only primitives
    to flat builders; ALL JSON wire columns are then assembled with the
    vectorized ``functions.jsonvec`` kernels — no per-row dataclass /
    frozenset / ``json.dumps`` (those cost more than the wire scan
    itself).  JSON byte order differs from ``entries_to_table`` (tags in
    wire order, compact separators) — every consumer ``json.loads`` these
    columns, byte-identity is not part of the contract
    (functions/jsonvec.py escaping contract)."""
    import json as _json

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from oma_ray.functions.jsonvec import _rejoin, quote_strings
    from oma_ray.pipelines.oma_out import OTHER_KEY, _bucket_of

    rblk = OmaReader(buf)
    bjump = rblk.read_int()
    rst = OmaReader(buf, bjump)
    n_slices = rst.read_small_int()
    slices = [(rst.read_int(), rst.read_string()) for _ in range(n_slices)]

    values: list[str] = []          # per element: slice value
    mid, mver, mts, mcs, muid = [], [], [], [], []
    muser: list[str] = []
    tag_k: list[str] = []
    tag_v: list[str] = []
    tag_n: list[int] = []
    mem_ref: list[int] = []
    mem_role: list[str] = []
    mem_type: list[int] = []
    mem_n: list[int] = []
    gx: list[int] = []              # N: one per element; W/A: flat points
    gy: list[int] = []
    way_n: list[int] = []           # W: points per element; A: outer points
    hole_pts: list[int] = []        # A: points per hole (flat)
    hole_n: list[int] = []          # A: holes per element

    has_id = bool(features & 1) or ctype == "C"
    has_ver = bool(features & 2)
    has_ts = bool(features & 4)
    has_cs = bool(features & 8)
    has_user = bool(features & 16)

    for soff, value in slices:
        rs = OmaReader(buf, soff)
        n_elems = rs.read_int()
        if zipped:
            clen = rs.read_int()
            re = OmaReader(inflate(rs.read_bytes(clen)))
        else:
            re = rs
        re.reset_delta()
        for _ in range(n_elems):
            if ctype == "N":
                gx.append(re.read_delta_x())
                gy.append(re.read_delta_y())
            elif ctype == "W":
                n = re.read_small_int()
                way_n.append(n)
                for _i in range(n):
                    gx.append(re.read_delta_x())
                    gy.append(re.read_delta_y())
            elif ctype == "A":
                n = re.read_small_int()
                way_n.append(n)
                for _i in range(n):
                    gx.append(re.read_delta_x())
                    gy.append(re.read_delta_y())
                nh = re.read_small_int()
                hole_n.append(nh)
                for _h in range(nh):
                    m = re.read_small_int()
                    hole_pts.append(m)
                    for _i in range(m):
                        gx.append(re.read_delta_x())
                        gy.append(re.read_delta_y())
            elif ctype == "C":
                re.read_small_int()  # geo placeholder 0
            taz = re.read_small_int()
            tag_n.append(taz)
            for _t in range(taz):
                tag_k.append(re.read_string())
                tag_v.append(re.read_string())
            maz = re.read_small_int()
            mem_n.append(maz)
            for _m in range(maz):
                mem_ref.append(re.read_long())
                mem_role.append(re.read_string())
                mem_type.append(re.read_small_int())
            mid.append(re.read_long() if has_id else 0)
            mver.append(re.read_small_int() if has_ver else 0)
            mts.append(re.read_long() if has_ts else 0)
            mcs.append(re.read_long() if has_cs else 0)
            if has_user:
                muid.append(re.read_int())
                muser.append(re.read_string())
            else:
                muid.append(0)
                muser.append("")
            values.append(value)

    n_rows = len(values)
    if not n_rows:
        from oma_ray.pipelines.oma_out import entries_to_table

        return entries_to_table([])

    def offs(counts: list[int]) -> pa.Array:
        return pa.array(
            np.concatenate([[0], np.cumsum(counts)]), type=pa.int32()
        )

    # meta_json = [id, ver, ts, cs, uid, "user"]
    def istr(vals) -> pa.Array:
        return pc.cast(pa.array(vals, type=pa.int64()), pa.string())

    meta_json = pc.binary_join_element_wise(
        "[", istr(mid), ",", istr(mver), ",", istr(mts), ",", istr(mcs),
        ",", istr(muid), ",", quote_strings(pa.array(muser)), "]", "",
    )
    # tags_json = [["k","v"],...]
    pairs = pc.binary_join_element_wise(
        "[", quote_strings(pa.array(tag_k, type=pa.string())), ",",
        quote_strings(pa.array(tag_v, type=pa.string())), "]", "",
    )
    tags_json = _rejoin(pairs, offs(tag_n))
    # members_json = [[ref,"role",type],...]
    triples = pc.binary_join_element_wise(
        "[", istr(mem_ref), ",",
        quote_strings(pa.array(mem_role, type=pa.string())), ",",
        istr(mem_type), "]", "",
    )
    members_json = _rejoin(triples, offs(mem_n))
    # geo_json per chunk type
    if ctype == "N":
        geo_json = pc.binary_join_element_wise(
            "[", istr(gx), ",", istr(gy), "]", ""
        )
    elif ctype in ("W", "A"):
        pts = pc.binary_join_element_wise(
            "[", istr(gx), ",", istr(gy), "]", ""
        )
        if ctype == "W":
            geo_json = _rejoin(pts, offs(way_n))
        else:
            # points interleave [outer..., holes...] per element: split by
            # a gather over flat point positions
            way_arr = np.asarray(way_n, dtype=np.int64)
            hn_arr = np.asarray(hole_n, dtype=np.int64)
            hp_arr = np.asarray(hole_pts, dtype=np.int64)
            # per-element hole point totals
            hp_per_elem = np.zeros(n_rows, dtype=np.int64)
            if len(hp_arr):
                hole_elem = np.repeat(np.arange(n_rows), hn_arr)
                np.add.at(hp_per_elem, hole_elem, hp_arr)
            elem_first = np.concatenate(
                [[0], np.cumsum(way_arr + hp_per_elem)[:-1]]
            )
            outer_str = _rejoin(
                pc.take(
                    pts,
                    pa.array(
                        np.repeat(elem_first, way_arr)
                        + _within(way_arr),
                        type=pa.int64(),
                    ),
                ),
                offs(way_n),
            )
            if len(hp_arr):
                hole_first = (
                    np.repeat(elem_first + way_arr, hn_arr)
                    + _exclusive_within(hp_arr, hn_arr)
                )
                hole_str = _rejoin(
                    pc.take(
                        pts,
                        pa.array(
                            np.repeat(hole_first, hp_arr) + _within(hp_arr),
                            type=pa.int64(),
                        ),
                    ),
                    offs(hole_pts),
                )
                holes_json = _rejoin(hole_str, offs(hole_n))
            else:
                holes_json = pa.array(["[]"] * n_rows, type=pa.string())
            geo_json = pc.binary_join_element_wise(
                "[", outer_str, ",", holes_json, "]", ""
            )
    else:
        geo_json = pa.array(["[]"] * n_rows, type=pa.string())

    bounds_json = _json.dumps(list(bounds), default=int)
    return pa.table(
        {
            "chunk_type": pa.array([ctype] * n_rows, type=pa.string()),
            "tile_bucket": pa.array(
                [int(_bucket_of(bounds))] * n_rows, type=pa.int32()
            ),
            "key_part": pa.array(
                [key if key else OTHER_KEY] * n_rows, type=pa.string()
            ),
            "bounds_json": pa.array([bounds_json] * n_rows, type=pa.string()),
            "key": pa.array([key] * n_rows, type=pa.string()),
            "value": pa.array(values, type=pa.string()),
            "meta_json": meta_json,
            "tags_json": tags_json,
            "members_json": members_json,
            "geo_json": geo_json,
        }
    )


def _within(counts: np.ndarray) -> np.ndarray:
    """0..c-1 per run, concatenated (vectorized per-group arange)."""
    import numpy as np

    total = int(counts.sum())
    first = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(total) - np.repeat(first, counts)


def _exclusive_within(sizes: np.ndarray, group_counts: np.ndarray):
    """Per item: sum of preceding items' ``sizes`` WITHIN its group (the
    flat start offset of each hole inside its element's hole region)."""
    import numpy as np

    if not len(sizes):
        return sizes
    cum = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    group_first = np.concatenate([[0], np.cumsum(group_counts)[:-1]])
    base = np.repeat(cum[group_first], group_counts)
    return cum - base


def _entry_signature_rows(entries: list[OmaEntry]) -> list[tuple]:
    return [
        (
            e.chunk_type,
            e.bounds,
            e.key,
            e.value,
            (e.id, e.version, e.timestamp, e.changeset, e.uid, e.user),
            frozenset(e.tags.items()),
            frozenset(e.members),
            e.geo,
        )
        for e in entries
    ]


def read_oma_table(path: str):
    """Dataset-parallel ``.oma`` reader: one Ray decode task per BLOCK →
    Dataset in the partitioned-conversion flat schema
    (``pipelines.oma_out.entries_to_table``), so a ``.oma`` container, the
    partitioned parquet layout and a live conversion are interchangeable
    query inputs.  The driver holds only the chunk table plus each chunk's
    block jump table (one bounded read per chunk — never payload); each
    task seeks and reads exactly its block's byte range.  Parallelism is
    the block count (chunks × keys), which stays high even when an
    extract clusters into few tiles."""
    import ray.data as rd

    from oma_ray.pipelines.oma_out import entries_to_table

    idx = oma_index(path)
    features, zipped = idx["features"], idx["zipped"]
    items = []
    with open(path, "rb") as f:
        for (s, e, ct, b) in idx["chunks"]:
            f.seek(s)
            jump = OmaReader(f.read(4)).read_int()
            f.seek(s + jump)
            rb = OmaReader(f.read(e - s - jump))
            n_blocks = rb.read_small_int()
            blocks = [(rb.read_int(), rb.read_string())
                      for _ in range(n_blocks)]
            offs = sorted(x[0] for x in blocks)
            end_of = {
                o: (offs[i + 1] if i + 1 < len(offs) else jump)
                for i, o in enumerate(offs)
            }
            for boff, key in blocks:
                items.append(
                    {
                        "path": path, "start": s + boff,
                        "end": s + end_of[boff],
                        "ctype": ct, "bounds": list(b), "key": key,
                    }
                )

    def decode_batch(batch) -> "object":
        tables = []
        for row in batch.to_pylist():
            with open(row["path"], "rb") as f:
                f.seek(row["start"])
                buf = f.read(row["end"] - row["start"])
            tables.append(decode_block_columns(
                buf, row["ctype"], tuple(row["bounds"]), row["key"],
                features, zipped,
            ))
        import pyarrow as pa

        return pa.concat_tables(tables)

    if not items:
        return rd.from_arrow(entries_to_table([]))
    return rd.from_items(items).map_batches(
        decode_batch, batch_format="pyarrow", batch_size=1
    )
