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
            entries = decode_block(
                buf, row["ctype"], tuple(row["bounds"]), row["key"],
                features, zipped,
            )
            tables.append(entries_to_table(_entry_signature_rows(entries)))
        import pyarrow as pa

        return pa.concat_tables(tables)

    if not items:
        return rd.from_arrow(entries_to_table([]))
    return rd.from_items(items).map_batches(
        decode_batch, batch_format="pyarrow", batch_size=1
    )
