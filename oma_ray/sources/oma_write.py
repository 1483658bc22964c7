"""Writer for the OMA container format — the inverse of sources/oma_file.py.

Emits the reference's exact byte layout (writer citations in module
docstring of oma_file.py): header with version/features/global-bbox and a
backpatched chunk-table offset (ChunkGenerator.java:196-215), 'c'
compression header + 't' type header with the N/W/A/C key/value tables
(TypeAnalysis.java:288-377), per-chunk block jump tables (one block per
key), per-block slice jump tables (one slice per value), per-slice DEFLATE
with element count + compressed length, delta-coded coordinates resetting
per slice (TypeAnalysis.java:528-674), and the final chunk table.

Byte-identity with the jar is NOT the goal (the jar's tag order is HashMap
iteration order, unreproducible by design); DECODABILITY is: our own
``decode_oma`` — which round-trips jar output — must read this writer's
output back to the identical entry multiset (tests/test_oma_write.py), so
the container is interchangeable at the semantic level the differential
tests check.
"""

from __future__ import annotations

import struct
import zlib

MAXC = 0x7FFFFFFF


class OmaWriter:
    """Append-only buffer with the reference stream primitives
    (OmaOutputStream.java:55-106) + absolute backpatching."""

    def __init__(self):
        self.buf = bytearray()
        self.lastx = 0
        self.lasty = 0

    # --- primitives ---------------------------------------------------------
    def byte(self, v: int):
        self.buf.append(v & 0xFF)

    def raw(self, b: bytes):
        self.buf.extend(b)

    def short(self, v: int):
        self.buf.extend(struct.pack(">h", v))

    def int_(self, v: int):
        self.buf.extend(struct.pack(">i", v))

    def long_(self, v: int):
        self.buf.extend(struct.pack(">q", v))

    def small_int(self, v: int):
        if v < 255:
            self.byte(v)
        elif v < 65535:
            self.byte(255)
            self.buf.extend(struct.pack(">H", v))
        else:
            self.byte(255)
            self.buf.extend(struct.pack(">H", 65535))
            self.int_(v)

    def string(self, s: str):
        b = s.encode("utf-8")
        self.small_int(len(b))
        self.raw(b)

    def reset_delta(self):
        self.lastx = self.lasty = 0

    def _delta(self, v: int, last: int) -> int:
        d = v - last
        if -32767 <= d <= 32767:
            self.short(d)
        else:
            self.short(-32768)
            self.int_(v)
        return v

    def delta_x(self, v: int):
        self.lastx = self._delta(v, self.lastx)

    def delta_y(self, v: int):
        self.lasty = self._delta(v, self.lasty)

    # --- backpatch ----------------------------------------------------------
    def pos(self) -> int:
        return len(self.buf)

    def patch_int(self, at: int, v: int):
        struct.pack_into(">i", self.buf, at, v)

    def patch_long(self, at: int, v: int):
        struct.pack_into(">q", self.buf, at, v)


def _write_element(w: OmaWriter, chunk_type: str, entry: tuple, features: int):
    (_ct, _bounds, _key, _value, meta, tags, members, geo) = entry
    if chunk_type == "N":
        w.delta_x(geo[0])
        w.delta_y(geo[1])
    elif chunk_type == "W":
        w.small_int(len(geo))
        for x, y in geo:
            w.delta_x(x)
            w.delta_y(y)
    elif chunk_type == "A":
        outer, holes = geo
        w.small_int(len(outer))
        for x, y in outer:
            w.delta_x(x)
            w.delta_y(y)
        w.small_int(len(holes))
        for h in holes:
            w.small_int(len(h))
            for x, y in h:
                w.delta_x(x)
                w.delta_y(y)
    else:  # C
        w.small_int(0)

    stags = sorted(tags)
    w.small_int(len(stags))
    for k, v in stags:
        w.string(k)
        w.string(v)
    smembers = sorted(members)
    w.small_int(len(smembers))
    for mid, role, nr in smembers:
        w.long_(mid)
        w.string(role)
        w.small_int(nr)

    mid_, ver, ts, cs, uid, user = meta
    if (features & 1) or chunk_type == "C":
        w.long_(mid_)
    if features & 2:
        w.small_int(ver)
    if features & 4:
        w.long_(ts)
    if features & 8:
        w.long_(cs)
    if features & 16:
        w.int_(uid)
        w.string(user)


def _header_writer(features: int, global_bbox: tuple, cfg,
                   zip_slices: bool) -> tuple[OmaWriter, int]:
    """Container header bytes (must sit at file offset 0: the 'c'/'t'
    header entries encode ABSOLUTE end offsets).  Returns (writer,
    position of the chunk-table offset to backpatch)."""
    w = OmaWriter()
    w.raw(b"OMA")
    w.byte(1)          # format version, matching the reference jar output
    w.byte(features)
    for v in global_bbox:
        w.int_(v)
    table_off_at = w.pos()
    w.long_(0)  # chunk-table offset backpatched at the end

    # 'c' compression header (TypeAnalysis.java:288-302)
    w.byte(ord("c"))
    name = "DEFLATE" if zip_slices else "NONE"
    w.int_(w.pos() + 4 + 1 + len(name))  # abs end: int + smallInt len + text
    w.string(name)

    # 't' type header (TypeAnalysis.java:304-377); optionally deflated
    if cfg is not None:
        tw = OmaWriter()
        tw.small_int(4)
        for section, keys, values in (
            ("N", cfg.node_keys, cfg.node_values),
            ("W", cfg.way_keys, cfg.way_values),
            ("A", cfg.way_keys, cfg.area_values),
            ("C", cfg.coll_keys, cfg.coll_values),
        ):
            tw.byte(ord(section))
            tw.small_int(len(keys))
            for i, k in enumerate(keys):
                tw.string(k)
                tw.small_int(len(values[i]))
                for v in values[i]:
                    tw.string(v)
        payload = bytes(tw.buf)
        w.byte(ord("t") + (128 if zip_slices else 0))
        patch_at = w.pos()
        w.int_(0)
        if zip_slices:
            w.int_(0)
            z = zlib.compress(payload, 9)
            w.raw(z)
            w.patch_int(patch_at, w.pos())
            w.patch_int(patch_at + 4, w.pos() - patch_at - 8)
        else:
            w.raw(payload)
            w.patch_int(patch_at, w.pos())
    w.byte(0)  # end of header entries
    return w, table_off_at


def _write_chunks_for_type(
    w: OmaWriter,
    ctype: str,
    entries: list[tuple],
    chunk_table: list,
    features: int,
    zip_slices: bool,
    base: int = 0,
    chunk_max_elements: int | None = None,
):
    """Write all chunks of one chunk type from ``entries`` (entry order;
    bounds groups in first-seen order) into ``w``.  All in-chunk jump
    offsets are RELATIVE, so ``w`` may be a fresh per-segment buffer —
    ``base`` is the segment's absolute file offset for the chunk table.

    ``chunk_max_elements`` caps a chunk's element count: a bounds group
    above the cap splits into CONTINUATION chunks — consecutive chunk-
    table rows with IDENTICAL (type, bounds), each a complete chunk with
    its own jump/block/slice tables and fresh delta state.  This is the
    reference's memory-pressure early flush (TypeAnalysis.java:499-514:
    ``memavail() < memlimit`` mid-chunk → writeBlocks, clear, open a
    same-bounds chunk, resetDelta) with a deterministic element
    threshold instead of a heap probe — the Ray-native analogue, since
    real memory pressure here is owned by object-store backpressure.
    Readers already treat the chunk table as a list, not a map, so
    duplicate-bounds chunks decode as independent chunks (verified
    against jar-produced continuation files in tests)."""
    bounds_order: list[tuple] = []
    by_bounds: dict[tuple, list[tuple]] = {}
    for e in entries:
        if e[1] not in by_bounds:
            by_bounds[e[1]] = []
            bounds_order.append(e[1])
        by_bounds[e[1]].append(e)
    cap = chunk_max_elements
    runs: list[tuple[tuple, list[tuple]]] = []
    for bounds in bounds_order:
        grp = by_bounds[bounds]
        if cap is None or len(grp) <= cap:
            runs.append((bounds, grp))
        else:
            for s in range(0, len(grp), cap):
                runs.append((bounds, grp[s:s + cap]))
    for bounds, chunk_entries in runs:
        chunk_start = w.pos()
        chunk_table.append((base + chunk_start, ctype, bounds))
        w.int_(0)  # jump to the block table, backpatched

        key_order: list[str] = []
        by_key: dict[str, list[tuple]] = {}
        for e in chunk_entries:
            if e[2] not in by_key:
                by_key[e[2]] = []
                key_order.append(e[2])
            by_key[e[2]].append(e)
        # "other" block last, like writeOtherBlock (TypeAnalysis.java:569)
        korder = {k: i for i, k in enumerate(key_order)}
        key_order.sort(key=lambda k: (k == "", korder[k]))

        block_offsets: list[tuple[int, str]] = []
        for key in key_order:
            block_start = w.pos()
            block_offsets.append((block_start - chunk_start, key))
            w.int_(0)  # jump to the slice table, backpatched

            value_order: list[str] = []
            by_value: dict[str, list[tuple]] = {}
            for e in by_key[key]:
                if e[3] not in by_value:
                    by_value[e[3]] = []
                    value_order.append(e[3])
                by_value[e[3]].append(e)
            vorder = {v: i for i, v in enumerate(value_order)}
            value_order.sort(key=lambda v: (v == "", vorder[v]))

            slice_offsets: list[tuple[int, str]] = []
            for value in value_order:
                elems = by_value[value]
                slice_offsets.append((w.pos() - block_start, value))
                w.int_(len(elems))
                if zip_slices:
                    sw = OmaWriter()
                    for e in elems:
                        _write_element(sw, ctype, e, features)
                    z = zlib.compress(bytes(sw.buf), 9)
                    w.int_(len(z))
                    w.raw(z)
                else:
                    w.reset_delta()
                    for e in elems:
                        _write_element(w, ctype, e, features)

            w.patch_int(block_start, w.pos() - block_start)
            w.small_int(len(slice_offsets))
            for off, value in slice_offsets:
                w.int_(off)
                w.string(value)

        w.patch_int(chunk_start, w.pos() - chunk_start)
        w.small_int(len(block_offsets))
        for off, key in block_offsets:
            w.int_(off)
            w.string(key)


def write_oma(
    path: str,
    entries: list[tuple],
    cfg=None,
    *,
    features: int = 31,
    zip_slices: bool = True,
    global_bbox: tuple | None = None,
    chunk_max_elements: int | None = None,
) -> str:
    """Write convert_osm-style entry tuples as a .oma container.

    ``cfg`` (a stages.classify.TypeConfig) feeds the embedded type header
    (K4); chunk order follows the reference's N→W→A→C emission.
    ``chunk_max_elements`` enables continuation chunks (see
    ``_write_chunks_for_type``).
    """
    if global_bbox is None:
        pts = [e[1] for e in entries if e[1][0] != MAXC]
        if pts:
            global_bbox = (
                min(p[0] for p in pts), min(p[1] for p in pts),
                max(p[2] for p in pts), max(p[3] for p in pts),
            )
        else:
            global_bbox = (MAXC, MAXC, MAXC, MAXC)
    w, table_off_at = _header_writer(features, global_bbox, cfg, zip_slices)

    # group entries into chunks (N→W→A→C, bounds in first-seen order), then
    # blocks per key, slices per value — all in entry order
    chunk_table: list[tuple[int, str, tuple]] = []
    for ctype in "NWAC":
        _write_chunks_for_type(
            w, ctype, [e for e in entries if e[0] == ctype], chunk_table,
            features, zip_slices,
            chunk_max_elements=chunk_max_elements,
        )

    # chunk table + header backpatch (ChunkGenerator.java:578-592)
    table_off = w.pos()
    w.int_(len(chunk_table))
    for start, ctype, bounds in chunk_table:
        w.long_(start)
        w.byte(ord(ctype))
        for v in bounds:
            w.int_(v)
    w.patch_long(table_off_at, table_off)

    with open(path, "wb") as f:
        f.write(bytes(w.buf))
    return path


def _segment_bytes(data_dir: str, ctype: str, bucket: int, features: int,
                   zip_slices: bool):
    """One (chunk_type, tile_bucket) partition → (chunk bytes, chunk-table
    rows with segment-RELATIVE starts).  Pure function of the partition
    files — safe to run as a Ray task (the per-slice DEFLATE here is the
    dominant assembly cost, and segments are independent)."""
    import pyarrow.dataset as pads

    from oma_ray.pipelines.oma_out import table_to_entries

    dset = pads.dataset(data_dir, format="parquet", partitioning="hive")
    t = dset.to_table(
        filter=(
            (pads.field("chunk_type") == ctype)
            & (pads.field("tile_bucket") == bucket)
        )
    )
    entries = table_to_entries(t)
    if not entries:
        return b"", []
    w = OmaWriter()
    table: list[tuple[int, str, tuple]] = []
    _write_chunks_for_type(w, ctype, entries, table, features, zip_slices,
                           base=0)
    return bytes(w.buf), table


def write_oma_from_dir(dir_path: str, out_path: str, *, features: int = 31,
                       zip_slices: bool = True,
                       parallel: bool | None = None) -> str:
    """Streaming container assembly from a partitioned conversion directory
    (pipelines/oma_out layout, as written by ``convert_pbf_to_dir``).

    Each (chunk_type, tile_bucket) partition becomes one SEGMENT of chunk
    bytes, built by a Ray task (per-slice DEFLATE is the dominant cost and
    segments are independent); the driver appends segments to the file in
    deterministic order with a bounded window of futures in flight, so peak
    driver memory is a few segments (~1/64 of the dataset each), never the
    whole entry set — unlike ``write_oma``'s single driver buffer (the
    reference bounds this with spill files + memory-pressure splits,
    Reunify.java:98-100 / TypeAnalysis.java:499-514; the partitioned layout
    makes the bound a property of the read).  The chunk table accumulates
    (it is #chunks-sized) and backpatches the header offset at the end,
    like ChunkGenerator.java:578-592.  ``parallel=False`` forces the serial
    in-process path (no Ray session needed).
    """
    import glob
    import json
    import os
    import struct

    import pyarrow.dataset as pads

    from oma_ray.stages.classify import TypeConfig

    cfg = None
    cfg_path = os.path.join(dir_path, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            type_text = json.load(f).get("type_config", "")
        if type_text:
            cfg = TypeConfig.parse(type_text)

    data_dir = os.path.join(dir_path, "data")
    dset = pads.dataset(data_dir, format="parquet", partitioning="hive")

    # global bbox from the distinct chunk bounds (cheap: one narrow column)
    bjson = dset.to_table(columns=["bounds_json"]).column("bounds_json")
    bounds_set = {tuple(json.loads(s)) for s in bjson.to_pylist()}
    real = [b for b in bounds_set if b[0] != MAXC]
    global_bbox = (
        (min(b[0] for b in real), min(b[1] for b in real),
         max(b[2] for b in real), max(b[3] for b in real))
        if real else (MAXC, MAXC, MAXC, MAXC)
    )

    segments = []
    for ctype in "NWAC":
        for b in sorted(
            {
                int(os.path.basename(p).split("=", 1)[1])
                for p in glob.glob(
                    f"{data_dir}/*/chunk_type={ctype}/tile_bucket=*"
                )
            }
        ):
            segments.append((ctype, b))

    if parallel is None:
        import ray

        parallel = ray.is_initialized()

    hdr, table_off_at = _header_writer(features, global_bbox, cfg, zip_slices)
    chunk_table: list[tuple[int, str, tuple]] = []
    with open(out_path, "wb") as f:
        f.write(bytes(hdr.buf))
        pos = len(hdr.buf)

        if parallel:
            import ray

            seg_task = ray.remote(_segment_bytes)
            window = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))
            pending: list = []
            next_submit = 0
            # consume in submission order (deterministic file layout) with
            # at most `window` segment futures in flight — bounded object
            # store footprint at planet scale
            for i in range(len(segments)):
                while next_submit < len(segments) and (
                    next_submit - i < window
                ):
                    ctype, b = segments[next_submit]
                    pending.append(
                        seg_task.remote(
                            data_dir, ctype, b, features, zip_slices
                        )
                    )
                    next_submit += 1
                buf, table = ray.get(pending[i])
                pending[i] = None  # drop the ref → object store reclaims
                for start, ct2, bounds in table:
                    chunk_table.append((pos + start, ct2, bounds))
                f.write(buf)
                pos += len(buf)
        else:
            for ctype, b in segments:
                buf, table = _segment_bytes(
                    data_dir, ctype, b, features, zip_slices
                )
                for start, ct2, bounds in table:
                    chunk_table.append((pos + start, ct2, bounds))
                f.write(buf)
                pos += len(buf)

        tw = OmaWriter()
        tw.int_(len(chunk_table))
        for start, ctype, bounds in chunk_table:
            tw.long_(start)
            tw.byte(ord(ctype))
            for v in bounds:
                tw.int_(v)
        table_off = pos
        f.write(bytes(tw.buf))
        f.seek(table_off_at)
        f.write(struct.pack(">q", table_off))
    return out_path
