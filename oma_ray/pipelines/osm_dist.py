"""Distributed reunify: the OSM conversion's three joins as Dataset ops.

``pipelines/osm.py`` wires the conformance semantics with driver-side dicts
(exact, golden-tested, but it would OOM the driver on a planet file).  This
module re-expresses the same dataflow Ray-Data-first, per SURVEY §2.5:

- J1 (way.nds ⟕ nodes, Reunify.java:434-447): explode way refs →
  ``hash_join`` with the node (id, lon, lat) dataset → keyed repartition on
  way_id → per-block ordered reassembly.  Misses become 0x7fffffff coords
  (README.md:35) — the hash join replaces the reference's windowed
  multi-pass file rewrites (Reunify.java:467-531), the single biggest
  algorithmic win of the rebuild.
- J2 (relation.members ⟕ ways, Reunify.java:676-841): same shape against
  the assembled way geometries; unresolved way members drop, unresolved
  restriction via-NODES keep their marked-id bytes as garbage coords
  (pipelines/osm._marked_point).
- J3 (reverse membership, Reunify.java:887-930): leftover (collection)
  members explode → keyed repartition on (member_type, ref) → per-block
  list building, joined back at emission.

Per-relation assembly (ring nesting, FromTo stitching) and classification
reuse the exact per-element kernels from functions/rings.py and
stages/classify.py inside ``map_batches`` blocks — groups are co-located by
relation id, so within-block assembly == global assembly.

Nested payloads (tags, member lists, geometry) travel as JSON string
columns across the shuffles: every exchange stays plain Arrow, and no
pandas object-column surprises in the combine steps.

Scale notes: all exchanges key on element ids (well-distributed);
partition counts come from cluster size; nothing materializes on the
driver except the final entry collection (which callers at real scale
replace with a partitioned write).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from oma_ray.functions.rings import assemble_areas, from_to_ways
from oma_ray.pipelines.osm import MAXC, NO_BOUNDS, _marked_point, _meta_sig, _norm_ring
from oma_ray.stages.classify import TypeConfig, classify_plain, classify_way_split
from oma_ray.stages.tiles import BbsGrid

_META_COLS = ("id", "version", "timestamp", "changeset", "uid", "user")


class _PhaseTimer:
    """Wall-clock phase logger for the conversion build, enabled by
    ``OMA_RAY_TIMING=1`` (stderr; off by default — used to attribute time
    between the eager sub-steps when profiling at scale)."""

    def __init__(self, tag: str):
        import os
        import time

        self.on = os.environ.get("OMA_RAY_TIMING") == "1"
        self.tag = tag
        self.t = time.time() if self.on else 0.0

    def mark(self, phase: str):
        if self.on:
            import sys
            import time

            now = time.time()
            print(f"[timing] {self.tag}: {phase} {now - self.t:.2f}s",
                  file=sys.stderr)
            self.t = now


class EntryStreams(dict):
    """Entry-stream dict (node/way/rel/coll, the reference's N→W→A→C
    emission order).  ``fused=True`` marks every stream exchange-free
    (fused task chains / driver tables), letting the partitioned writer
    union them into a single DAG (oma_out.write_entry_streams)."""

    fused = False


def _elements_table(elems: list[dict], kind: str) -> pa.Table:
    """Element dicts → the per-kind wire schema.  Nodes (the planet-scale
    bulk) carry tags as native list columns — their whole pipeline avoids
    Acero, so nothing forces JSON; ways/relations keep JSON strings for the
    columns that cross Acero joins (pyarrow 16 rejects nested payload)."""
    cols = {
        "id": pa.array([e["id"] for e in elems], type=pa.int64()),
        "version": pa.array([e["version"] for e in elems], type=pa.int32()),
        "timestamp": pa.array([e["timestamp"] for e in elems], type=pa.int64()),
        "changeset": pa.array([e["changeset"] for e in elems], type=pa.int64()),
        "uid": pa.array([e["uid"] for e in elems], type=pa.int32()),
        "user": pa.array([e["user"] for e in elems], type=pa.string()),
    }
    if kind in ("node", "way"):
        cols["tag_keys"] = pa.array(
            [list(e["tags"].keys()) for e in elems],
            type=pa.list_(pa.string()),
        )
        cols["tag_vals"] = pa.array(
            [list(e["tags"].values()) for e in elems],
            type=pa.list_(pa.string()),
        )
        if kind == "node":
            cols["lon"] = pa.array([e["lon"] for e in elems], type=pa.int64())
            cols["lat"] = pa.array([e["lat"] for e in elems], type=pa.int64())
        else:
            cols["refs"] = pa.array(
                [e["refs"] for e in elems], type=pa.list_(pa.int64())
            )
        return pa.table(cols)
    cols["tags_json"] = pa.array(
        [json.dumps(sorted(e["tags"].items())) for e in elems],
        type=pa.string(),
    )
    cols["members_json"] = pa.array(
        [json.dumps([list(m) for m in e["members"]]) for e in elems],
        type=pa.string(),
    )
    return pa.table(cols)


def _tags_of(row) -> dict:
    return dict(json.loads(row["tags_json"]))


def _combined(col):
    """ChunkedArray → contiguous Array (no-op otherwise)."""
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _way_geo_columns(klon: np.ndarray, klat: np.ndarray,
                     offsets: np.ndarray) -> dict:
    """Flat per-way coords (already grouped; misses substituted with MAXC)
    + per-way offsets → the geometry wire columns: ``geo_json`` strings
    (Arrow kernels), bbox, point count, closed flag.  Shared by the joined
    reassembly and the fused broadcast attach."""
    import pyarrow.compute as pc

    from oma_ray.functions.jsonvec import json_point_pairs

    counts = np.diff(offsets)
    nways = len(counts)
    pts = json_point_pairs(
        pa.array(klon, type=pa.int64()), pa.array(klat, type=pa.int64())
    )
    lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pts)
    geos = pc.binary_join_element_wise("[", pc.binary_join(lst, ","), "]", "")
    nonempty = counts > 0
    s2 = offsets[:-1][nonempty]
    minx = np.full(nways, MAXC, dtype=np.int64)
    miny = np.full(nways, MAXC, dtype=np.int64)
    maxx = np.full(nways, MAXC, dtype=np.int64)
    maxy = np.full(nways, MAXC, dtype=np.int64)
    if nonempty.any():
        minx[nonempty] = np.minimum.reduceat(klon, s2)
        miny[nonempty] = np.minimum.reduceat(klat, s2)
        maxx[nonempty] = np.maximum.reduceat(klon, s2)
        maxy[nonempty] = np.maximum.reduceat(klat, s2)
    closed = np.zeros(nways, dtype=bool)
    ge3 = counts >= 3
    if ge3.any():
        first = offsets[:-1][ge3]
        last = offsets[1:][ge3] - 1
        closed[ge3] = (klon[first] == klon[last]) & (klat[first] == klat[last])
    return {
        "geo_json": geos,
        "g_minx": pa.array(minx, type=pa.int64()),
        "g_miny": pa.array(miny, type=pa.int64()),
        "g_maxx": pa.array(maxx, type=pa.int64()),
        "g_maxy": pa.array(maxy, type=pa.int64()),
        "g_npts": pa.array(counts.astype(np.int32), type=pa.int32()),
        "g_closed": pa.array(closed, type=pa.bool_()),
    }


def _entry_schema() -> pa.Table:
    return pa.table(
        {
            "chunk_type": pa.array([], type=pa.string()),
            "tile": pa.array([], type=pa.int32()),
            "key": pa.array([], type=pa.string()),
            "value": pa.array([], type=pa.string()),
            "meta_json": pa.array([], type=pa.string()),
            "tags_json": pa.array([], type=pa.string()),
            "members_json": pa.array([], type=pa.string()),
            "geo_json": pa.array([], type=pa.string()),
        }
    )


def _entries_table(rows: list[tuple]) -> pa.Table:
    if not rows:
        return _entry_schema()
    ct, tile, key, value, meta, tags, members, geo = zip(*rows)
    return pa.table(
        {
            "chunk_type": pa.array(ct, type=pa.string()),
            "tile": pa.array(tile, type=pa.int32()),
            "key": pa.array(key, type=pa.string()),
            "value": pa.array(value, type=pa.string()),
            "meta_json": pa.array(meta, type=pa.string()),
            "tags_json": pa.array(tags, type=pa.string()),
            "members_json": pa.array(members, type=pa.string()),
            "geo_json": pa.array(geo, type=pa.string()),
        }
    )


def element_datasets_from_unified(elements_ds):
    """The unified element table (``sources/pbf.read_pbf_table`` schema:
    list columns for refs/members/tags) → the three per-kind datasets the
    distributed conversion consumes.  Fully vectorized (no ``to_pylist``):
    nodes keep native tag list columns; way/relation JSON wire columns are
    built with the Arrow kernels in functions/jsonvec.  One fused map per
    kind; at planet scale the unified dataset should be staged to parquet
    once and read back three times instead of re-decoding blobs per
    branch."""
    import pyarrow.compute as pc

    from oma_ray.functions.jsonvec import (
        json_member_lists,
        json_string_pair_lists,
    )

    def conv(kind: str):
        def f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("kind"), kind)).combine_chunks()
            cols = {c: t.column(c) for c in _META_COLS}
            if kind in ("node", "way"):
                cols["tag_keys"] = t.column("tag_keys")
                cols["tag_vals"] = t.column("tag_vals")
                if kind == "node":
                    cols["lon"] = pc.cast(t.column("lon"), pa.int64())
                    cols["lat"] = pc.cast(t.column("lat"), pa.int64())
                else:
                    cols["refs"] = t.column("refs")
                return pa.table(cols)
            cols["tags_json"] = json_string_pair_lists(
                t.column("tag_keys"), t.column("tag_vals")
            )
            cols["members_json"] = json_member_lists(
                t.column("member_types"), t.column("member_refs"),
                t.column("member_roles"),
            )
            return pa.table(cols)

        return elements_ds.map_batches(f, batch_format="pyarrow")

    return conv("node"), conv("way"), conv("relation")


def convert_pbf_distributed(path: str, bbs_text: str, cfg: TypeConfig,
                            **kwargs) -> list[tuple]:
    """End-to-end scale path: PBF blobs decode in parallel tasks
    (sources/pbf.read_pbf_table) and feed the distributed conversion — no
    driver-side element lists anywhere."""
    from oma_ray.sources.pbf import read_pbf_table

    unified = read_pbf_table(path).materialize()
    nodes_ds, ways_ds, rels_ds = element_datasets_from_unified(unified)
    kwargs.setdefault("est_bytes", unified.size_bytes())
    return convert_datasets_distributed(
        nodes_ds, ways_ds, rels_ds, bbs_text, cfg, **kwargs
    )


def convert_pbf_to_dir(
    path: str,
    bbs_text: str,
    cfg: TypeConfig,
    out_dir: str,
    *,
    type_text: str = "",
    preserve: set | None = None,
    one_element: bool = False,
    **kwargs,
) -> str:
    """THE scale path end-to-end: PBF blobs → distributed reunify → entry
    STREAMS → keyed partitioned parquet, with no ``take_all``/``to_pandas``
    of any entry stream anywhere (VERDICT r02 next-step #1).  Read back via
    ``pipelines.oma_out.read_entries``; resumable per stream through the
    output manifest."""
    from oma_ray.pipelines.oma_out import write_entry_streams
    from oma_ray.sources.pbf import read_pbf_table

    unified = read_pbf_table(path).materialize()
    nodes_ds, ways_ds, rels_ds = element_datasets_from_unified(unified)
    kwargs.setdefault("est_bytes", unified.size_bytes())
    streams, boxes = convert_datasets_entry_streams(
        nodes_ds, ways_ds, rels_ds, bbs_text, cfg,
        preserve=preserve, one_element=one_element, **kwargs,
    )
    return write_entry_streams(
        streams, boxes, out_dir, type_text=type_text, bbs_text=bbs_text
    )


def convert_osm_distributed(
    nodes: list[dict],
    ways: list[dict],
    rels: list[dict],
    bbs_text: str,
    cfg: TypeConfig,
    *,
    preserve: set | None = None,
    one_element: bool = False,
    **kwargs,
) -> list[tuple]:
    """Same contract and output multiset as ``convert_osm`` — but J1/J2/J3,
    classification and tile assignment run as Ray Dataset stages."""
    import ray.data as rd

    tn = _elements_table(nodes, "node")
    tw = _elements_table(ways, "way")
    tr = _elements_table(rels, "relation")
    kwargs.setdefault("est_bytes", tn.nbytes + tw.nbytes + tr.nbytes)
    return convert_datasets_distributed(
        rd.from_arrow(tn), rd.from_arrow(tw), rd.from_arrow(tr),
        bbs_text, cfg, preserve=preserve, one_element=one_element, **kwargs,
    )


def convert_datasets_distributed(
    nodes_ds,
    ways_ds,
    rels_ds,
    bbs_text: str,
    cfg: TypeConfig,
    *,
    preserve: set | None = None,
    one_element: bool = False,
    **kwargs,
) -> list[tuple]:
    """Driver-collected form of the distributed conversion (fixture-scale
    parity tests; scale callers use ``convert_pbf_to_dir`` which writes the
    streams without collecting them)."""
    streams, boxes = convert_datasets_entry_streams(
        nodes_ds, ways_ds, rels_ds, bbs_text, cfg,
        preserve=preserve, one_element=one_element, **kwargs,
    )
    return entries_from_streams(streams, boxes)


def convert_datasets_entry_streams(
    nodes_ds,
    ways_ds,
    rels_ds,
    bbs_text: str,
    cfg: TypeConfig,
    *,
    preserve: set | None = None,
    one_element: bool = False,
    memb_broadcast_max: int = 2_000_000,
    est_bytes: int | None = None,
    node_broadcast_max_bytes: int = 1 << 30,
):
    """The distributed conversion as LAZY entry streams: → ({"node": ds,
    "way": ds, "rel": ds, "coll": ds} in the reference's N→W→A→C emission
    order, boxes).  Nothing entry-scale touches the driver; the only
    driver-side state is the reverse-membership map, and only when it is
    under ``memb_broadcast_max`` rows (the join path takes over above)."""
    import ray
    import ray.data as rd

    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import ensure_hash_shuffle
    from oma_ray.stages.join import hash_join
    from oma_ray.synth import parse_bbs

    ensure_hash_shuffle()
    _pt = _PhaseTimer("entry_streams")
    # two partition regimes: joins/regroups that move RAW element rows use
    # ~2× cores so per-partition blocks stay bounded at scale; exchanges of
    # bounded/pre-grouped streams (membership build) keep cores/2
    from oma_ray.cluster import fact_partitions

    nparts = default_partitions()
    # raw-row exchanges sized from the input estimate (caller-supplied:
    # the materialized unified dataset's size_bytes, or driver table
    # nbytes), floored at cores/2 — see cluster.fact_partitions
    nparts_fact = fact_partitions(est_bytes)
    preserve = preserve if preserve is not None else {
        "id", "version", "timestamp", "changeset", "user"
    }

    # --- node locations: broadcast vs join regime ---------------------------
    # The reference ITSELF keeps node locations as in-RAM arrays sized by
    # its node-density heuristic (Reunify.java:112-128) — under
    # ``node_broadcast_max_bytes`` of input we make the same assumption:
    # collect (id, lon, lat) once, sort by id, broadcast, and every
    # coordinate attach becomes a fused searchsorted stage with ZERO
    # exchanges.  Above the threshold (a planet file) the hash-join path
    # takes over unchanged.
    def _loc_proj(b: pa.Table) -> pa.Table:
        return b.select(["id", "lon", "lat"])

    node_loc = nodes_ds.map_batches(_loc_proj, batch_format="pyarrow")
    node_bcast = (
        est_bytes is not None and est_bytes <= node_broadcast_max_bytes
    )
    nl_ref = None
    if node_bcast:
        tbls = [t for t in ray.get(node_loc.to_arrow_refs()) if len(t)]
        if tbls:
            nl = pa.concat_tables(tbls).combine_chunks()
            _ids = nl.column("id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            _o = np.argsort(_ids, kind="stable")
            _lon = nl.column("lon").to_numpy(zero_copy_only=False).astype(
                np.int64
            )[_o]
            _lat = nl.column("lat").to_numpy(zero_copy_only=False).astype(
                np.int64
            )[_o]
            nl_ref = ray.put({"ids": _ids[_o], "lon": _lon, "lat": _lat})
            global_bbox = (
                int(_lon.min()), int(_lat.min()),
                int(_lon.max()), int(_lat.max()),
            )
        else:
            nl_ref = ray.put(
                {
                    "ids": np.empty(0, dtype=np.int64),
                    "lon": np.empty(0, dtype=np.int64),
                    "lat": np.empty(0, dtype=np.int64),
                }
            )
            global_bbox = (
                -1_800_000_000, -900_000_000, 1_800_000_000, 900_000_000
            )
    else:
        # A1: global bbox as a distributed min/max aggregate
        from ray.data.aggregate import Max, Min

        agg = nodes_ds.aggregate(
            Min("lon"), Max("lon"), Min("lat"), Max("lat")
        )
        if agg and agg.get("min(lon)") is not None:
            global_bbox = (
                int(agg["min(lon)"]), int(agg["min(lat)"]),
                int(agg["max(lon)"]), int(agg["max(lat)"]),
            )
        else:
            global_bbox = (
                -1_800_000_000, -900_000_000, 1_800_000_000, 900_000_000
            )

    _pt.mark("node-loc state (broadcast collect or bbox agg)")
    grid = BbsGrid(parse_bbs(bbs_text, global_bbox))
    boxes = [tuple(b) for b in grid.boxes]
    miss = len(boxes)
    grid_ref = ray.put(grid)

    class _CoordLookup:
        """Broadcast sorted node-coordinate lookup: flat int64 refs →
        (lon, lat), misses → MAXC (README.md:35)."""

        def __init__(self, ref):
            st = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.ids = st["ids"]
            self.lon = st["lon"]
            self.lat = st["lat"]

        def coords(self, refs: np.ndarray):
            if not len(self.ids):
                full = np.full(len(refs), MAXC, dtype=np.int64)
                return full, full.copy(), np.zeros(len(refs), dtype=bool)
            p = np.searchsorted(self.ids, refs)
            pc_ = np.minimum(p, len(self.ids) - 1)
            found = self.ids[pc_] == refs
            lon = np.where(found, self.lon[pc_], MAXC)
            lat = np.where(found, self.lat[pc_], MAXC)
            return lon, lat, found

    # --- J1: way geometries via explode + hash join -------------------------
    def explode_refs(batch: pa.Table) -> pa.Table:
        """Vectorized explode of the native ``refs`` list column: way_id
        repeats by list length, ref_idx counts within each way; zero-ref
        ways get a (-1, 0) sentinel row so they still produce an (empty)
        geometry."""
        batch = batch.combine_chunks()
        refs_col = batch.column("refs")
        refs_col = (
            refs_col.combine_chunks()
            if isinstance(refs_col, pa.ChunkedArray) else refs_col
        )
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        off = refs_col.offsets.to_numpy(zero_copy_only=False)
        off = off - off[0]
        counts = np.diff(off)
        flat = refs_col.flatten().to_numpy(zero_copy_only=False)
        wid = np.repeat(ids, counts)
        idx = (np.arange(len(flat)) - np.repeat(off[:-1], counts)).astype(
            np.int32
        )
        empty = counts == 0
        if empty.any():
            wid = np.concatenate([wid, ids[empty]])
            idx = np.concatenate(
                [idx, np.full(empty.sum(), -1, dtype=np.int32)]
            )
            flat = np.concatenate(
                [flat, np.zeros(empty.sum(), dtype=np.int64)]
            )
        return pa.table(
            {
                "way_id": pa.array(wid, type=pa.int64()),
                "ref_idx": pa.array(idx, type=pa.int32()),
                "ref": pa.array(flat, type=pa.int64()),
            }
        )

    from oma_ray.stages.taskcache import CachedStage

    if node_bcast:
        # FUSED J1: a ways batch explodes, attaches coords by searchsorted
        # against the broadcast node arrays, and reassembles — all inside
        # one map (the refs of a way are contiguous and complete within
        # their batch, so no exchange is needed to co-locate them)
        class _WayGeoFused:
            def __init__(self, ref):
                self.look = _CoordLookup(ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                b = b.combine_chunks()
                refs_col = _combined(b.column("refs"))
                off = refs_col.offsets.to_numpy(zero_copy_only=False)
                off = off - off[0]
                flat = refs_col.flatten().to_numpy(zero_copy_only=False)
                lon, lat, _f = self.look.coords(
                    np.asarray(flat, dtype=np.int64)
                )
                out = b
                for name, arr in _way_geo_columns(lon, lat, off).items():
                    out = out.append_column(name, arr)
                return out

        ways_with_geo = ways_ds.map_batches(
            CachedStage(_WayGeoFused, nl_ref), batch_format="pyarrow"
        )

        def _as_way_geo(b: pa.Table) -> pa.Table:
            return pa.table(
                {"way_id": b.column("id"), "geo_json": b.column("geo_json")}
            )

        way_geo_narrow = ways_with_geo.map_batches(
            _as_way_geo, batch_format="pyarrow"
        )
    else:
        exploded = ways_ds.map_batches(explode_refs, batch_format="pyarrow")
        j1 = hash_join(
            exploded, node_loc, on="ref", right_on="id",
            join_type="left_outer", num_partitions=nparts_fact,
        )

        def reassemble(batch: pa.Table) -> pa.Table:
            """Vectorized per-way geometry reassembly after the J1
            exchange: lexsort by (way_id, ref_idx), unresolved refs → MAXC
            coords (README.md:35), then the shared geo-column builder."""
            if not len(batch):
                return pa.table(
                    {
                        "way_id": pa.array([], type=pa.int64()),
                        "geo_json": pa.array([], type=pa.string()),
                        "g_minx": pa.array([], type=pa.int64()),
                        "g_miny": pa.array([], type=pa.int64()),
                        "g_maxx": pa.array([], type=pa.int64()),
                        "g_maxy": pa.array([], type=pa.int64()),
                        "g_npts": pa.array([], type=pa.int32()),
                        "g_closed": pa.array([], type=pa.bool_()),
                    }
                )
            batch = batch.combine_chunks()
            w = batch.column("way_id").to_numpy(zero_copy_only=False)
            ridx = batch.column("ref_idx").to_numpy(zero_copy_only=False)
            lon = batch.column("lon").to_numpy(zero_copy_only=False)
            lat = batch.column("lat").to_numpy(zero_copy_only=False)
            order = np.lexsort((ridx, w))
            w, ridx = w[order], ridx[order]
            lon = np.asarray(lon, dtype=np.float64)[order]
            lat = np.asarray(lat, dtype=np.float64)[order]
            lon = np.where(np.isnan(lon), MAXC, lon).astype(np.int64)
            lat = np.where(np.isnan(lat), MAXC, lat).astype(np.int64)
            starts = np.concatenate(
                [[0], np.nonzero(w[1:] != w[:-1])[0] + 1]
            )
            wids = w[starts]
            keep = ridx >= 0  # drop zero-ref sentinel rows
            kept_counts = np.add.reduceat(keep.astype(np.int64), starts)
            offsets = np.concatenate([[0], np.cumsum(kept_counts)])
            cols = {"way_id": pa.array(wids, type=pa.int64())}
            cols.update(
                _way_geo_columns(lon[keep], lat[keep], offsets)
            )
            return pa.table(cols)

        way_geo = (
            j1.repartition(nparts_fact, keys=["way_id"])
            .map_batches(reassemble, batch_format="pyarrow")
            .materialize()
        )
        # (materialize: consumed by both the way-emission join and the J2
        # member join — and it caps how many hash-join aggregator pools
        # the streaming executor has to co-schedule in one DAG)

        def _geo_narrow(b: pa.Table) -> pa.Table:
            return b.select(["way_id", "geo_json"])

        way_geo_narrow = way_geo.map_batches(
            _geo_narrow, batch_format="pyarrow"
        )
    _way_geo_narrow_schema = pa.schema(
        [("way_id", pa.int64()), ("geo_json", pa.string())]
    )

    # --- relation routing (one pass; produces typed member streams) --------
    def route(batch: pa.Table) -> pa.Table:
        """Per relation: which member indices each route consumes
        (Reunify.java:283-373); leftover members feed J3 + collections."""
        out = {
            "rel_id": [], "route": [], "m_idx": [], "mtype": [], "ref": [],
            "role": [], "pos": [],
        }
        for row in batch.to_pylist():
            members = json.loads(row["members_json"])
            rtype = dict(json.loads(row["tags_json"])).get("type")
            consumed = set()
            if rtype in ("multipolygon", "boundary"):
                for i, (mtype, ref, role) in enumerate(members):
                    if mtype == "way" and role in ("outer", "inner"):
                        consumed.add(i)
                        out["rel_id"].append(row["id"])
                        out["route"].append("area")
                        out["m_idx"].append(i)
                        out["mtype"].append(mtype)
                        out["ref"].append(ref)
                        out["role"].append(role)
                        out["pos"].append(i)
            if rtype in ("restriction", "destination_sign"):
                for i, (mtype, ref, role) in enumerate(members):
                    if (mtype == "way" and role in ("from", "to", "via", "intersection")) or (
                        mtype == "node" and role in ("via", "intersection")
                    ):
                        consumed.add(i)
                        out["rel_id"].append(row["id"])
                        out["route"].append("restr")
                        out["m_idx"].append(i)
                        out["mtype"].append(mtype)
                        out["ref"].append(ref)
                        out["role"].append(role)
                        out["pos"].append(i)
            li = 0
            for i, (mtype, ref, role) in enumerate(members):
                if i in consumed:
                    continue
                out["rel_id"].append(row["id"])
                out["route"].append("leftover")
                out["m_idx"].append(i)
                out["mtype"].append(mtype)
                out["ref"].append(ref)
                out["role"].append(role)
                out["pos"].append(li)  # position in the leftover list
                li += 1
        return pa.table(
            {
                "rel_id": pa.array(out["rel_id"], type=pa.int64()),
                "route": pa.array(out["route"], type=pa.string()),
                "m_idx": pa.array(out["m_idx"], type=pa.int32()),
                "mtype": pa.array(out["mtype"], type=pa.string()),
                "ref": pa.array(out["ref"], type=pa.int64()),
                "role": pa.array(out["role"], type=pa.string()),
                "pos": pa.array(out["pos"], type=pa.int32()),
            }
        )

    routed = rels_ds.map_batches(route, batch_format="pyarrow").materialize()
    # (materialize: the routed member stream is consumed by four downstream
    # branches; relations are the small stream — ~1% of a planet file)
    _pt.mark("routed materialize")

    # empty element classes are legal (nodes-only extracts): Ray reports
    # schema()=None for 0-row datasets, so every join over a possibly-empty
    # side gets its statically-known schema
    _routed_schema = pa.schema(
        [
            ("rel_id", pa.int64()), ("route", pa.string()),
            ("m_idx", pa.int32()), ("mtype", pa.string()),
            ("ref", pa.int64()), ("role", pa.string()),
            ("pos", pa.int32()),
        ]
    )
    _ri_base_schema = pa.schema(
        [
            ("id", pa.int64()), ("version", pa.int32()),
            ("timestamp", pa.int64()), ("changeset", pa.int64()),
            ("uid", pa.int32()), ("user", pa.string()),
            ("rel_tags_json", pa.string()),
        ]
    )
    _ri_schema = pa.schema(
        list(_ri_base_schema) + [pa.field("rev_members_json", pa.string())]
    )

    # --- J3: reverse membership from the leftover stream --------------------
    leftover = routed.filter(expr="route == 'leftover'")

    def group_members(batch: pa.Table) -> pa.Table:
        """(mtype, ref) → ``[[rel_id, role, pos], ...]`` JSON, vectorized:
        stable lexsort on the group key, per-row member triples via numpy
        ``U``-array concatenation (roles json-escaped once per distinct
        value), per-group joining via ``pc.binary_join`` — no pandas
        groupby, no per-row ``json.dumps`` (the driver-side call in the
        broadcast regime groups the WHOLE leftover stream in one go)."""
        import pyarrow.compute as pc

        if not len(batch):
            return pa.table(
                {
                    "mtype": pa.array([], type=pa.string()),
                    "ref": pa.array([], type=pa.int64()),
                    "members_json": pa.array([], type=pa.string()),
                }
            )
        batch = batch.combine_chunks()
        mtype = batch.column("mtype").to_numpy(zero_copy_only=False)
        ref = batch.column("ref").to_numpy(zero_copy_only=False)
        rel_id = batch.column("rel_id").to_numpy(zero_copy_only=False)
        role = batch.column("role").to_numpy(zero_copy_only=False)
        pos = batch.column("pos").to_numpy(zero_copy_only=False)
        mcode = np.asarray(
            pc.index_in(
                batch.column("mtype"),
                value_set=pa.array(["node", "way", "relation"]),
            ).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        order = np.lexsort((ref, mcode))  # stable: in-group order preserved
        ref_s, rel_s = ref[order], rel_id[order]
        role_s, pos_s = role[order], pos[order]
        mt_s, mc_s = mtype[order], mcode[order]
        n = len(ref_s)
        change = np.ones(n, dtype=bool)
        change[1:] = (mc_s[1:] != mc_s[:-1]) | (ref_s[1:] != ref_s[:-1])
        starts = np.nonzero(change)[0]
        uroles, rinv = np.unique(role_s.astype(str), return_inverse=True)
        role_json = np.array(
            [json.dumps(r) for r in uroles], dtype=str
        )[rinv]
        pieces = np.char.add("[", rel_s.astype(np.int64).astype("U20"))
        pieces = np.char.add(pieces, ",")
        pieces = np.char.add(pieces, role_json)
        pieces = np.char.add(pieces, ",")
        pieces = np.char.add(pieces, pos_s.astype(np.int64).astype("U11"))
        pieces = np.char.add(pieces, "]")
        offsets = np.concatenate([starts, [n]]).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(pieces, type=pa.string()),
            ),
            ",",
        )
        members_json = pc.binary_join_element_wise(
            "[", joined, "]", ""
        )
        return pa.table(
            {
                "mtype": pa.array(mt_s[starts], type=pa.string()),
                "ref": pa.array(ref_s[starts], type=pa.int64()),
                "members_json": members_json,
            }
        )

    # membership is bounded by the relation-member count — the reference
    # holds it as an in-memory HashMap (Reunify.java:54,887-930).  Under
    # ``memb_broadcast_max`` leftover rows we make the same memory
    # assumption: collect the leftover stream ONCE, group driver-side (no
    # exchange at all), broadcast, and attach per batch inside the fused
    # task chains.  Above the threshold the grouping becomes a keyed
    # exchange and the attach a hash-shuffle join — no RAM ceiling
    # (VERDICT r02 next-step #2).
    memb_broadcast = leftover.count() <= memb_broadcast_max
    _pt.mark("leftover count")
    if memb_broadcast:
        lt_tbls = [t for t in ray.get(leftover.to_arrow_refs()) if len(t)]
        lt_all = (
            pa.concat_tables(lt_tbls).combine_chunks()
            if lt_tbls else _routed_schema.empty_table()
        )
        memb_all = group_members(lt_all)
        membership = None
    else:
        membership = (
            leftover.repartition(nparts, keys=["mtype", "ref"])
            .map_batches(group_members, batch_format="pyarrow")
            .materialize()
        )
    _pt.mark("membership build")

    def _memb_side(kind: str):
        """(ref, rev_members_json) for one member kind — a pa.Table in
        broadcast mode, a projected Dataset in join mode."""
        if memb_broadcast:
            import pyarrow.compute as pc

            sub = memb_all.filter(pc.equal(memb_all.column("mtype"), kind))
            return pa.table(
                {
                    "ref": sub.column("ref"),
                    "rev_members_json": sub.column("members_json"),
                }
            )

        def proj(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = b.filter(pc.equal(b.column("mtype"), kind))
            return pa.table(
                {
                    "ref": t.column("ref"),
                    "rev_members_json": t.column("members_json"),
                }
            )

        return membership.map_batches(proj, batch_format="pyarrow")

    def attach_membership(ds, kind: str, key: str, ds_schema=None):
        """Left-attach ``rev_members_json`` for one member kind.
        ``ds_schema``: pass when ``ds`` has an upstream exchange so the
        join-mode planner never re-executes it for ``.schema()``."""
        if memb_broadcast:
            return broadcast_join(
                ds, ray.put(_memb_side(kind)), keys=key, right_keys="ref",
                join_type="left outer",
            )
        return hash_join(
            ds, _memb_side(kind), on=key, right_on="ref",
            join_type="left_outer", num_partitions=nparts,
            left_schema=ds_schema,
        )

    def meta_json(row) -> str:
        sig = _meta_sig(
            {c: row[c] for c in _META_COLS}, preserve,
            force_id=row.get("_force_id", False),
        )
        return json.dumps(sig)

    from oma_ray.stages.join import broadcast_join

    # --- node emission (the planet-scale bulk — fully vectorized) -----------
    # The node path avoids Acero entirely (nodes carry nested tag list
    # columns): membership attaches by searchsorted against the broadcast
    # map inside the fused chain, or by lookup_join (colocated searchsorted
    # merge) above the threshold.
    import pyarrow.compute as pc

    from oma_ray.functions.jsonvec import (
        json_point_pairs,
        json_string_pair_lists,
        meta_json_vec,
    )

    class _SortedMembAttach:
        """Append ``rev_members_json`` by searchsorted against the
        broadcast (sorted ids → json) membership map — the Acero-free
        attach for sides carrying nested tag list columns."""

        def __init__(self, ref):
            st = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.keys = st["keys"]
            self.vals = st["vals"]

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column("id").to_numpy(zero_copy_only=False)
            if len(self.keys):
                pos = np.searchsorted(self.keys, ids)
                pos_c = np.minimum(pos, len(self.keys) - 1)
                found = self.keys[pos_c] == ids
                vals = np.where(found, self.vals[pos_c], None)
            else:
                vals = np.full(len(ids), None, dtype=object)
            return b.append_column(
                "rev_members_json", pa.array(vals, type=pa.string())
            )

    def attach_membership_sorted(ds, kind: str, left_schema=None):
        """Membership attach for the nested-column sides (nodes, ways):
        broadcast mode = fused searchsorted stage, join mode =
        ``lookup_join`` (colocated searchsorted merge)."""
        if memb_broadcast:
            t = _memb_side(kind)
            k = t.column("ref").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            o = np.argsort(k, kind="stable")
            ref = ray.put(
                {
                    "keys": k[o],
                    "vals": t.column("rev_members_json")
                    .to_numpy(zero_copy_only=False)[o],
                }
            )
            return ds.map_batches(
                CachedStage(_SortedMembAttach, ref), batch_format="pyarrow"
            )
        from oma_ray.stages.join import lookup_join

        return lookup_join(
            ds, _memb_side(kind), on="id", right_on="ref",
            num_partitions=nparts_fact, left_schema=left_schema,
        )

    nodes_j = attach_membership_sorted(nodes_ds, "node")

    # vectorized first-match classification state (closure constants)
    _n_keys_arr = pa.array(cfg.node_keys, type=pa.string())
    _n_keys_np = np.array(cfg.node_keys, dtype=object)
    _n_value_sets = [pa.array(v, type=pa.string()) for v in cfg.node_values]
    _prefixed = pa.array(
        [p + k for p in cfg.prefixes[1:] for k in cfg.node_keys],
        type=pa.string(),
    )

    def emit_nodes(batch: pa.Table) -> pa.Table:
        """Mask-based classification over Arrow columns (TypeAnalysis.java
        :437-516 semantics): one ``index_in`` pass maps every tag key to
        its config-key index; rows carrying lifecycle-PREFIXED config keys
        (the mutation path) divert to the exact per-row kernel.  All entry
        columns build via Arrow kernels — no per-row json.dumps."""
        batch = batch.combine_chunks()
        if not len(batch):
            return _entry_schema()
        tk = _combined(batch.column("tag_keys"))
        ntags = pc.list_value_length(tk).to_numpy(zero_copy_only=False)
        rev_col = _combined(batch.column("rev_members_json"))
        rev_null = pc.is_null(rev_col).to_numpy(zero_copy_only=False)
        keep = (ntags > 0) | ~rev_null  # untagged+unreferenced (Reunify:953)
        if not keep.all():
            batch = batch.filter(pa.array(keep)).combine_chunks()
            if not len(batch):
                return _entry_schema()
            tk = _combined(batch.column("tag_keys"))
            rev_col = _combined(batch.column("rev_members_json"))
        tv = _combined(batch.column("tag_vals"))
        n = len(batch)
        off = tk.offsets.to_numpy(zero_copy_only=False)
        off = off - off[0]
        counts = np.diff(off)
        parents = np.repeat(np.arange(n), counts)
        flat_keys = tk.flatten()
        flat_vals = tv.flatten()

        slow = np.zeros(n, dtype=bool)
        if len(_prefixed) and len(flat_keys):
            pm = pc.is_in(
                flat_keys, value_set=_prefixed
            ).to_numpy(zero_copy_only=False)
            if pm.any():
                slow[parents[pm]] = True

        jidx = pc.index_in(flat_keys, value_set=_n_keys_arr)
        jnp = np.asarray(
            jidx.to_numpy(zero_copy_only=False), dtype=np.float64
        )
        matched = ~np.isnan(jnp)
        if slow.any():
            matched &= ~slow[parents]
        pos = np.nonzero(matched)[0]
        rows_m = parents[pos]
        j_m = jnp[pos].astype(np.int64)
        if one_element and len(pos):
            order = np.lexsort((j_m, rows_m))
            first = np.ones(len(order), dtype=bool)
            first[1:] = rows_m[order][1:] != rows_m[order][:-1]
            sel = order[first]
            pos, rows_m, j_m = pos[sel], rows_m[sel], j_m[sel]
        value_out = np.full(len(pos), "", dtype=object)
        if len(pos):
            vals_m = flat_vals.take(pa.array(pos, type=pa.int64()))
            vals_np = vals_m.to_numpy(zero_copy_only=False).astype(object)
            for j in np.unique(j_m):
                js = j_m == j
                sub = vals_np[js]
                inset = pc.is_in(
                    pa.array(sub, type=pa.string()),
                    value_set=_n_value_sets[j],
                ).to_numpy(zero_copy_only=False)
                sub[~inset] = ""
                value_out[js] = sub
        key_out = _n_keys_np[j_m]

        used = np.zeros(n, dtype=bool)
        used[rows_m] = True
        other_rows = np.nonzero(~used & ~slow)[0]

        g = ray.get(grid_ref)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        tiles = np.asarray(g.assign_bboxes(lon, lat, lon, lat))
        meta_all = meta_json_vec(batch, preserve).to_numpy(
            zero_copy_only=False
        ).astype(object)
        tags_all = json_string_pair_lists(tk, tv).to_numpy(
            zero_copy_only=False
        ).astype(object)
        geo_all = json_point_pairs(
            batch.column("lon"), batch.column("lat")
        ).to_numpy(zero_copy_only=False).astype(object)
        memb_all = pc.fill_null(rev_col, "[]").to_numpy(
            zero_copy_only=False
        ).astype(object)

        out_rows = np.concatenate([rows_m, other_rows]).astype(np.int64)
        out_keys = np.concatenate(
            [key_out, np.full(len(other_rows), "", dtype=object)]
        )
        out_vals = np.concatenate(
            [value_out, np.full(len(other_rows), "", dtype=object)]
        )
        t_fast = pa.table(
            {
                "chunk_type": pa.array(
                    np.full(len(out_rows), "N", dtype=object),
                    type=pa.string(),
                ),
                "tile": pa.array(
                    tiles[out_rows].astype(np.int32), type=pa.int32()
                ),
                "key": pa.array(out_keys, type=pa.string()),
                "value": pa.array(out_vals, type=pa.string()),
                "meta_json": pa.array(meta_all[out_rows], type=pa.string()),
                "tags_json": pa.array(tags_all[out_rows], type=pa.string()),
                "members_json": pa.array(
                    memb_all[out_rows], type=pa.string()
                ),
                "geo_json": pa.array(geo_all[out_rows], type=pa.string()),
            }
        )

        slow_idx = np.nonzero(slow)[0]
        if not len(slow_idx):
            return t_fast
        srows = batch.take(pa.array(slow_idx, type=pa.int64())).to_pylist()
        rows = []
        for i, row in zip(slow_idx, srows):
            tags = dict(zip(row["tag_keys"], row["tag_vals"]))
            final_tags, assigns = classify_plain(cfg, "N", tags, one_element)
            rev = row.get("rev_members_json")
            sig = _meta_sig({c: row[c] for c in _META_COLS}, preserve)
            for key, value in assigns:
                rows.append(
                    ("N", int(tiles[i]), key, value, json.dumps(sig),
                     json.dumps(sorted(final_tags.items())),
                     rev if isinstance(rev, str) else "[]",
                     f"[{row['lon']},{row['lat']}]")
                )
        return pa.concat_tables([t_fast, _entries_table(rows)])

    node_entries = nodes_j.map_batches(emit_nodes, batch_format="pyarrow")

    # --- way emission (split/area semantics) --------------------------------
    def projected(ds, mapping: dict):
        def proj(b: pa.Table) -> pa.Table:
            return pa.table({new: b.column(old) for old, new in mapping.items()})

        return ds.map_batches(proj, batch_format="pyarrow")

    # ways carry native tag lists like nodes, so the whole way path is
    # Acero-free: geometry attaches by lookup_join (colocated searchsorted,
    # way_geo unique per way_id), membership by the sorted attach
    from oma_ray.stages.join import lookup_join

    def _drop_refs(b: pa.Table) -> pa.Table:
        return b.drop_columns(["refs"])

    _geo_schema = pa.schema(
        [
            ("way_id", pa.int64()), ("geo_json", pa.string()),
            ("g_minx", pa.int64()), ("g_miny", pa.int64()),
            ("g_maxx", pa.int64()), ("g_maxy", pa.int64()),
            ("g_npts", pa.int32()), ("g_closed", pa.bool_()),
        ]
    )
    _ways_meta_schema = pa.schema(
        [
            ("id", pa.int64()), ("version", pa.int32()),
            ("timestamp", pa.int64()), ("changeset", pa.int64()),
            ("uid", pa.int32()), ("user", pa.string()),
            ("tag_keys", pa.list_(pa.string())),
            ("tag_vals", pa.list_(pa.string())),
        ]
    )
    if node_bcast:
        # geometry already rode along in the fused stage — just drop refs
        ways_w = ways_with_geo.map_batches(
            _drop_refs, batch_format="pyarrow"
        )
    else:
        ways_w = lookup_join(
            ways_ds.map_batches(_drop_refs, batch_format="pyarrow"),
            way_geo, on="id", right_on="way_id",
            num_partitions=nparts_fact,
            left_schema=_ways_meta_schema, right_schema=_geo_schema,
        )
    _ways_j_schema = pa.schema(
        list(_ways_meta_schema) + list(_geo_schema)[1:]
    )
    ways_j = attach_membership_sorted(
        ways_w, "way", left_schema=_ways_j_schema
    )

    def emit_way_rows(row, coords, rev_json, rows):
        closed = len(coords) >= 3 and coords[0] == coords[-1]
        tags = _tags_of(row)
        final_tags, area_assigns, split_tags = classify_way_split(
            cfg, tags, closed, one_element
        )
        lon = np.array([p[0] for p in coords], dtype=np.int64)
        lat = np.array([p[1] for p in coords], dtype=np.int64)
        g = ray.get(grid_ref)
        tile = int(g.assign_bboxes(
            np.array([lon.min()]), np.array([lat.min()]),
            np.array([lon.max()]), np.array([lat.max()]),
        )[0])
        if area_assigns:
            ring = _norm_ring([tuple(p) for p in coords[:-1]], outer=True)
            geo = json.dumps([[list(p) for p in ring], []])
            for _t, key, value in area_assigns:
                rows.append(
                    ("A", tile, key, value, meta_json(row),
                     json.dumps(sorted(final_tags.items())), rev_json, geo)
                )
        if split_tags is not None:
            ftags, assigns = classify_plain(cfg, "W", split_tags, one_element)
            geo = json.dumps([list(p) for p in coords])
            for key, value in assigns:
                rows.append(
                    ("W", tile, key, value, meta_json(row),
                     json.dumps(sorted(ftags.items())), rev_json, geo)
                )

    # vectorized way classification state (closure constants)
    _w_keys_arr = pa.array(cfg.way_keys, type=pa.string())
    _w_keys_np = np.array(cfg.way_keys, dtype=object)
    _w_way_sets = [pa.array(v, type=pa.string()) for v in cfg.way_values]
    _w_area_sets = [pa.array(v, type=pa.string()) for v in cfg.area_values]
    _w_exc_sets = [pa.array(v, type=pa.string()) for v in cfg.exceptions]
    _w_is_area = np.array(cfg.is_area, dtype=bool)
    _w_prefixed = pa.array(
        [p + k for p in cfg.prefixes[1:] for k in cfg.way_keys],
        type=pa.string(),
    )

    def emit_ways(batch: pa.Table) -> pa.Table:
        """Vectorized split/area way emission (TypeAnalysis.java:450-495
        semantics): one ``index_in`` pass over the flattened tag keys, the
        isArea truth table evaluated as masks, split-stream geometry passed
        through as the already-built ``geo_json`` string.  Rows carrying
        lifecycle-PREFIXED config keys divert to the exact per-row kernel
        (``emit_way_rows``)."""
        batch = batch.combine_chunks()
        if not len(batch):
            return _entry_schema()
        tk = _combined(batch.column("tag_keys"))
        ntags = pc.list_value_length(tk).to_numpy(zero_copy_only=False)
        rev_col = _combined(batch.column("rev_members_json"))
        rev_null = pc.is_null(rev_col).to_numpy(zero_copy_only=False)
        keep = (ntags > 0) | ~rev_null  # untagged+unreferenced (Reunify:1019)
        if not keep.all():
            batch = batch.filter(pa.array(keep)).combine_chunks()
            if not len(batch):
                return _entry_schema()
            tk = _combined(batch.column("tag_keys"))
            rev_col = _combined(batch.column("rev_members_json"))
        tv = _combined(batch.column("tag_vals"))
        n = len(batch)
        off = tk.offsets.to_numpy(zero_copy_only=False)
        off = off - off[0]
        counts = np.diff(off)
        parents = np.repeat(np.arange(n), counts)
        flat_keys = tk.flatten()
        flat_vals = tv.flatten()
        flat_vals_np = flat_vals.to_numpy(zero_copy_only=False).astype(object)

        slow = np.zeros(n, dtype=bool)
        if len(_w_prefixed) and len(flat_keys):
            pm = pc.is_in(
                flat_keys, value_set=_w_prefixed
            ).to_numpy(zero_copy_only=False)
            if pm.any():
                slow[parents[pm]] = True

        # per-row area=yes/no override value (way_is_area truth table)
        area_val = np.full(n, None, dtype=object)
        am = pc.equal(flat_keys, "area").to_numpy(zero_copy_only=False)
        if am.any():
            area_val[parents[am]] = flat_vals_np[am]
        closed_np = pc.fill_null(
            _combined(batch.column("g_closed")), False
        ).to_numpy(zero_copy_only=False)

        jidx = pc.index_in(flat_keys, value_set=_w_keys_arr)
        jnp = np.asarray(
            jidx.to_numpy(zero_copy_only=False), dtype=np.float64
        )
        matched = ~np.isnan(jnp)
        if slow.any():
            matched &= ~slow[parents]
        pos = np.nonzero(matched)[0]
        rows_m = parents[pos]
        j_m = jnp[pos].astype(np.int64)
        if one_element and len(pos):
            order = np.lexsort((j_m, rows_m))
            first = np.ones(len(order), dtype=bool)
            first[1:] = rows_m[order][1:] != rows_m[order][:-1]
            sel = order[first]
            pos, rows_m, j_m = pos[sel], rows_m[sel], j_m[sel]

        vals_m = flat_vals_np[pos]
        ayes = area_val[rows_m] == "yes"
        ano = area_val[rows_m] == "no"
        in_exc = np.zeros(len(pos), dtype=bool)
        area_value = np.full(len(pos), "", dtype=object)
        way_value = np.full(len(pos), "", dtype=object)
        for j in np.unique(j_m) if len(pos) else []:
            js = j_m == j
            sub = pa.array(vals_m[js], type=pa.string())
            if len(_w_exc_sets[j]):
                in_exc[js] = pc.is_in(
                    sub, value_set=_w_exc_sets[j]
                ).to_numpy(zero_copy_only=False)
            a_in = pc.is_in(
                sub, value_set=_w_area_sets[j]
            ).to_numpy(zero_copy_only=False)
            w_in = pc.is_in(
                sub, value_set=_w_way_sets[j]
            ).to_numpy(zero_copy_only=False)
            av = vals_m[js].copy()
            av[~a_in] = ""
            area_value[js] = av
            wv = vals_m[js].copy()
            wv[~w_in] = ""
            way_value[js] = wv
        # isArea (TypeAnalysis.java:518-526): closed && (area=yes → yes;
        # area=no → no; else is_area[j] != (value in exceptions[j]))
        area_match = closed_np[rows_m] & (
            ayes | (~ano & (_w_is_area[j_m] ^ in_exc))
        )

        used = np.zeros(n, dtype=bool)
        used[rows_m] = True
        split_flag = np.zeros(n, dtype=bool)
        split_flag[rows_m[~area_match]] = True
        unused = ~used & ~slow
        other_area = unused & closed_np & (area_val == "yes")
        split_other = unused & ~other_area

        g = ray.get(grid_ref)
        tiles = np.asarray(
            g.assign_bboxes(
                *(
                    pc.fill_null(
                        _combined(batch.column(c)), MAXC
                    ).to_numpy(zero_copy_only=False)
                    for c in ("g_minx", "g_miny", "g_maxx", "g_maxy")
                )
            )
        )
        meta_all = meta_json_vec(batch, preserve).to_numpy(
            zero_copy_only=False
        ).astype(object)
        tags_all = json_string_pair_lists(tk, tv).to_numpy(
            zero_copy_only=False
        ).astype(object)
        memb_all = pc.fill_null(rev_col, "[]").to_numpy(
            zero_copy_only=False
        ).astype(object)
        geo_all = pc.fill_null(
            _combined(batch.column("geo_json")), "[]"
        ).to_numpy(zero_copy_only=False).astype(object)

        # --- A entries: matched-area rows + closed-area=yes other rows ----
        a_rows = np.concatenate(
            [rows_m[area_match], np.nonzero(other_area)[0]]
        ).astype(np.int64)
        a_keys = np.concatenate(
            [_w_keys_np[j_m[area_match]],
             np.full(int(other_area.sum()), "", dtype=object)]
        )
        a_vals = np.concatenate(
            [area_value[area_match],
             np.full(int(other_area.sum()), "", dtype=object)]
        )
        # area geometry: ring-normalized, per distinct area row (minority)
        a_geo_by_row: dict = {}
        for r in np.unique(a_rows) if len(a_rows) else []:
            coords = [tuple(p) for p in json.loads(geo_all[r])]
            ring = _norm_ring(coords[:-1], outer=True)
            a_geo_by_row[r] = json.dumps([[list(p) for p in ring], []])
        a_geo = np.array(
            [a_geo_by_row[r] for r in a_rows], dtype=object
        ) if len(a_rows) else np.array([], dtype=object)

        # --- W entries: every match of a split row + no-match split rows --
        w_sel = split_flag[rows_m]
        w_rows = np.concatenate(
            [rows_m[w_sel], np.nonzero(split_other)[0]]
        ).astype(np.int64)
        w_keys = np.concatenate(
            [_w_keys_np[j_m[w_sel]],
             np.full(int(split_other.sum()), "", dtype=object)]
        )
        w_vals = np.concatenate(
            [way_value[w_sel],
             np.full(int(split_other.sum()), "", dtype=object)]
        )

        def entry_table(ct, rows_idx, keys, vals, geo):
            return pa.table(
                {
                    "chunk_type": pa.array(
                        np.full(len(rows_idx), ct, dtype=object),
                        type=pa.string(),
                    ),
                    "tile": pa.array(
                        tiles[rows_idx].astype(np.int32), type=pa.int32()
                    ),
                    "key": pa.array(keys, type=pa.string()),
                    "value": pa.array(vals, type=pa.string()),
                    "meta_json": pa.array(
                        meta_all[rows_idx], type=pa.string()
                    ),
                    "tags_json": pa.array(
                        tags_all[rows_idx], type=pa.string()
                    ),
                    "members_json": pa.array(
                        memb_all[rows_idx], type=pa.string()
                    ),
                    "geo_json": pa.array(geo, type=pa.string()),
                }
            )

        tables = [
            entry_table("A", a_rows, a_keys, a_vals, a_geo),
            entry_table("W", w_rows, w_keys, w_vals, geo_all[w_rows]),
        ]

        slow_idx = np.nonzero(slow)[0]
        if len(slow_idx):
            srows = batch.take(
                pa.array(slow_idx, type=pa.int64())
            ).to_pylist()
            rows = []
            for i, row in zip(slow_idx, srows):
                row = dict(row)
                row["tags_json"] = json.dumps(
                    list(zip(row["tag_keys"], row["tag_vals"]))
                )
                rev = row.get("rev_members_json")
                coords = [
                    tuple(p) for p in json.loads(row["geo_json"] or "[]")
                ]
                emit_way_rows(row, coords,
                              rev if isinstance(rev, str) else "[]", rows)
            tables.append(_entries_table(rows))
        return pa.concat_tables(tables)

    way_entries = ways_j.map_batches(emit_ways, batch_format="pyarrow")

    # --- J2: relation member geometries -------------------------------------
    # The reference holds the whole member-geometry merge in RAM
    # (Reunify.java:54,676-841).  Under ``memb_broadcast`` (the same
    # relation-scale RAM threshold as the membership map) the routed member
    # stream already lives on the driver, so the merge happens there with
    # ZERO exchanges: member-way geometries arrive via ONE filtered
    # streaming pass over the way-geometry stream, node members via the
    # broadcast node arrays (or a filtered pass over node_loc).  Above the
    # threshold the member streams join the BIG sides with the same
    # colocated hash-join machinery as J1 (VERDICT r02 next-step #2).
    # Either way: unresolved way members stay null and drop at emit
    # (Reunify.java:676-841); unresolved restriction via-NODES keep
    # marked-id garbage coords (_marked_point).

    mem = routed.filter(expr="route != 'leftover'")
    _member_cols = ("rel_id", "route", "m_idx", "mtype", "role")

    def _node_geo_strings(refs, lon, lat, valid):
        return [
            f"[[{x},{y}]]" if ok
            else json.dumps([list(_marked_point(int(r)))])
            for ok, x, y, r in zip(valid, lon, lat, refs)
        ]

    class _IdSetFilter:
        """Keep rows whose ``col`` value is in the broadcast sorted id
        set — the semi-join pushdown for collecting a small keyed subset
        of a big stream without an exchange."""

        def __init__(self, ref, col: str):
            self.ids = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            )
            self.col = col

        def __call__(self, b: pa.Table) -> pa.Table:
            v = b.column(self.col).to_numpy(zero_copy_only=False)
            if not len(self.ids):
                return b.filter(pa.array(np.zeros(len(b), dtype=bool)))
            p = np.minimum(
                np.searchsorted(self.ids, v), len(self.ids) - 1
            )
            return b.filter(pa.array(self.ids[p] == v))

    def _collect_tables(ds, empty_schema: pa.Schema) -> pa.Table:
        tbls = [t for t in ray.get(ds.to_arrow_refs()) if len(t)]
        return (
            pa.concat_tables(tbls).combine_chunks()
            if tbls else empty_schema.empty_table()
        )

    if memb_broadcast:
        mem_tbl = _collect_tables(mem, _routed_schema)
        m_mtype = mem_tbl.column("mtype").to_numpy(zero_copy_only=False)
        m_ref = mem_tbl.column("ref").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        is_way_m = m_mtype == "way"
        way_refs = np.unique(m_ref[is_way_m])
        if node_bcast:
            # filter ways BEFORE the fused geometry build so the pass
            # only explodes/stringifies the ~1% of ways that are members
            wg_src = ways_ds.map_batches(
                CachedStage(_IdSetFilter, ray.put(way_refs), "id"),
                batch_format="pyarrow",
            ).map_batches(
                CachedStage(_WayGeoFused, nl_ref), batch_format="pyarrow"
            ).map_batches(_as_way_geo, batch_format="pyarrow")
        else:
            # way_geo is already materialized here: filter the narrow view
            wg_src = way_geo_narrow.map_batches(
                CachedStage(_IdSetFilter, ray.put(way_refs), "way_id"),
                batch_format="pyarrow",
            )
        wg = _collect_tables(wg_src, _way_geo_narrow_schema)
        wg_ids = wg.column("way_id").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        wg_order = np.argsort(wg_ids, kind="stable")
        wg_ids = wg_ids[wg_order]
        wg_geo = wg.column("geo_json").to_numpy(
            zero_copy_only=False
        ).astype(object)[wg_order]
        mgeo = np.full(len(mem_tbl), None, dtype=object)
        if is_way_m.any() and len(wg_ids):
            wrefs = m_ref[is_way_m]
            p = np.minimum(
                np.searchsorted(wg_ids, wrefs), len(wg_ids) - 1
            )
            found = wg_ids[p] == wrefs
            vals = np.where(found, wg_geo[p], None)
            mgeo[np.nonzero(is_way_m)[0]] = vals
        is_node_m = m_mtype == "node"
        if is_node_m.any():
            nrefs = m_ref[is_node_m]
            if node_bcast:
                lon, lat, found = _CoordLookup(nl_ref).coords(nrefs)
            else:
                nl_sub = _collect_tables(
                    node_loc.map_batches(
                        CachedStage(
                            _IdSetFilter,
                            ray.put(np.unique(nrefs)), "id",
                        ),
                        batch_format="pyarrow",
                    ),
                    pa.schema(
                        [
                            ("id", pa.int64()), ("lon", pa.int64()),
                            ("lat", pa.int64()),
                        ]
                    ),
                )
                st = {
                    c: nl_sub.column(c).to_numpy(
                        zero_copy_only=False
                    ).astype(np.int64)
                    for c in ("id", "lon", "lat")
                }
                o = np.argsort(st["id"], kind="stable")
                lon, lat, found = _CoordLookup(
                    {
                        "ids": st["id"][o], "lon": st["lon"][o],
                        "lat": st["lat"][o],
                    }
                ).coords(nrefs)
            mgeo[np.nonzero(is_node_m)[0]] = np.array(
                _node_geo_strings(nrefs, lon, lat, found), dtype=object
            )
        member_geo_tbl = pa.table(
            {
                **{c: mem_tbl.column(c) for c in _member_cols},
                "mgeo_json": pa.array(mgeo, type=pa.string()),
            }
        )
        _pt.mark("member_geo driver build (J2)")

        # relation info + reverse membership, driver-side (same bound)
        ri_tbl = _collect_tables(
            projected(rels_ds, {
                "id": "id", "version": "version", "timestamp": "timestamp",
                "changeset": "changeset", "uid": "uid", "user": "user",
                "tags_json": "rel_tags_json",
            }),
            _ri_base_schema,
        )
        _rm = _memb_side("relation")
        _rm_keys = _rm.column("ref").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        _rm_o = np.argsort(_rm_keys, kind="stable")
        _rm_keys = _rm_keys[_rm_o]
        _rm_vals = _rm.column("rev_members_json").to_numpy(
            zero_copy_only=False
        ).astype(object)[_rm_o]
        _ri_ids = ri_tbl.column("id").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        if len(_rm_keys):
            p = np.minimum(
                np.searchsorted(_rm_keys, _ri_ids), len(_rm_keys) - 1
            )
            f = _rm_keys[p] == _ri_ids
            rev_vals = np.where(f, _rm_vals[p], None)
        else:
            rev_vals = np.full(len(_ri_ids), None, dtype=object)
        ri_tbl = ri_tbl.append_column(
            "rev_members_json", pa.array(rev_vals, type=pa.string())
        )
        _pt.mark("ri driver build")

        merged = member_geo_tbl.join(
            ri_tbl, keys=["rel_id"], right_keys=["id"], join_type="inner"
        ).combine_chunks()
        # split into ~nparts blocks at rel_id boundaries so emit_relations
        # parallelizes while each relation stays within one block
        if len(merged):
            r = merged.column("rel_id").to_numpy(zero_copy_only=False)
            order = np.argsort(r, kind="stable")
            merged = merged.take(
                pa.array(order, type=pa.int64())
            ).combine_chunks()
            r = r[order]
            gstarts = np.concatenate(
                [[0], np.nonzero(r[1:] != r[:-1])[0] + 1]
            )
            k = max(1, min(nparts, len(gstarts)))
            cut_groups = np.linspace(
                0, len(gstarts), k + 1
            ).astype(np.int64)[1:-1]
            cuts = (
                [0] + [int(gstarts[c]) for c in np.unique(cut_groups)]
                + [len(merged)]
            )
            blocks = [
                merged.slice(s, e - s)
                for s, e in zip(cuts[:-1], cuts[1:]) if e > s
            ]
            geo_plus_info = rd.from_arrow(blocks)
        else:
            geo_plus_info = rd.from_arrow(merged)
        ri_ds = None  # collections use ri_tbl in this regime
    else:
        geo_plus_info, ri_ds, ri_tbl = None, None, None

    mem_way = mem.filter(expr="mtype == 'way'")
    mem_node = mem.filter(expr="mtype == 'node'")

    wm = hash_join(
        mem_way, way_geo_narrow, on="ref", right_on="way_id",
        join_type="left_outer", num_partitions=nparts_fact,
        left_schema=_routed_schema, right_schema=_way_geo_narrow_schema,
    ) if not memb_broadcast else None

    def _way_member_geo(b: pa.Table) -> pa.Table:
        cols = {c: b.column(c) for c in _member_cols}
        cols["mgeo_json"] = b.column("geo_json")  # null = unresolved way
        return pa.table(cols)

    if memb_broadcast:
        nm_mapped = None
    elif node_bcast:
        class _NodeMemberAttach:
            """Via-node coords from the broadcast node arrays — no
            exchange; misses keep marked-id garbage coords."""

            def __init__(self, ref):
                self.look = _CoordLookup(ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                b = b.combine_chunks()
                refs = b.column("ref").to_numpy(zero_copy_only=False)
                lon, lat, found = self.look.coords(
                    np.asarray(refs, dtype=np.int64)
                )
                cols = {c: b.column(c) for c in _member_cols}
                cols["mgeo_json"] = pa.array(
                    _node_geo_strings(refs, lon, lat, found),
                    type=pa.string(),
                )
                return pa.table(cols)

        nm_mapped = mem_node.map_batches(
            CachedStage(_NodeMemberAttach, nl_ref), batch_format="pyarrow"
        )
    else:
        nm = hash_join(
            mem_node, node_loc, on="ref", right_on="id",
            join_type="left_outer", num_partitions=nparts_fact,
            left_schema=_routed_schema,
        )

        def _node_member_geo(b: pa.Table) -> pa.Table:
            lon_col = b.column("lon")
            valid = ~pa.compute.is_null(lon_col).to_numpy(
                zero_copy_only=False
            )
            lon = np.where(
                valid, lon_col.to_numpy(zero_copy_only=False), 0
            ).astype(np.int64)
            lat = np.where(
                valid, b.column("lat").to_numpy(zero_copy_only=False), 0
            ).astype(np.int64)
            refs = b.column("ref").to_numpy(zero_copy_only=False)
            cols = {c: b.column(c) for c in _member_cols}
            cols["mgeo_json"] = pa.array(
                _node_geo_strings(refs, lon, lat, valid), type=pa.string()
            )
            return pa.table(cols)

        nm_mapped = nm.map_batches(
            _node_member_geo, batch_format="pyarrow"
        )

    if not memb_broadcast:
        _mg_anchor = pa.table(
            {
                "rel_id": pa.array([], type=pa.int64()),
                "route": pa.array([], type=pa.string()),
                "m_idx": pa.array([], type=pa.int32()),
                "mtype": pa.array([], type=pa.string()),
                "role": pa.array([], type=pa.string()),
                "mgeo_json": pa.array([], type=pa.string()),
            }
        )
        member_geo = (
            wm.map_batches(_way_member_geo, batch_format="pyarrow")
            .union(nm_mapped)
            .union(rd.from_arrow(_mg_anchor))  # schema anchor: empties
            .materialize()
        )
        # (materialize: caps how many aggregator pools one DAG
        # co-schedules AND gives the next join a metadata-cheap schema)
        _pt.mark("member_geo materialize (J2)")

        ri_ds = attach_membership(
            projected(rels_ds, {
                "id": "id", "version": "version", "timestamp": "timestamp",
                "changeset": "changeset", "uid": "uid", "user": "user",
                "tags_json": "rel_tags_json",
            }),
            "relation", "id", ds_schema=_ri_base_schema,
        ).materialize()
        _pt.mark("ri_ds materialize")

        geo_plus_info = hash_join(
            member_geo, ri_ds, on="rel_id", right_on="id",
            join_type="inner", num_partitions=nparts,
            right_schema=_ri_schema,
        )

    def emit_relations(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows: list[tuple] = []
        if not len(df):
            return _entry_schema()
        for rel_id, g in df.groupby("rel_id"):
            first = g.iloc[0]
            row = {
                "id": int(rel_id),
                "version": int(first["version"]),
                "timestamp": int(first["timestamp"]),
                "changeset": int(first["changeset"]),
                "uid": int(first["uid"]),
                "user": str(first["user"]),
                "tags_json": first["rel_tags_json"],
            }
            rev = first["rev_members_json"]
            rev_json = rev if isinstance(rev, str) else "[]"
            tags = _tags_of(row)
            # restriction / destination_sign stitching
            rg = g[g["route"] == "restr"].sort_values("m_idx")
            if len(rg):
                ffrom, fvia, fto = [], [], []
                for r in rg.itertuples():
                    if r.mtype == "way" and not isinstance(r.mgeo_json, str):
                        continue  # unresolved way member drops
                    geo = [tuple(p) for p in json.loads(r.mgeo_json)]
                    if r.role == "from":
                        ffrom.append(geo)
                    elif r.role == "to":
                        fto.append(geo)
                    else:
                        fvia.append(geo)
                for way_pts in from_to_ways(ffrom, fvia, fto):
                    emit_way_rows(row, [tuple(p) for p in way_pts],
                                  rev_json, rows)
            # multipolygon / boundary assembly
            ag = g[g["route"] == "area"].sort_values("m_idx")
            if len(ag):
                outer, inner = [], []
                for r in ag.itertuples():
                    if not isinstance(r.mgeo_json, str):
                        continue  # unresolved member drops
                    geo = [tuple(p) for p in json.loads(r.mgeo_json)]
                    (outer if r.role == "outer" else inner).append(geo)
                final_tags, assigns = classify_plain(cfg, "A", tags, one_element)
                gobj = ray.get(grid_ref)
                for ring, holes in assemble_areas(outer, inner):
                    open_outer = ring[:-1]
                    open_holes = [h[:-1] for h in holes]
                    pts = list(open_outer) + [p for h in open_holes for p in h]
                    lon = np.array([p[0] for p in pts], dtype=np.int64)
                    lat = np.array([p[1] for p in pts], dtype=np.int64)
                    tile = int(gobj.assign_bboxes(
                        np.array([lon.min()]), np.array([lat.min()]),
                        np.array([lon.max()]), np.array([lat.max()]),
                    )[0])
                    geo = json.dumps(
                        [
                            [list(p) for p in _norm_ring(open_outer, outer=True)],
                            [[list(p) for p in _norm_ring(h, outer=False)]
                             for h in open_holes],
                        ]
                    )
                    for key, value in assigns:
                        rows.append(
                            ("A", tile, key, value, meta_json(row),
                             json.dumps(sorted(final_tags.items())),
                             rev_json, geo)
                        )
        return _entries_table(rows)

    rel_entries = geo_plus_info.map_batches(
        emit_relations, batch_format="pyarrow"
    )
    # (no extra keyed exchange: the inner hash join already co-located every
    # rel_id's member rows in one block)

    # --- collections: semi-join rels against the leftover stream ------------
    if memb_broadcast:
        # leftover AND the relation-info table already sit on the driver
        # in this regime: filter driver-side — no exchange, no extra pass
        _coll_ids = np.sort(
            np.unique(
                lt_all.column("rel_id").to_numpy(zero_copy_only=False)
            )
        ) if len(lt_all) else np.empty(0, dtype=np.int64)
        _rids = ri_tbl.column("id").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        if len(_coll_ids):
            p = np.minimum(
                np.searchsorted(_coll_ids, _rids), len(_coll_ids) - 1
            )
            _cmask = _coll_ids[p] == _rids
        else:
            _cmask = np.zeros(len(_rids), dtype=bool)
        coll_j = rd.from_arrow(ri_tbl.filter(pa.array(_cmask)))
    else:
        leftover_ids = leftover.map_batches(
            lambda b: b.select(["rel_id"]), batch_format="pyarrow"
        )
        coll_j = hash_join(
            ri_ds, leftover_ids, on="id", right_on="rel_id",
            join_type="inner", num_partitions=nparts, dedup_right=True,
            left_schema=_ri_schema,
            right_schema=pa.schema([("rel_id", pa.int64())]),
        )

    def emit_collections(batch: pa.Table) -> pa.Table:
        rows = []
        for row in batch.to_pylist():
            row = dict(row)
            row["tags_json"] = row.pop("rel_tags_json")
            row["_force_id"] = True
            tags = _tags_of(row)
            final_tags, assigns = classify_plain(cfg, "C", tags, one_element)
            rev = row.get("rev_members_json")
            for key, value in assigns:
                rows.append(
                    ("C", miss, key, value, meta_json(row),
                     json.dumps(sorted(final_tags.items())),
                     rev if isinstance(rev, str) else "[]", "null")
                )
        return _entries_table(rows)

    coll_entries = coll_j.map_batches(
        emit_collections, batch_format="pyarrow"
    )

    out_streams = EntryStreams(
        node=node_entries, way=way_entries,
        rel=rel_entries, coll=coll_entries,
    )
    # both broadcast regimes active ⇒ every stream is a fused task chain
    # or a driver table (zero upstream exchanges): the writer may union
    # them into one DAG with a single aggregator pool
    out_streams.fused = bool(memb_broadcast and node_bcast)
    return out_streams, boxes


def entries_from_streams(streams: dict, boxes: list[tuple]) -> list[tuple]:
    """Collect + decode entry streams into the ``convert_osm`` signature
    shape (fixture-scale only).  Streams collect sequentially: each one
    holds at most 2-3 hash-join aggregator pools live at a time, instead of
    a single union DAG scheduling every join's actor pool at once."""
    miss = len(boxes)
    collected: list[dict] = []
    for entry_ds in streams.values():
        collected.extend(entry_ds.take_all())
    out: list[tuple] = []
    for row in collected:
        tile = row["tile"]
        bounds = tuple(boxes[tile]) if tile < miss else NO_BOUNDS
        meta = tuple(json.loads(row["meta_json"]))
        tags = frozenset((k, v) for k, v in json.loads(row["tags_json"]))
        members = frozenset(
            (int(m[0]), m[1], int(m[2]))
            for m in json.loads(row["members_json"])
        )
        gj = json.loads(row["geo_json"])
        if row["chunk_type"] == "N":
            geo = (gj[0], gj[1])
        elif row["chunk_type"] == "W":
            geo = tuple(tuple(p) for p in gj)
        elif row["chunk_type"] == "A":
            geo = (
                tuple(tuple(p) for p in gj[0]),
                tuple(tuple(tuple(q) for q in h) for h in gj[1]),
            )
        else:
            geo = ()
        out.append(
            (row["chunk_type"], bounds, row["key"], row["value"], meta,
             tags, members, geo)
        )
    return out
