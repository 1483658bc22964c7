"""Flagship pipeline: pages → geo-parse → cells → tile assign → PIP join →
partitioned write with lineage + manifest.

This is the Ray-Data re-expression of Oma's three-stage dataflow
(Oma.java:43-47): Reunify's denormalization becomes the geo-parse +
broadcast-index joins, ChunkGenerator's first-containing-bbox scatter becomes
the vectorized ``TileAssign`` stage, and the chunk table becomes a partition
manifest.  Everything streams: no stage materializes the dataset; the only
driver-side materialization is the small per-tile summary aggregate.

Scale notes (100 TB design):
- the bbs grid and polygon index are broadcast once (``ray.put``) and fetched
  once per actor — never re-shipped per batch;
- the wide ``html`` column is dropped right after geo-parse so the rest of
  the pipeline (and any shuffle) only moves narrow columns + ``text``;
- output is partitioned parquet by ``tile_bucket`` (tile_id hashed into a
  bounded number of directories) so no single tile produces a giant file and
  hot tiles spread across files;
- resume shards over input *files* (at cluster scale: file groups), each
  shard writing its own directory + manifest entry (see state/manifest.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from oma_ray.stages.geo_parse import GeoParse
from oma_ray.stages.pip import PolygonIndex
from oma_ray.stages.tiles import BbsGrid
from oma_ray.state.manifest import Manifest, lineage_id
from oma_ray.synth import default_bbs_text, parse_bbs, synth_admin_polygons


from functools import lru_cache


@lru_cache(maxsize=1)
def default_grid() -> BbsGrid:
    return BbsGrid(parse_bbs(default_bbs_text()))


@lru_cache(maxsize=4)
def default_polygons(n: int = 200) -> PolygonIndex:
    return PolygonIndex(synth_admin_polygons(n))


def build_tiling_pipeline(
    pages_ds,
    grid_ref,
    poly_ref,
    *,
    pip_concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
    drop_html: bool = True,
    lineage: str | None = None,
):
    """pages Dataset → tiled+joined Dataset (lazy).

    ``grid_ref`` / ``poly_ref`` are ``ray.put`` refs (or the objects
    themselves for unit tests).  Appends lon/lat, cell ids, tile_id,
    admin_id, tile_bucket and (optionally) a constant ``lineage`` column.

    All stages are TASK stages (the spatial step resolves its broadcast
    indexes through a per-worker cache — see stages/spatial.py), so Ray
    fuses the whole chain into one pipelined task per input block and no
    intermediate row ever crosses the object store.  ``pip_concurrency``
    switches the spatial step to an actor pool of that size instead (for
    state too expensive to build per worker); default None = fused tasks.
    """
    from oma_ray.stages.spatial import SpatialJoin, SpatialJoinTask

    ds = pages_ds.map_batches(GeoParse(), batch_format="pyarrow", batch_size=batch_size)
    if drop_html:
        ds = ds.drop_columns(["html"])
    if pip_concurrency is None:
        ds = ds.map_batches(
            SpatialJoinTask(grid_ref, poly_ref),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    else:
        ds = ds.map_batches(
            SpatialJoin,
            fn_constructor_args=(grid_ref, poly_ref),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=pip_concurrency,
        )

    def finalize(batch: pa.Table) -> pa.Table:
        tile = batch.column("tile_id").to_numpy(zero_copy_only=False)
        bucket = (tile.astype(np.int64) % 64).astype(np.int32)
        batch = batch.append_column("tile_bucket", pa.array(bucket, type=pa.int32()))
        if lineage is not None:
            # dictionary-encoded: the column is constant per shard, so the
            # sink exchange moves one dictionary entry + int8 indices
            # instead of ~30 B of string per row
            batch = batch.append_column(
                "lineage",
                pa.DictionaryArray.from_arrays(
                    pa.array(np.zeros(len(batch), dtype=np.int8)),
                    pa.array([lineage], type=pa.string()),
                ),
            )
        return batch

    return ds.map_batches(finalize, batch_format="pyarrow", batch_size=batch_size)


def tile_summary(ds, as_dataset: bool = False):
    """Per-tile metrics: page count + matched-to-admin count (small result).

    Tree aggregation instead of ``groupby().aggregate``: the result
    cardinality is bounded by the tile count (~42k), so each task combines
    its block to ≤#tiles partial rows (fused into the upstream pipeline), a
    ``repartition`` merges partials in a bounded fan-in layer, and the final
    ≤ few-hundred-k rows reduce in one place.  Ray's sort-based groupby costs
    ~6µs/row on the shuffle — a pure overhead for a bounded-size result (at
    unbounded cardinality the groupby IS the right tool; see queries.py)."""
    def partial(batch: pa.Table) -> pa.Table:
        tile = batch.column("tile_id").to_numpy(zero_copy_only=False)
        admin = batch.column("admin_id").to_numpy(zero_copy_only=False)
        tiles, inv = np.unique(tile, return_inverse=True)
        n = np.bincount(inv, minlength=len(tiles))
        matched = np.bincount(inv, weights=(admin >= 0), minlength=len(tiles))
        return pa.table(
            {
                "tile_id": pa.array(tiles, type=pa.int32()),
                "n_pages": pa.array(n, type=pa.int64()),
                "n_matched": pa.array(matched.astype(np.int64), type=pa.int64()),
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        agg = df.groupby("tile_id", as_index=False)[["n_pages", "n_matched"]].sum()
        from oma_ray.sources.parquet import from_pandas_clean

        out = from_pandas_clean(agg)
        return pa.table(
            {
                "tile_id": out.column("tile_id").cast(pa.int32()),
                "n_pages": out.column("n_pages"),
                "n_matched": out.column("n_matched"),
            }
        )

    from oma_ray.cluster import default_partitions

    fan_in = max(4, default_partitions() // 8)
    partials = ds.map_batches(partial, batch_format="pyarrow")  # fuses upstream
    merged = partials.repartition(fan_in).map_batches(combine, batch_format="pyarrow")
    df = merged.to_pandas()  # ≤ fan_in × #tiles rows
    out = df.groupby("tile_id", as_index=False)[["n_pages", "n_matched"]].sum()
    out["tile_id"] = out["tile_id"].astype("int32")
    if as_dataset:
        import ray.data as rd

        return rd.from_pandas(out)
    return out


def write_tiled_direct(
    ds,
    out_dir: str,
    *,
    sort_within_tile: bool = True,
    compact_target_bytes: int | None = None,
):
    """EXCHANGE-FREE sink variant (VERDICT r4 #8): skip the keyed
    repartition entirely — every fused upstream task sorts its own block
    by (tile_id, page_id) and the parquet writer splits it across
    ``tile_bucket=`` directories directly.  No shuffle, no aggregator
    pool, maximum pipeline overlap; the cost is file count (≈ #tasks ×
    #buckets-touched-per-task small files instead of #partitions), paid
    back by ``state/compact.py`` merging each leaf directory afterwards
    (embarrassingly parallel, rows never leave their partition).

    Skew note: hot buckets need no salting here — there is no exchange
    partition to serialize; a hot bucket just collects more files.  The
    A/B against the salted-exchange sink lives in bench/BASELINE.md; at
    cluster scale the exchange sink buys fewer, bigger files up front
    (better for a read-heavy consumer), the direct sink buys a shuffle-
    free write path (better when the sink is the bottleneck)."""
    def sort_block(batch: pa.Table) -> pa.Table:
        if not sort_within_tile:
            return batch
        idx = pa.compute.sort_indices(
            batch,
            sort_keys=[("tile_id", "ascending"), ("page_id", "ascending")],
        )
        return batch.take(idx)

    out = ds.map_batches(sort_block, batch_format="pyarrow")
    out.write_parquet(out_dir, partition_cols=["tile_bucket"])
    if compact_target_bytes:
        from oma_ray.state.compact import compact_dir

        compact_dir(out_dir, target_bytes=compact_target_bytes)
    return out_dir


def write_tiled(
    ds,
    out_dir: str,
    *,
    sort_within_tile: bool = True,
    num_partitions: int | None = None,
    hot_buckets: set | None = None,
    n_salts: int = 8,
):
    """Deterministic partitioned sink: co-locate each ``tile_bucket`` with a
    keyed repartition, sort rows by (tile_id, page_id) *within* each block
    (the north_star's sort-within-tile: a cheap local sort instead of a
    global one — tiles never span blocks after the keyed exchange), and
    write one parquet directory per bucket.  Output is byte-stable across
    reruns for fixed inputs.

    ``hot_buckets``: buckets above a share threshold (the synth's hot
    cells put ~30% of pages in a few tiles) get SALTED across ``n_salts``
    sub-keys so no single exchange partition serializes the sink
    (north_rule "salted-key skew splitting for hot tiles"); a hot bucket's
    directory then holds ``n_salts`` sorted files instead of one, which
    reads back as the same logical partition."""
    from oma_ray.cluster import default_partitions
    from oma_ray.stages.dedup import ensure_hash_shuffle

    ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_partitions()
    if hot_buckets:
        from oma_ray.stages.skew import salted_repartition

        out, _hot = salted_repartition(
            ds, "tile_bucket", "page_id",
            num_partitions=num_partitions, n_salts=n_salts,
            hot_keys=set(hot_buckets),
        )
    else:
        out = ds.repartition(num_partitions, keys=["tile_bucket"])

    def sort_block(batch: pa.Table) -> pa.Table:
        if "salt" in batch.column_names:
            batch = batch.drop_columns(["salt"])
        if not sort_within_tile:
            return batch
        idx = pa.compute.sort_indices(
            batch,
            sort_keys=[("tile_id", "ascending"), ("page_id", "ascending")],
        )
        return batch.take(idx)

    out = out.map_batches(sort_block, batch_format="pyarrow")
    out.write_parquet(out_dir, partition_cols=["tile_bucket"])
    return out_dir


def run_tiling(
    sf_dir: str,
    *,
    replicate: int = 1,
    n_polygons: int = 200,
    out_dir: str | None = None,
    pip_concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
    sink: str = "exchange",
):
    """End-to-end flagship run over the synthetic pages for ``sf_dir``.

    Returns the per-tile summary Dataset.  When ``out_dir`` is given, also
    writes the tiled pages as parquet partitioned by ``tile_bucket``.
    ``sink="exchange"`` (default) is the salted keyed-repartition sink;
    ``sink="direct"`` the exchange-free per-task sink (A/B in BASELINE.md).
    """
    import ray

    from oma_ray.synth import make_pages_dataset

    pages = make_pages_dataset(sf_dir, replicate=replicate)
    from oma_ray.stages.taskcache import broadcast_once

    grid_ref = broadcast_once("tiling_bbs_grid", default_grid)
    poly_ref = broadcast_once(
        f"tiling_admin_polys_{n_polygons}", lambda: default_polygons(n_polygons)
    )
    # north_rule: every persisted row carries its partition lineage id —
    # derived from the input identity so a re-run of the same input is
    # recognizable (run_tiling_resumable refines this to one id per shard)
    lineage = (
        lineage_id([f"{sf_dir}:documents:replicate={replicate}"])
        if out_dir is not None else None
    )
    ds = build_tiling_pipeline(
        pages, grid_ref, poly_ref,
        pip_concurrency=pip_concurrency, batch_size=batch_size,
        lineage=lineage,
    )
    if out_dir is not None and sink == "direct":
        write_tiled_direct(ds, out_dir)
    elif out_dir is not None:
        # hot-bucket detection on a replicate=1 PROXY pipeline (the page
        # replication is deterministic, so the bucket distribution is
        # identical at 1/replicate the cost) — never a second full pass
        from oma_ray.stages.skew import find_hot_keys

        # NOT memoized: hot-bucket detection is part of the product job the
        # bench headline declares it times — caching it across reruns would
        # make best-of-2 report a job that skips detection (self-review r4)
        proxy = build_tiling_pipeline(
            make_pages_dataset(sf_dir, replicate=1), grid_ref, poly_ref,
            pip_concurrency=pip_concurrency,
        )
        hot = find_hot_keys(proxy, "tile_bucket", hot_share=0.05)
        write_tiled(ds, out_dir, hot_buckets=hot)
        import ray.data as rd

        # verify-what-you-wrote summary needs only two int columns — prune
        # the read-back instead of re-reading the wide text/url payload
        ds = rd.read_parquet(out_dir, columns=["tile_id", "admin_id"])
    return tile_summary(ds)


def run_tiling_resumable(
    input_files: list[str],
    out_dir: str,
    *,
    shard_size: int = 1,
    n_polygons: int = 200,
    replicate: int = 1,
    pip_concurrency: int | tuple[int, int] | None = None,
    fail_after_shards: int | None = None,
):
    """Resumable flagship: shard input files, one output dir + manifest entry
    per shard; completed shards (by lineage id) are skipped on rerun.

    ``fail_after_shards`` injects a crash after N shards (tests only).
    Returns the manifest metrics dict.
    """
    import ray
    import ray.data as rd

    from oma_ray.synth import synth_pages_batch

    man = Manifest(out_dir)
    done = man.done_lineages()
    grid_ref = ray.put(default_grid())
    poly_ref = ray.put(default_polygons(n_polygons))

    shards = [
        input_files[i : i + shard_size] for i in range(0, len(input_files), shard_size)
    ]
    completed = 0
    for si, shard in enumerate(shards):
        lid = lineage_id(shard)
        if lid in done:
            continue
        if fail_after_shards is not None and completed >= fail_after_shards:
            raise RuntimeError(f"injected failure before shard {si}")
        pages = rd.read_parquet(shard).map_batches(
            lambda b: synth_pages_batch(b, replicate=replicate),
            batch_format="pyarrow",
        )
        ds = build_tiling_pipeline(
            pages, grid_ref, poly_ref,
            pip_concurrency=pip_concurrency, lineage=lid,
        )
        shard_dir = f"{out_dir}/data/shard={lid}"
        ds.write_parquet(shard_dir, partition_cols=["tile_bucket"])
        counts = rd.read_parquet(shard_dir)
        n_rows = counts.count()
        man.mark_done(lid, shard=si, paths=shard, rows=n_rows, path=shard_dir)
        completed += 1
    return man.metrics()
