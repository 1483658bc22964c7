"""oma_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch rebuild of the capabilities of kumakyoo42/Oma (reference at
/root/reference, MIT), generalized into a spatial-join + tiling engine over
Common-Crawl-style web-page tables, expressed Ray-Data-first:

- ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
  batches (``batch_format="pyarrow"`` / ``"numpy"``),
- actor pools for stateful stages (polygon indexes, classifier configs),
- ``groupby`` / ``repartition`` / partitioned ``write_parquet`` for the wide
  steps, with explicit skew handling (salted keys) and per-partition lineage.

Nothing here is a port: the reference is a single-threaded Java program with
hand-rolled spill files and windowed multi-pass joins; those are replaced by
the Ray Data streaming executor, object-store spilling and shuffle joins.
Reference citations in docstrings (``file:line`` under
``/root/reference/de/kumakyoo/oma/``) mark *semantic* parity points only.
"""

__version__ = "0.1.0"


def _configure_data_context() -> None:
    """Engine-wide Ray Data settings, applied at import (a Dataset snapshots
    the DataContext at creation, so this must run before any source is
    built): hash-shuffle strategy — required by keyed ``repartition`` (the
    co-locate-by-key primitive the dedup/join operators build on) and the
    scalable choice for groupby/join exchanges generally."""
    try:
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy

        DataContext.get_current().shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    except Exception:  # pragma: no cover - tolerate older/newer ray
        pass


_configure_data_context()

QUANT = 10_000_000  # fixed-point coordinate scale: int = degrees * 1e7
                    # (OSMXMLReader.java:75-77)

WORLD = (-1_800_000_000, -900_000_000, 1_800_000_000, 900_000_000)
# Bounds.getWholeWorld() — Bounds.java:38-41

MISSING_COORD = 0x7FFFFFFF
# unresolved node refs surface as coords 0x7fffffff (ChunkGenerator.java:326,
# README.md:35)
