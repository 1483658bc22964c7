"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).  Queries without an
oracle entry (LSH pair mining, PIP spatial join, IVF approximate kNN,
heuristic language ID) get the weaker rows-only check.

Ray is initialised by the driver BEFORE this module is imported: nothing in
``oma_ray`` calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthetic Common-Crawl
    pages → geo-parse (html) → cell index + first-match bbs tile +
    point-in-polygon admin join → per-tile summary (tile_id, n_pages,
    n_matched)."""
    from oma_ray.pipelines.tiling import run_tiling

    return run_tiling("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from oma_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from oma_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
