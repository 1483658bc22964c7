"""Scale-stress for the distributed OSM conversion: synthesize a large
deterministic OSM extract (no external data), encode it to PBF with the
fixture-grade writer, run the blob-parallel + distributed-reunify path, and
check its entry multiset against the driver-side conformance path.

Usage: python scripts/stress_osm.py [n_nodes] [num_cpus]

This is the "would it still work at 1000×" evidence (BASELINE.md): the
fixture has 38 nodes; this runs the same code on 10^5-10^6 elements where
driver-side dicts would already dominate a laptop's memory at the next
factor of 1000.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def synth_big_osm(n_nodes: int, seed: int = 42):
    """Deterministic extract: a road grid over one 1°×1° area.  Every way
    references existing nodes (plus a few dangling refs for the
    missing-node path); relations mix multipolygons, restrictions and
    route collections."""
    rng = np.random.default_rng(seed)
    lon0, lat0 = 100_000_000, 480_000_000  # 10E 48N
    lons = lon0 + rng.integers(0, 10_000_000, n_nodes)
    lats = lat0 + rng.integers(0, 10_000_000, n_nodes)
    highway = rng.random(n_nodes) < 0.05

    def meta(i):
        return {
            "id": int(i), "version": 1, "timestamp": 1_700_000_000 + int(i) % 1000,
            "changeset": 7, "uid": 1, "user": "stress",
        }

    nodes = []
    for i in range(n_nodes):
        tags = {}
        if highway[i]:
            tags = {"highway": "crossing"}
        nodes.append({**meta(i + 1), "lon": int(lons[i]), "lat": int(lats[i]),
                      "tags": tags})

    n_ways = n_nodes // 5
    ways = []
    for w in range(n_ways):
        k = 2 + int(rng.integers(0, 8))
        refs = (1 + rng.integers(0, n_nodes, k)).tolist()
        if w % 97 == 0:
            refs.append(10_000_000_000 + w)  # dangling ref → MAXC coords
        closed = w % 7 == 0
        if closed:
            refs.append(refs[0])
        tags = (
            {"building": "yes"} if closed and w % 14 == 0
            else {"highway": "residential", "name": f"w{w}"}
        )
        ways.append({**meta(1_000_000 + w), "refs": [int(r) for r in refs],
                     "tags": tags})

    n_rels = max(1, n_nodes // 100)
    rels = []
    for r in range(n_rels):
        kind = r % 3
        if kind == 0:
            members = [
                ("way", int(1_000_000 + (r * 13 + j) % n_ways), "outer")
                for j in range(2)
            ]
            tags = {"type": "multipolygon", "landuse": "forest"}
        elif kind == 1:
            members = [
                ("way", int(1_000_000 + (r * 7) % n_ways), "from"),
                ("node", int(1 + (r * 11) % n_nodes), "via"),
                ("way", int(1_000_000 + (r * 7 + 1) % n_ways), "to"),
            ]
            tags = {"type": "restriction", "restriction": "no_left_turn"}
        else:
            members = [
                ("node", int(1 + (r * 3 + j) % n_nodes), "stop")
                for j in range(3)
            ]
            tags = {"type": "route", "route": "bus"}
        rels.append({**meta(2_000_000 + r), "members": members, "tags": tags})
    return nodes, ways, rels


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from collections import Counter

    from oma_ray.pipelines.osm import convert_osm
    from oma_ray.pipelines.osm_dist import convert_pbf_distributed
    from oma_ray.sources.pbf import pbf_blob_index, write_pbf
    from oma_ray.stages.classify import TypeConfig
    from oma_ray.synth import default_bbs_text

    t0 = time.time()
    nodes, ways, rels = synth_big_osm(n_nodes)
    print(f"synth: {len(nodes)} nodes, {len(ways)} ways, {len(rels)} rels "
          f"in {time.time()-t0:.1f}s")

    t0 = time.time()
    path = f"/tmp/stress_{n_nodes}.pbf"
    write_pbf(path, nodes, ways, rels)
    print(f"pbf: {len(pbf_blob_index(path))} blobs, "
          f"{__import__('os').path.getsize(path)//1024} KiB "
          f"in {time.time()-t0:.1f}s")

    cfg = TypeConfig.default()
    t0 = time.time()
    dist = convert_pbf_distributed(path, default_bbs_text(), cfg)
    t_dist = time.time() - t0
    print(f"distributed: {len(dist)} entries in {t_dist:.1f}s "
          f"({len(nodes)+len(ways)+len(rels)} elements → "
          f"{(len(nodes)+len(ways)+len(rels))/t_dist:,.0f} elem/s)")

    t0 = time.time()
    ref = convert_osm(nodes, ways, rels, default_bbs_text(), cfg)
    t_drv = time.time() - t0
    print(f"driver-side: {len(ref)} entries in {t_drv:.1f}s")

    ok = Counter(dist) == Counter(ref)
    print("MULTISET MATCH:", ok)
    ray.shutdown()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
