"""Partition manifest: per-shard lineage, metrics and resume.

The Ray-native replacement for the reference's chunk table + backpatched
header (ChunkGenerator.java:578-592, TypeAnalysis.java:696-712): instead of
byte offsets into one big file, the engine records one manifest entry per
completed *input shard* — lineage id, row counts, output path — appended
atomically (write temp + rename is not needed for a single O_APPEND JSON
line, but entries are only appended *after* the shard's parquet directory is
fully written, so a crash mid-shard leaves at most one orphan directory that
a rerun overwrites).

Resume = skip shards whose lineage id is already present (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").  At
cluster scale a shard is a group of input files/fragments; the lineage id is
a stable hash of the shard's input paths, so re-runs against the same input
are idempotent.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Iterator


def lineage_id(parts: list[str]) -> str:
    """Stable id of an input shard = sha1 over its sorted input paths."""
    h = hashlib.sha1()
    for p in sorted(parts):
        h.update(p.encode())
        h.update(b"\0")
    return h.hexdigest()[:16]


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def entries(self) -> Iterator[dict]:
        if not os.path.exists(self.path):
            return
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    yield json.loads(line)

    def done_lineages(self) -> set[str]:
        return {e["lineage"] for e in self.entries()}

    def mark_done(self, lineage: str, **meta: Any) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps({"lineage": lineage, **meta}) + "\n")

    def metrics(self) -> dict[str, int]:
        """Aggregate counters across shards (the engine's A2-equivalent:
        Reunify.java:40 nc/wc/rc counters → per-shard rows/matched sums)."""
        out: dict[str, int] = {}
        for e in self.entries():
            for k, v in e.items():
                if isinstance(v, (int, float)) and k != "lineage":
                    out[k] = out.get(k, 0) + v
        return out
