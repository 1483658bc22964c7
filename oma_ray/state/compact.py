"""Small-file compaction for partitioned parquet outputs.

At 100 TB a long-running partitioned sink accumulates small files (salted
hot buckets write n_salts files per directory, resumable shards append per
run); readers then pay per-file open/footer costs.  ``compact_dir`` merges
each leaf directory's files into ~``target_bytes`` outputs, one Ray task
per directory (embarrassingly parallel, no shuffle — rows never leave
their partition).

Crash safety is a per-directory JOURNAL, not atomicity: the journal file
names the replacement and the originals before anything is deleted, so a
crash anywhere leaves either (a) originals intact (journal without new
file → discard journal) or (b) new file complete (journal + new file →
finish deleting originals).  ``recover_dir`` applies that rule; both the
compactor and readers may call it idempotently.

READER CONTRACT: between the new file landing and the originals being
deleted, a directory transiently holds BOTH copies of its rows — a reader
that scans mid-compaction without first calling ``recover_dir`` (or
filtering via the journal's ``olds`` list) can observe duplicates.  Call
``recover_dir`` on each leaf before scanning, or scan only quiescent
outputs.

CONCURRENCY: a per-directory lock file makes concurrent ``compact_dir``
calls on the same tree safe — a second compactor skips locked
directories instead of interleaving with the first (two interleaved
compactors could each recover the other's journal mid-flight).  Locks
older than ``stale_lock_secs`` are presumed crashed and broken (the
journal, not the lock, is what guarantees crash safety).  The multiset of rows is
preserved exactly; within-file row order is preserved by concatenation in
file-name order (write_tiled's sort-within-tile emits sorted files, and
sorted runs concatenated in salt order stay grouped per tile bucket).
"""

from __future__ import annotations

import json
import os

JOURNAL = ".compact.json"
LOCK = ".compact.lock"


def _leaf_dirs(root: str) -> list[str]:
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") and not f.startswith(".") for f in filenames):
            out.append(dirpath)
    return sorted(out)


def recover_dir(d: str) -> str | None:
    """Finish or roll back an interrupted compaction in ``d`` (idempotent).
    Returns 'finished', 'rolled_back' or None (no journal)."""
    jpath = os.path.join(d, JOURNAL)
    if not os.path.exists(jpath):
        return None
    with open(jpath) as f:
        j = json.load(f)
    new = os.path.join(d, j["new"])
    if os.path.exists(new):
        for old in j["olds"]:
            if old == j["new"]:
                continue  # defensive: never delete the replacement itself
            p = os.path.join(d, old)
            if os.path.exists(p):
                os.remove(p)
        os.remove(jpath)
        return "finished"
    os.remove(jpath)  # crash before the new file finished: originals intact
    return "rolled_back"


def _compact_one(d: str, target_bytes: int,
                 stale_lock_secs: float = 3600.0) -> dict:
    """``stale_lock_secs`` is retained for API compatibility but unused:
    the lock is a kernel-arbitrated ``flock`` (atomic, auto-released when
    the holder exits or crashes), so there is no staleness heuristic and
    no remove-then-recreate TOCTOU window.  The lock FILE persists on disk
    by design — deleting it while a peer holds the fd would let a third
    compactor lock a fresh inode and run concurrently.  Advisory flock
    coordinates compactors sharing a host/local fs; a multi-node deployment
    over a shared fs should route compaction through one Ray job (as
    ``compact_dir`` does: one task per directory) or an external lock
    service."""
    import fcntl

    def _skipped(reason: str) -> dict:
        n = len([f for f in os.listdir(d)
                 if f.endswith(".parquet") and not f.startswith(".")])
        return {"dir": d, "before": n, "after": n, "skipped": reason}

    lpath = os.path.join(d, LOCK)
    fd = os.open(lpath, os.O_CREAT | os.O_WRONLY)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        os.close(fd)
        # another compactor owns this directory — skip, don't interleave
        return _skipped("locked")
    try:
        os.truncate(fd, 0)
        os.write(fd, str(os.getpid()).encode())
        return _compact_locked(d, target_bytes)
    finally:
        os.close(fd)  # releases the flock; the lock file stays


def _compact_locked(d: str, target_bytes: int) -> dict:
    import pyarrow.parquet as pq

    recover_dir(d)
    files = sorted(
        f for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    if len(files) < 2:
        return {"dir": d, "before": len(files), "after": len(files)}
    sizes = {f: os.path.getsize(os.path.join(d, f)) for f in files}
    # greedy runs of adjacent (name-ordered) files up to target_bytes
    runs, cur, cur_bytes = [], [], 0
    for f in files:
        if cur and cur_bytes + sizes[f] > target_bytes:
            runs.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += sizes[f]
    runs.append(cur)
    before, after = len(files), 0
    for ri, run in enumerate(runs):
        after += 1
        if len(run) < 2:
            continue
        # the output name must never collide with an input (a re-compaction
        # can merge a previous 'compacted-0000-*' file: reusing its name
        # would delete the merged data in the cleanup loop below, and a
        # journal whose 'new' equals an 'old' breaks recovery)
        gen = 0
        new = f"compacted-{ri:04d}-{len(run)}.parquet"
        while new in files or os.path.exists(os.path.join(d, new)):
            gen += 1
            new = f"compacted-{ri:04d}-{len(run)}-g{gen}.parquet"
        jpath = os.path.join(d, JOURNAL)
        tmp = os.path.join(d, f".tmp-{new}")
        import pyarrow as pa

        tables = [pq.read_table(os.path.join(d, f)) for f in run]
        merged = pa.concat_tables(tables, promote_options="default")
        with open(jpath + ".tmp", "w") as f:
            json.dump({"new": new, "olds": run}, f)
        os.replace(jpath + ".tmp", jpath)  # journal first, atomically
        pq.write_table(merged, tmp)
        os.replace(tmp, os.path.join(d, new))
        for old in run:
            os.remove(os.path.join(d, old))
        os.remove(jpath)
    return {"dir": d, "before": before, "after": after}


def compact_dir(root: str, target_bytes: int = 128 << 20) -> dict:
    """Compact every leaf partition directory under ``root``; one Ray task
    per directory.  Returns {dirs, files_before, files_after}."""
    import ray

    dirs = _leaf_dirs(root)
    task = ray.remote(num_cpus=1)(_compact_one)
    stats = ray.get([task.remote(d, target_bytes) for d in dirs])
    return {
        "dirs": len(dirs),
        "files_before": sum(s["before"] for s in stats),
        "files_after": sum(s["after"] for s in stats),
    }
