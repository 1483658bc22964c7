"""Small-file compaction: multiset preservation, file-count reduction,
journal recovery in both crash windows."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _make_dir(tmp, buckets=3, files_per=5, rows=200):
    root = os.path.join(tmp, "tiled")
    n = 0
    for b in range(buckets):
        d = os.path.join(root, f"tile_bucket={b}")
        os.makedirs(d)
        for f in range(files_per):
            ids = np.arange(n, n + rows, dtype=np.int64)
            n += rows
            pq.write_table(
                pa.table({"page_id": ids, "v": ids * 7 % 97}),
                os.path.join(d, f"part-{f}.parquet"),
            )
    return root


def _read_all(root) -> pd.DataFrame:
    frames = []
    for dirpath, _d, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith("."):
                frames.append(pq.read_table(os.path.join(dirpath, f)).to_pandas())
    return (
        pd.concat(frames, ignore_index=True)
        .sort_values("page_id")
        .reset_index(drop=True)
    )


def test_compact_preserves_multiset_and_reduces_files(tmp_path):
    from oma_ray.state.compact import compact_dir

    root = _make_dir(str(tmp_path))
    before = _read_all(root)
    stats = compact_dir(root, target_bytes=1 << 30)
    after = _read_all(root)
    assert stats["files_before"] == 15 and stats["files_after"] == 3
    pd.testing.assert_frame_equal(before, after)


def test_compact_respects_target_bytes(tmp_path):
    from oma_ray.state.compact import compact_dir

    root = _make_dir(str(tmp_path), buckets=1, files_per=6)
    fsz = os.path.getsize(
        os.path.join(root, "tile_bucket=0", "part-0.parquet")
    )
    before = _read_all(root)
    stats = compact_dir(root, target_bytes=int(fsz * 2.5))  # runs of 2
    assert stats["files_after"] == 3
    pd.testing.assert_frame_equal(before, _read_all(root))


def test_recover_finishes_interrupted_deletion(tmp_path):
    """Crash window (b): new file written, originals not yet deleted —
    recovery must delete them (keeping them would duplicate rows)."""
    from oma_ray.state.compact import JOURNAL, recover_dir

    root = _make_dir(str(tmp_path), buckets=1, files_per=2)
    d = os.path.join(root, "tile_bucket=0")
    olds = sorted(os.listdir(d))
    merged = pa.concat_tables(
        [pq.read_table(os.path.join(d, f)) for f in olds]
    )
    pq.write_table(merged, os.path.join(d, "compacted-0000-2.parquet"))
    with open(os.path.join(d, JOURNAL), "w") as f:
        json.dump({"new": "compacted-0000-2.parquet", "olds": olds}, f)
    assert recover_dir(d) == "finished"
    left = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert left == ["compacted-0000-2.parquet"]
    assert len(_read_all(root)) == 400


def test_recover_rolls_back_missing_new_file(tmp_path):
    """Crash window (a): journal written but the new file never landed —
    originals must stay, journal must go."""
    from oma_ray.state.compact import JOURNAL, recover_dir

    root = _make_dir(str(tmp_path), buckets=1, files_per=2)
    d = os.path.join(root, "tile_bucket=0")
    olds = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    with open(os.path.join(d, JOURNAL), "w") as f:
        json.dump({"new": "compacted-9999-2.parquet", "olds": olds}, f)
    assert recover_dir(d) == "rolled_back"
    assert sorted(f for f in os.listdir(d) if f.endswith(".parquet")) == olds
    assert len(_read_all(root)) == 400
    assert recover_dir(d) is None  # idempotent


def test_recompaction_never_reuses_an_input_name(tmp_path):
    """Regression: merging a previous 'compacted-*' output with a new small
    file must not name the result identically to its own input (the cleanup
    loop would delete the merged data)."""
    from oma_ray.state.compact import compact_dir

    root = _make_dir(str(tmp_path), buckets=1, files_per=3)
    stats1 = compact_dir(root, target_bytes=1 << 30)
    assert stats1["files_after"] == 1
    # a late shard lands; compact again
    d = os.path.join(root, "tile_bucket=0")
    ids = np.arange(10_000, 10_050, dtype=np.int64)
    pq.write_table(
        pa.table({"page_id": ids, "v": ids * 7 % 97}),
        os.path.join(d, "part-late.parquet"),
    )
    before = _read_all(root)
    stats2 = compact_dir(root, target_bytes=1 << 30)
    after = _read_all(root)
    assert stats2["files_after"] == 1
    pd.testing.assert_frame_equal(before, after)
    assert len(after) == 3 * 200 + 50


def test_compact_skips_locked_directory(tmp_path):
    import fcntl
    import os

    from oma_ray.state.compact import LOCK, _compact_one

    d = tmp_path / "part"
    d.mkdir()
    t = pa.table({"x": pa.array([1, 2, 3], type=pa.int64())})
    for i in range(3):
        pq.write_table(t, d / f"f{i}.parquet")
    # flock held by "another" compactor → skip untouched (kernel-arbitrated:
    # a crashed holder's lock auto-releases, so no staleness heuristic)
    fd = os.open(str(d / LOCK), os.O_CREAT | os.O_WRONLY)
    fcntl.flock(fd, fcntl.LOCK_EX)
    st = _compact_one(str(d), 1 << 30)
    assert st["skipped"] == "locked" and st["before"] == st["after"] == 3
    assert sorted(f for f in os.listdir(d) if f.endswith(".parquet")) == [
        "f0.parquet", "f1.parquet", "f2.parquet"
    ]
    # holder releases (process exit / crash) → compaction proceeds; the
    # lock FILE remaining on disk must not block anyone
    os.close(fd)
    assert (d / LOCK).exists()
    st = _compact_one(str(d), 1 << 30)
    assert st["before"] == 3 and st["after"] == 1
