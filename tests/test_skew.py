"""Salted-key skew handling: hot keys detected and spread across salts."""

import numpy as np
import pyarrow as pa


def _skewed_ds():
    import ray.data as rd

    # one hot key (60% of rows) + uniform tail
    n = 20_000
    rows = np.arange(n, dtype=np.int64)
    keys = np.where(rows % 10 < 6, 7, rows % 997).astype(np.int64)
    t = pa.table({"cell": keys, "page_id": rows})
    return rd.from_arrow(t).repartition(8)


def test_find_hot_keys():
    from oma_ray.stages.skew import find_hot_keys

    hot = find_hot_keys(_skewed_ds(), "cell", hot_share=0.05)
    assert hot == {7}


def test_salted_repartition_bounds_partition_size():
    from oma_ray.stages.skew import salted_repartition

    ds, hot = salted_repartition(
        _skewed_ds(), "cell", "page_id", num_partitions=16, n_salts=8,
        hot_share=0.05,
    )
    assert hot == {7}
    sizes = [len(b) for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")]
    total = sum(sizes)
    assert total == 20_000
    # unsalted, the hot key alone would put 12k rows (60%) in one partition;
    # salted, no partition should exceed ~3x the fair share
    assert max(sizes) < 3 * total / 16, sizes

    # correctness: per-(cell,salt) groups merge back to exact per-cell counts
    rows = np.arange(20_000, dtype=np.int64)
    keys = np.where(rows % 10 < 6, 7, rows % 997)
    expect_hot = int((keys == 7).sum())
    df = ds.to_pandas()
    merged = df.groupby("cell").size()
    assert merged[7] == expect_hot
    assert merged.sum() == 20_000
    salts_used = df.loc[df["cell"] == 7, "salt"].nunique()
    assert salts_used == 8
    assert (df.loc[df["cell"] != 7, "salt"] == 0).all()


def test_format_sniffer():
    import pathlib
    import tempfile

    from oma_ray.sources.sniff import detect_format

    with tempfile.TemporaryDirectory() as td:
        p = pathlib.Path(td)
        (p / "a.o5m").write_bytes(bytes([0xFF, 0xE0, 0x04]) + b"o5m2rest")
        (p / "a.pbf").write_bytes(b"\x00\x00\x00\x0d\x0a\x09OSMHeader")
        (p / "a.osm").write_text("<?xml version='1.0'?><osm/>")
        assert detect_format(str(p / "a.o5m")) == "o5m"
        assert detect_format(str(p / "a.pbf")) == "pbf"
        assert detect_format(str(p / "a.osm")) == "xml"
    assert detect_format("/root/repo/tests/golden/default.oma") == "oma"


def test_empty_input_grouped_sums_and_hot_keys():
    """Empty inputs: hash shuffle emits zero blocks (schema lost) — the
    anchor param keeps _grouped_sums projectable and find_hot_keys returns
    an empty set instead of KeyError."""
    import pandas as pd
    import ray.data as rd

    from oma_ray.pipelines.queries import _grouped_sums
    from oma_ray.stages.skew import find_hot_keys

    empty = rd.from_arrow(pa.table({"k": pa.array([], type=pa.int64())}))
    assert find_hot_keys(empty, "k") == set()

    def partial(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": batch.column("k").to_numpy(zero_copy_only=False),
                "n": np.ones(len(batch), dtype=np.int64),
            }
        )

    anchor = pa.table(
        {"k": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())}
    )
    out = _grouped_sums(empty, ["k"], partial, ["n"], anchor=anchor)
    # the anchor keeps schema() alive; the empty exchange's blocks are
    # zero-column and unrepairable (map tasks skip empty blocks), so
    # to_pandas column presence is what consumers must guard for.
    m = out.materialize()
    assert m.count() == 0
    assert m.schema() is not None and m.schema().names == ["k", "n"]
