"""Join strategies: hash-shuffle Dataset.join and broadcast join vs a pandas
oracle (the query suite uses broadcast for its small filtered sides, so the
large-large hash path is exercised here)."""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_hash_join_matches_pandas_oracle():
    import ray.data as rd

    from oma_ray.sources.parquet import read_parquet_clean
    from oma_ray.stages.join import hash_join

    li = read_parquet_clean(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    orders = read_parquet_clean(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    got = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey", join_type="inner",
        num_partitions=4,
    ).to_pandas()

    ldf = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    odf = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    want = ldf.merge(odf, left_on="l_orderkey", right_on="o_orderkey")
    assert len(got) == len(want)
    gs = got.groupby("l_orderkey").agg(n=("l_quantity", "size"), q=("l_quantity", "sum"))
    ws = want.groupby("l_orderkey").agg(n=("l_quantity", "size"), q=("l_quantity", "sum"))
    pd.testing.assert_frame_equal(gs, ws)


def test_broadcast_join_left_outer_nulls():
    import ray
    import ray.data as rd

    from oma_ray.stages.join import broadcast_join

    left = rd.from_arrow(pa.table({"k": [1, 2, 3, 4], "v": [10, 20, 30, 40]}))
    small = pa.table({"k": [2, 4], "name": ["b", "d"]})
    got = (
        broadcast_join(left, ray.put(small), keys="k", join_type="left outer")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["name"].tolist() == [None, "b", None, "d"]


def test_hash_join_dedup_right_no_fanout(ray_session):
    """dedup_right keeps one right row per key even when every key is
    duplicated across many blocks (within-block dedup is global because
    the colocated exchange gathers all copies of a key into one block)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from oma_ray.stages.join import hash_join

    left = rd.from_arrow(pa.table({"k": list(range(100)), "v": list(range(100))}))
    rdup = rd.from_pandas(
        pd.DataFrame({"rk": [i % 20 for i in range(1000)], "flag": [1] * 1000})
    ).repartition(10)
    df = hash_join(
        left, rdup, on="k", right_on="rk", join_type="left_outer",
        dedup_right=True,
    ).to_pandas()
    assert len(df) == 100
    assert df[df["k"] < 20]["flag"].notna().all()
    assert df[df["k"] >= 20]["flag"].isna().all()


def test_lookup_join_nested_payload_and_misses(ray_session):
    """lookup_join: the Acero-free colocated merge must (a) carry nested
    list columns on the left through the exchange, (b) null-fill right
    payloads on misses, (c) fan out duplicate LEFT keys while right keys
    stay unique — verified against a pandas merge oracle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from oma_ray.stages.join import lookup_join

    rng = np.random.default_rng(9)
    n = 5000
    keys = rng.integers(0, 3000, n)  # duplicate left keys
    left = pa.table(
        {
            "k": pa.array(keys, type=pa.int64()),
            "tags": pa.array(
                [[str(i % 7)] * (i % 3) for i in range(n)],
                type=pa.list_(pa.string()),
            ),
            "payload": pa.array(np.arange(n), type=pa.int64()),
        }
    )
    rkeys = np.unique(rng.integers(0, 3000, 2000))  # unique right keys
    right = pa.table(
        {
            "rk": pa.array(rkeys, type=pa.int64()),
            "val": pa.array([f"v{k}" for k in rkeys], type=pa.string()),
        }
    )
    out = lookup_join(
        rd.from_arrow(left).repartition(8),
        rd.from_arrow(right).repartition(4),
        on="k", right_on="rk", num_partitions=4,
    ).take_all()

    ldf = left.to_pandas()
    rdf = right.to_pandas().rename(columns={"rk": "k"})
    want = ldf.merge(rdf, on="k", how="left")
    got = pd.DataFrame(out)
    assert len(got) == len(want) == n
    want_s = want.sort_values("payload").reset_index(drop=True)
    got_s = got.sort_values("payload").reset_index(drop=True)
    assert (got_s["k"] == want_s["k"]).all()
    assert got_s["val"].fillna("∅").tolist() == want_s["val"].fillna("∅").tolist()
    # nested column survived untouched
    assert [list(x) for x in got_s["tags"]] == [list(x) for x in want_s["tags"]]


def test_asof_join_semantics(ray_session):
    """stages/asof.asof_join: inclusive timestamp ties (a left AT a
    right's ts matches it), last-at-or-before wins among several,
    unmatched lefts drop (inner), keys never cross — checked against a
    brute-force per-row oracle on interleaved keys."""
    import ray.data as rd

    from oma_ray.stages.asof import asof_join

    # rights: key 1 at t=10,20,20?  keep (k,ts) unique: t=10,20; key 2 at t=15
    right = pa.table(
        {
            "k": pa.array([1, 1, 2], type=pa.int64()),
            "ts": pa.array([10, 20, 15], type=pa.int64()),
            "rv": pa.array([100, 200, 300], type=pa.int64()),
        }
    )
    # lefts: before-any (drops), exact-tie, between, after-all, other key,
    # key with no rights at all (drops)
    left = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 2, 3], type=pa.int64()),
            "ts": pa.array([5, 10, 19, 99, 14, 50], type=pa.int64()),
            "lv": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
        }
    )
    got = (
        asof_join(
            rd.from_arrow(left), rd.from_arrow(right),
            on="k", ts="ts", right_out_ts="rts",
            left_payload=[("lv", pa.int64())],
            right_payload=[("rv", pa.int64())],
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    # expected: lv=0 drops (ts 5 < first right 10); lv=1 ties to t=10;
    # lv=2 → t=10; lv=3 → t=20; lv=4 drops (14 < 15); lv=5 drops (no key)
    assert got["lv"].tolist() == [1, 2, 3]
    assert got["rts"].tolist() == [10, 10, 20]
    assert got["rv"].tolist() == [100, 100, 200]
    assert got["ts"].tolist() == [10, 19, 99]
    assert got["k"].tolist() == [1, 1, 1]
    assert list(got.columns) == ["k", "ts", "lv", "rts", "rv"]


def test_sort_merge_join_matches_hash_join(ray_session):
    """Same rows out of both physical plans, incl. duplicate keys and
    keys missing on either side."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from oma_ray.stages.join import hash_join, sort_merge_join

    rng = np.random.RandomState(11)
    lk = rng.randint(0, 40, size=500).astype(np.int64)
    rk = rng.randint(20, 60, size=120).astype(np.int64)
    left = pa.table({"k": pa.array(lk),
                     "lv": pa.array(np.arange(500, dtype=np.int64))})
    right = pa.table({"rk": pa.array(rk),
                      "rv": pa.array(np.arange(120, dtype=np.int64))})
    sm = sort_merge_join(
        rd.from_arrow(left), rd.from_arrow(right), on="k",
        right_on="rk", num_partitions=4,
        left_schema=left.schema, right_schema=right.schema).to_pandas()
    hj = hash_join(
        rd.from_arrow(left), rd.from_arrow(right), on="k",
        right_on="rk", left_schema=left.schema,
        right_schema=right.schema).to_pandas()

    def canon(df):
        return (df.sort_values(list(df.columns))
                .reset_index(drop=True))

    a, b = canon(sm), canon(hj)
    assert len(a) == len(b)
    assert (a.to_numpy() == b.to_numpy()).all()
