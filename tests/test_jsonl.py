"""JSONL source/sink: byte-determinism and adversarial-text round-trips."""

import gzip
import json
import os

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=8),
       st.integers(min_value=0, max_value=2**53))
def test_jsonl_encoding_roundtrips_any_text(texts, base_id):
    # the writer's encoding (pandas C serializer) must round-trip every
    # unicode string through json exactly — checked WITHOUT ray: encode
    # the same frame the shard writer does, decode with the json module
    import pandas as pd

    df = pd.DataFrame({"doc_id": [base_id + i for i in range(len(texts))],
                       "text": texts})
    body = df.to_json(orient="records", lines=True, force_ascii=True)
    rows = [json.loads(line) for line in body.splitlines() if line]
    assert [r["text"] for r in rows] == texts
    assert [r["doc_id"] for r in rows] == list(df["doc_id"])


def _mini_ds(rows):
    import ray.data as rd

    t = pa.table(rows)
    return rd.from_arrow(t)


def test_jsonl_roundtrip_adversarial_text(ray_session, tmp_path):
    from oma_ray.sources.jsonl import read_jsonl, write_jsonl

    texts = [
        "plain ascii",
        "newline\nand\ttab",
        'quotes " and \\ backslash',
        "unicode: café ☃ \U0001f600",
        "",
        "trailing space ",
    ]
    rows = {"doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
            "n": pa.array([len(t) for t in texts], pa.int64())}
    out = str(tmp_path / "jl")
    write_jsonl(_mini_ds(rows), out)
    back = read_jsonl(out).to_pandas().sort_values("doc_id")
    assert list(back["text"]) == texts
    assert list(back["n"]) == [len(t) for t in texts]
    assert os.path.isdir(os.path.join(out, "_manifest"))


def test_csv_roundtrip_adversarial_text(ray_session, tmp_path):
    from oma_ray.sources.csvio import read_csv_shards, write_csv

    texts = [
        "plain ascii",
        "embedded\nnewline",
        'quotes "inside" and, commas',
        "unicode: café ☃",
        "trailing space ",
        "semi;colon\ttab",
    ]
    rows = {"doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
            "n": pa.array([len(t) for t in texts], pa.int64())}
    out = str(tmp_path / "csv")
    write_csv(_mini_ds(rows), out)
    back = read_csv_shards(out).to_pandas().sort_values("doc_id")
    assert list(back["text"]) == texts
    assert list(back["n"]) == [len(t) for t in texts]


def test_csv_numeric_looking_text_needs_pinned_types(ray_session, tmp_path):
    import pyarrow as pa_

    from oma_ray.sources.csvio import read_csv_shards, write_csv

    texts = ["007", "123", "0042"]  # all numeric-looking: inference trap
    rows = {"doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(texts)}
    out = str(tmp_path / "csvnum")
    write_csv(_mini_ds(rows), out)
    back = read_csv_shards(out, column_types={
        "doc_id": pa_.int64(), "text": pa_.string()}
    ).to_pandas().sort_values("doc_id")
    assert list(back["text"]) == texts  # leading zeros preserved


def test_jsonl_shards_are_deterministic(ray_session, tmp_path):
    from oma_ray.sources.jsonl import write_jsonl

    rows = {"doc_id": pa.array([7, 8, 9], pa.int64()),
            "text": pa.array(["a", "b", "c"])}
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_jsonl(_mini_ds(rows), d1)
    write_jsonl(_mini_ds(rows), d2)
    f1 = sorted(f for f in os.listdir(d1) if f.endswith(".gz"))
    f2 = sorted(f for f in os.listdir(d2) if f.endswith(".gz"))
    assert f1 == f2 and f1  # same shard names (min-id derived)
    for f in f1:
        b1 = open(os.path.join(d1, f), "rb").read()
        b2 = open(os.path.join(d2, f), "rb").read()
        assert b1 == b2  # gzip mtime=0 → byte-identical reruns
        assert gzip.decompress(b1).endswith(b"\n")
