"""PII scan/redaction (stages/pii.py) and near-dup clustering
(stages/curation.py::dup_clusters)."""

import numpy as np
import pyarrow as pa

from oma_ray.stages.pii import pii_scan, plant_pii, redact


def _docs(n: int) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([f"plain body {i} end" for i in range(n)]),
        }
    )


def test_pii_plant_and_scan_counts():
    n = 100
    scanned = pii_scan(plant_pii(_docs(n)))
    ids = scanned.column("doc_id").to_numpy()
    assert (scanned.column("n_email").to_numpy() == (ids % 7 == 3)).all()
    assert (scanned.column("n_phone").to_numpy() == (ids % 11 == 5)).all()
    assert (scanned.column("n_ip").to_numpy() == (ids % 13 == 2)).all()


def test_pii_redaction_removes_everything():
    planted = plant_pii(_docs(200))
    red = redact(planted.column("text"))
    rescan = pii_scan(planted.set_column(
        planted.schema.get_field_index("text"), "text", red))
    for c in ("n_email", "n_phone", "n_ip"):
        assert rescan.column(c).to_numpy().sum() == 0


def test_pii_clean_text_untouched():
    clean = _docs(50)
    scanned = pii_scan(clean)
    for c in ("n_email", "n_phone", "n_ip"):
        assert scanned.column(c).to_numpy().sum() == 0
    lens = np.array([len(t) for t in clean.column("text").to_pylist()])
    assert (scanned.column("red_len").to_numpy() == lens).all()


# --- dup_clusters -------------------------------------------------------------


def _brute_clusters(texts: dict[int, str], n: int, max_df: int):
    """Driver-side reference: gram df filter → chain edges → union-find."""
    from oma_ray.stages.cc import union_find_components

    grams: dict[str, set[int]] = {}
    for d, t in texts.items():
        toks = t.split(" ")
        for i in range(len(toks) - n + 1):
            grams.setdefault(" ".join(toks[i:i + n]), set()).add(d)
    a, b = [], []
    for g, docs in grams.items():
        docs = sorted(docs)
        if 2 <= len(docs) <= max_df:
            a += docs[:-1]
            b += docs[1:]
    if not a:
        return {}
    df = union_find_components(np.array(a, np.int64), np.array(b, np.int64))
    return dict(zip(df["node"], df["comp"]))


def _run_clusters(table: pa.Table, n_blocks: int, **kw):
    import ray.data as rd

    from oma_ray.stages.curation import dup_clusters

    ds = rd.from_arrow(table).repartition(n_blocks)
    out = dup_clusters(ds, **kw).to_pandas()
    return dict(zip(out["doc_id"], out["canon_id"]))


def test_dup_clusters_matches_brute_force():
    # rare trigrams shared pairwise + an over-cap gram shared by all
    texts = {
        0: "common common common alpha beta gamma x",
        1: "common common common alpha beta gamma y",
        2: "common common common delta eps zeta p",
        3: "common common common delta eps zeta q",
        4: "common common common solo words only here",
        5: "bridge link chain one two three",
        6: "bridge link chain four five six",
        7: "four five six seven eight nine",
    }
    table = pa.table(
        {
            "doc_id": pa.array(list(texts), type=pa.int64()),
            "text": pa.array(list(texts.values())),
        }
    )
    expect = _brute_clusters(texts, n=3, max_df=3)
    got = _run_clusters(table, n_blocks=3, n=3, max_df=3)
    assert got == expect
    # sanity on the fixture itself: transitive merge 5-6-7 happened
    assert got[5] == got[7] == 5


def test_dup_clusters_sentinel_blocks_batch_split_undercount():
    # gram "w w w" lives in 6 docs; any 2-block split leaves some block
    # with >3 of them (collapsed to a sentinel) or the exchange sees >3
    # rows — either way NO edges may come from it.  Docs 10/11 share a
    # genuinely rare gram and must still cluster.
    texts = {i: f"w w w filler{i} tail{i}" for i in range(6)}
    texts[10] = "rare pair gram ten uniq0"
    texts[11] = "rare pair gram eleven uniq1"
    table = pa.table(
        {
            "doc_id": pa.array(list(texts), type=pa.int64()),
            "text": pa.array(list(texts.values())),
        }
    )
    expect = _brute_clusters(texts, n=3, max_df=3)
    for n_blocks in (1, 2, 4):
        got = _run_clusters(table, n_blocks=n_blocks, n=3, max_df=3)
        assert got == expect, n_blocks
    assert expect.get(10) == 10 and expect.get(11) == 10
    assert 0 not in expect  # the df=6 gram produced no cluster
