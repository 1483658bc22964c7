"""Text extraction invariant (stages/extract.py) and crawl-delta kernels."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from oma_ray.stages.extract import extract_text, verify_extraction
from oma_ray.synth import synth_pages_batch


def _pages(n: int) -> pa.Table:
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(
                [f"body text {i} with words and\nnewlines {i}" for i in range(n)]
            ),
            "lang": pa.array(["en"] * n),
        }
    )
    return synth_pages_batch(docs)


def test_extraction_byte_identical_on_synth_pages():
    pages = _pages(64)
    out = verify_extraction(pages)
    assert out.column("matches").to_numpy().sum() == 64
    want = [len(t) for t in pages.column("text").to_pylist()]
    assert out.column("extracted_len").to_numpy().tolist() == want


def test_extraction_flags_corrupted_html():
    pages = _pages(8)
    html = pc.cast(pages.column("html"), pa.string()).to_pylist()
    html[3] = html[3].replace("body text 3", "tampered text 3")
    tampered = pages.set_column(
        pages.schema.get_field_index("html"), "html",
        pa.array(html).cast(pa.binary()),
    )
    out = verify_extraction(tampered)
    m = out.column("matches").to_numpy()
    assert m[3] == 0 and m.sum() == 7


def test_extract_text_handles_geo_and_links():
    # pages with geo meta AND up to 3 anchors still recover exactly
    pages = _pages(24)
    got = extract_text(pages.column("html"))
    assert got.to_pylist() == pages.column("text").to_pylist()


def test_q81_delta_totals_sf0001():
    import duckdb

    from oma_ray.pipelines.queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    eng = QUERIES["q81_crawl_delta"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    ora = con.execute(ORACLES["q81_crawl_delta"]).df()
    cols = ["n_added", "n_removed", "n_changed", "n_unchanged"]
    eng_s = eng.sort_values("host").reset_index(drop=True)
    ora_s = ora.sort_values("host").reset_index(drop=True)
    assert eng_s["host"].tolist() == ora_s["host"].tolist()
    for c in cols:
        assert eng_s[c].tolist() == ora_s[c].tolist(), c
