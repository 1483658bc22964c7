"""MIME sniffing (q86) payload bytes + surprisal (q87) integer math."""

import numpy as np
import pyarrow as pa


def test_q86_png_magic_is_raw_bytes_sf0001():
    # regression: a "\\x89" planted via a str literal UTF-8-encodes to TWO
    # bytes and breaks the magic — the fixture must produce raw binary
    import duckdb

    from oma_ray.pipelines.queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    eng = QUERIES["q86_mime_sniff"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ora = con.execute(ORACLES["q86_mime_sniff"]).df()
    key = ["host", "mime"]
    e = eng.sort_values(key).reset_index(drop=True)
    o = ora.sort_values(key).reset_index(drop=True)
    assert e[key].values.tolist() == o[key].values.tolist()
    assert e["n"].tolist() == o["n"].tolist()
    # all three classes actually occurred (fixture sanity)
    assert set(eng["mime"]) == {"text/html", "application/pdf", "image/png"}


def test_bit_length_frexp_exact():
    # the q87 kernel's frexp bit-length must equal int.bit_length for the
    # whole count range it can see (exact under 2^53)
    xs = np.array(
        [1, 2, 3, 4, 7, 8, 1023, 1024, 1025, 2**40 - 1, 2**40, 2**52 - 1,
         2**52, 2**53 - 1],
        dtype=np.int64,
    )
    _, e = np.frexp(xs.astype(np.float64))
    got = e.astype(np.int64)
    want = np.array([int(x).bit_length() for x in xs], dtype=np.int64)
    assert (got == want).all()


def test_q90_depth_scan_sf0001():
    import duckdb

    from oma_ray.pipelines.queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    eng = QUERIES["q90_html_depth"](sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ora = con.execute(ORACLES["q90_html_depth"]).df().sort_values(
        "doc_id").reset_index(drop=True)
    for c in ("n_open", "n_close", "max_depth"):
        assert eng[c].tolist() == ora[c].tolist(), c
    assert eng["max_depth"].max() == 8  # deepest planted nesting (k=6)
