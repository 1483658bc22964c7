"""Link-graph extraction (stages/links.py) against the synth formula."""

import numpy as np
import pyarrow as pa

from oma_ray.stages.links import extract_link_hosts, host_int
from oma_ray.synth import synth_pages_batch


def _pages(n: int) -> pa.Table:
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([f"body text {i}" for i in range(n)]),
            "lang": pa.array(["en"] * n),
        }
    )
    return synth_pages_batch(docs)


def test_extract_link_hosts_matches_formula():
    n = 40
    pages = _pages(n)
    src_idx, host = extract_link_hosts(pages.column("html"))
    ids = pages.column("page_id").to_numpy()

    # per-page fan-out is id % 4
    counts = np.bincount(src_idx, minlength=n)
    assert (counts == ids % 4).all()

    # targets are (id * 48271 + j) % 1000 in link order
    k = host_int(host).to_numpy(zero_copy_only=False)
    expect = []
    for i in ids:
        expect += [(i * 48271 + j) % 1000 for j in range(1, i % 4 + 1)]
    assert k.tolist() == expect


def test_extract_link_hosts_no_links_rows():
    pages = _pages(9)  # ids 0,4,8 have zero links
    src_idx, host = extract_link_hosts(pages.column("html"))
    assert 0 not in src_idx and 4 not in src_idx and 8 not in src_idx
    assert len(src_idx) == len(host)


def test_extract_survives_sliced_chunked_input():
    # offsets arithmetic must hold on a sliced, multi-chunk column
    pages = _pages(20)
    col = pa.chunked_array(
        [pages.column("html").slice(3, 7), pages.column("html").slice(10, 6)]
    )
    src_idx, host = extract_link_hosts(col)
    ids = pages.column("page_id").to_numpy()
    sel = np.concatenate([ids[3:10], ids[10:16]])
    counts = np.bincount(src_idx, minlength=len(sel))
    assert (counts == sel % 4).all()
