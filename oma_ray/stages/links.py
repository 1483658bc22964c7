"""Link-graph extraction from raw page HTML — anchors → (src_host, dst_host)
edges → host-level web graph.

This is the web-scale generalization of the reference's reference-resolution
joins (way→node, relation→member membership maps, RelationAnalysis /
WayAnalysis in `/root/reference`): there the graph edges are OSM id
references inside elements; here they are ``<a href>`` targets inside page
HTML.  Same shape — parse references out of the payload, key them, and
aggregate/join on the referenced entity.

Kernels are all-Arrow: one ``split_pattern`` over the whole batch yields a
list-array of anchor segments, offsets give the per-page fan-out, and a
single anchored ``extract_regex`` pulls the target host from every segment —
no per-row Python anywhere.  Scale shape: the extracted edge table is
(host, host, count) — tiny compared to the HTML it came from — and the
pair aggregation is the standard partial → keyed exchange → combine, so
only pre-aggregated host pairs move in the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ANCHOR = '<a href="https://'
_HOST_RE = r'^(?P<h>[^/">]+)/'
_URL_HOST_RE = r"^https?://([^/]+)/.*$"


def extract_link_hosts(html) -> tuple[np.ndarray, pa.Array]:
    """All anchor targets in a batch of HTML.

    Returns ``(src_row_idx:int64 ndarray, dst_host:string Array)`` — one
    entry per ``<a href="https://...">`` occurrence, ``src_row_idx``
    pointing back at the originating row of the batch.
    """
    s = pc.cast(html, pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    parts = pc.split_pattern(s, _ANCHOR)
    offsets = np.asarray(parts.offsets)
    off = offsets - offsets[0]
    counts = np.diff(off)
    flat = parts.flatten()
    # segment 0 of each row is the pre-anchor prefix — drop it; every later
    # segment starts with "host/..." (the text that followed the pattern)
    keep = np.ones(len(flat), dtype=bool)
    keep[off[:-1]] = False
    link_flat = flat.filter(pa.array(keep))
    src_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts - 1)
    host = pc.struct_field(pc.extract_regex(link_flat, _HOST_RE), "h")
    return src_idx, host


def _edge_partial(batch: pa.Table):
    """Per-batch (src_host, dst_host, n_links=1) partial rows."""
    import pandas as pd

    src_idx, dst_host = extract_link_hosts(batch.column("html"))
    src_all = pc.replace_substring_regex(
        pc.cast(batch.column("url"), pa.string()), _URL_HOST_RE, r"\1"
    )
    src_host = src_all.take(pa.array(src_idx))
    return pd.DataFrame(
        {
            "src_host": src_host.to_numpy(zero_copy_only=False),
            "dst_host": dst_host.to_numpy(zero_copy_only=False),
            "n_links": np.ones(len(src_idx), dtype=np.int64),
        }
    )


def host_link_edges(pages, num_partitions: int | None = None):
    """Dataset[(src_host, dst_host, n_links)] — the aggregated host graph.

    One keyed exchange of per-batch pair partials; the HTML never shuffles.
    """
    from oma_ray.pipelines.queries import _grouped_sums

    return _grouped_sums(
        pages, ["src_host", "dst_host"], _edge_partial, ["n_links"],
        num_partitions,
    )


def host_int(host) -> pa.Array:
    """Numeric host index from a ``site<K>.example`` host string column."""
    k = pc.struct_field(
        pc.extract_regex(host, r"^site(?P<k>[0-9]+)\."), "k"
    )
    return pc.cast(k, pa.int64())


# --- URL canonicalization ----------------------------------------------------

_URL_PARTS_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<hostport>[^/?#]+)"
    r"(?P<rest>.*)$"
)


def canonicalize_urls(url_col) -> pa.Array:
    """Crawl-frontier URL canonicalization, all-Arrow:

    - scheme and host lowercased (the case-insensitive URL components)
    - default ``:443`` port dropped
    - fragment dropped
    - tracking params (``utm_*``, ``ref``) dropped, separators tidied
    - trailing slash on a non-root path dropped

    One ``extract_regex`` + a fixed chain of RE2 rewrites per batch; no
    per-row Python.  The q82 oracle states the EXPECTED canonical string
    directly from the planting formula, so every rewrite rule is value-
    checked (a missed rule produces a different string, not a near-miss).
    """
    u = pc.cast(url_col, pa.string())
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    ext = pc.extract_regex(u, _URL_PARTS_RE)
    scheme = pc.utf8_lower(pc.struct_field(ext, "scheme"))
    host = pc.replace_substring_regex(
        pc.utf8_lower(pc.struct_field(ext, "hostport")), r":443$", ""
    )
    rest = pc.struct_field(ext, "rest")
    rest = pc.replace_substring_regex(rest, r"#.*$", "")
    rest = pc.replace_substring_regex(rest, r"(utm_[a-z]+|ref)=[^&#]*", "")
    rest = pc.replace_substring_regex(rest, r"&&+", "&")
    rest = pc.replace_substring_regex(rest, r"\?&", "?")
    rest = pc.replace_substring_regex(rest, r"[?&]$", "")
    rest = pc.replace_substring_regex(rest, r"^(.+)/$", r"\1")
    return pc.binary_join_element_wise(scheme, "://", host, rest, "")
