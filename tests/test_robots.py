"""Robots gate tests: parser semantics (sections, comments, empty
Disallow), grouped-matcher parity vs a naive per-url reference, and the
unknown-host default."""

import numpy as np
import pyarrow as pa

from oma_ray.stages.robots import (
    RobotsGate,
    RuleTable,
    parse_robots,
    synth_robots,
)


def test_parser_sections_comments_empty():
    hosts = ["a", "b", "c"]
    texts = [
        "User-agent: badbot\nDisallow: /\n\nUser-agent: *\n"
        "Disallow: /x  # trailing comment\nDisallow: /y\nDisallow: /x\n",
        "# only a comment\nUser-agent: *\nDisallow:\n",
        "User-agent: otherbot\nDisallow: /secret\n",
    ]
    rules = parse_robots(hosts, texts)
    assert rules["a"] == ("/x", "/y")      # deduped, sorted, *-section only
    assert rules["b"] == ()                # empty Disallow = allow all
    assert rules["c"] == ()                # non-* section ignored


def _naive(url, rules):
    host = url.split("://", 1)[1].split("/", 1)[0]
    path = "/" + url.split("://", 1)[1].split("/", 1)[1]
    return int(not any(path.startswith(p) for p in rules.get(host, ())))


def test_gate_matches_naive_reference():
    hosts, texts = synth_robots(50)
    rules = parse_robots(hosts, texts)
    gate = RobotsGate(RuleTable(rules))
    rng = np.random.default_rng(11)
    ids = rng.integers(0, 100000, size=2000)
    urls = [f"https://site{i % 50}.example/p/{i}" for i in ids]
    batch = pa.table({
        "page_id": pa.array(ids, type=pa.int64()),
        "url": pa.array(urls),
    })
    out = gate(batch)
    want = [_naive(u, rules) for u in urls]
    assert out.column("allowed").to_pylist() == want
    assert out.column("host").to_pylist() == [f"site{i % 50}.example"
                                              for i in ids]
    # both outcomes must actually occur
    s = sum(want)
    assert 0 < s < len(want)


def test_unknown_host_allowed():
    gate = RobotsGate(RuleTable(parse_robots(["known.example"],
                                             ["User-agent: *\nDisallow: /p"])))
    batch = pa.table({
        "page_id": pa.array([1, 2], type=pa.int64()),
        "url": pa.array(["https://unknown.example/p/1",
                         "https://known.example/p/2"]),
    })
    assert gate(batch).column("allowed").to_pylist() == [1, 0]
