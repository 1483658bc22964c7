"""robots.txt-style URL rule gate (crawl-politeness filtering).

A crawl pipeline's first gate: per-host robots.txt Disallow prefixes
decide which fetched urls may enter the corpus.  The rule table is tiny
next to the page stream (one entry per host), so it is a classic
broadcast-small-side op: parse once, `ray.put` once per session
(`taskcache.broadcast_once`), apply inside `map_batches` with NO exchange
— the page stream never shuffles.

Vectorization shape: hosts with the same Disallow-prefix list collapse to
one RULE GROUP; the per-batch kernel maps host strings to group ids with
one hashed lookup (`pd.Series.map`, C speed), then runs ONE vectorized
`starts_with` pass per distinct (group, prefix) pair.  Work scales with
the rule VOCABULARY (bounded — crawl rule sets repeat massively), not
with hosts × rules.

Scope: `User-agent: *` sections, `Disallow:` path prefixes (the original
1994 robots exclusion semantics).  Allow-precedence / wildcards are out of
scope and documented here rather than half-implemented.

Reference parity note: plays the role of the reference's config-driven
row gates (reference Oma's .bbs/.type filter configs — small driver-side
tables steering a full-stream filter); same broadcast shape as
`stages/classify.py::TypeConfig`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def parse_robots(hosts, texts) -> dict[str, tuple[str, ...]]:
    """Parse robots.txt bodies → {host: sorted tuple of Disallow
    prefixes}.  Only ``User-agent: *`` sections apply; comments and blank
    lines are skipped; an empty ``Disallow:`` value means allow-all (no
    prefix recorded)."""
    rules: dict[str, tuple[str, ...]] = {}
    for host, text in zip(hosts, texts):
        prefixes: list[str] = []
        applies = False
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            key, _, val = line.partition(":")
            key, val = key.strip().lower(), val.strip()
            if key == "user-agent":
                applies = val == "*"
            elif key == "disallow" and applies and val:
                prefixes.append(val)
        rules[host] = tuple(sorted(set(prefixes)))
    return rules


class RuleTable:
    """Grouped broadcast form of parsed rules: host → group id (hosts with
    identical prefix lists share a group), plus each group's prefixes."""

    def __init__(self, rules: dict[str, tuple[str, ...]]):
        groups: dict[tuple[str, ...], int] = {}
        self.host_to_group: dict[str, int] = {}
        for host, prefixes in rules.items():
            if prefixes not in groups:
                groups[prefixes] = len(groups)
            self.host_to_group[host] = groups[prefixes]
        # (group_id, prefix) pairs, flat
        self.group_prefixes: list[tuple[int, str]] = [
            (g, p) for prefixes, g in groups.items() for p in prefixes]


class RobotsGate:
    """map_batches kernel: (page_id, url) → (page_id, host, allowed).

    Unknown hosts (no robots.txt) are allowed — the standard default."""

    def __init__(self, table_or_ref):
        import ray

        self.table = (ray.get(table_or_ref)
                      if isinstance(table_or_ref, ray.ObjectRef)
                      else table_or_ref)
        self.mapper = pd.Series(self.table.host_to_group)

    def __call__(self, batch: pa.Table) -> pa.Table:
        url = batch.column("url")
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        host = pc.replace_substring_regex(
            pc.replace_substring_regex(url, r"^https?://", ""), r"/.*$", "")
        path = pc.replace_substring_regex(url, r"^https?://[^/]*", "")
        hs = pd.Series(host.to_numpy(zero_copy_only=False))
        group = hs.map(self.mapper).fillna(-1).to_numpy(dtype=np.int64)
        disallowed = np.zeros(len(hs), dtype=bool)
        for g, prefix in self.table.group_prefixes:
            in_group = group == g
            if not in_group.any():
                continue
            hit = pc.starts_with(path, prefix).to_numpy(zero_copy_only=False)
            disallowed |= in_group & hit
        return pa.table({
            "page_id": batch.column("page_id"),
            "host": host,
            "allowed": pa.array((~disallowed).astype(np.int64)),
        })


def synth_robots(n_hosts: int = 1000):
    """Deterministic robots.txt fixture, mirrored in SQL_Q93: host
    ``site<k>.example`` disallows path prefix ``/p/<(k*7)%10>``, and every
    fifth host additionally disallows ``/p/<(k*3+1)%10>`` (the +1 keeps the
    two digits distinct — 4k ≡ 0 mod 10 whenever k ≡ 0 mod 5).  Texts include
    comments, blank lines and a non-* section so the parser is exercised,
    not just the matcher."""
    hosts, texts = [], []
    for k in range(n_hosts):
        lines = [
            "# synthetic robots fixture",
            "User-agent: badbot",
            "Disallow: /",
            "",
            "User-agent: *",
            f"Disallow: /p/{(k * 7) % 10}",
        ]
        if k % 5 == 0:
            lines.append(f"Disallow: /p/{(k * 3 + 1) % 10}")
        hosts.append(f"site{k}.example")
        texts.append("\n".join(lines))
    return hosts, texts
