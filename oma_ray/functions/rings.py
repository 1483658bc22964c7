"""Multipolygon ring assembly and turn-restriction way stitching.

Faithful reimplementations of the reference's per-relation geometry logic —
these run inside per-relation group processing (tiny N), so they are plain
Python on point tuples:

- ``create_rings`` — backtracking fragment assembly (Multipolygon.java:45-132)
  including its i=0 quirk: a reversed fragment is recorded as ``-i``, so
  fragment 0 can never be marked reversed (``-0 == 0``) — load-bearing for
  output parity.
- ``assemble_areas`` — outer-ring containment sort (comparator
  ``inside(a,b)?-1:inside(b,a)?1:0`` under TimSort — Python's sort is also
  TimSort, so inconsistent-comparator behavior matches Java) and first-match
  hole assignment with the one-point-inside heuristic
  (Multipolygon.java:134-195).
- ``from_to_ways`` — restriction/destination_sign stitching incl. via
  inference when via is empty and the in-place reversal side effects on the
  from/to fragment lists (FromTo.java:62-208).

Points are (lon, lat) int tuples throughout.
"""

from __future__ import annotations


def _point_inside(p: tuple, ring: list) -> bool:
    """Scalar Point.inside (Point.java:19-36) — Java trunc division."""
    lon, lat = p
    inside = False
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if y1 == y2:
            continue
        if (y1 <= lat) != (lat < y2):
            continue
        num = (x2 - x1) * (lat - y1)
        den = y2 - y1
        q = abs(num) // abs(den)
        if (num < 0) != (den < 0):
            q = -q
        if x1 + q < lon:
            inside = not inside
    return inside


def _ring_inside(a: list, b: list) -> bool:
    """'if one point is inside, we assume everything is inside'
    (Multipolygon.java:189-195)."""
    return any(_point_inside(p, b) for p in a)


def create_rings(fragments: list[list[tuple]]) -> list[list[tuple]] | None:
    """Assemble closed rings from way fragments; None if impossible
    (Multipolygon.java:45-132)."""
    n = len(fragments)
    for f in fragments:
        if not f:
            return None
    starts = [f[0] for f in fragments]
    ends = [f[-1] for f in fragments]
    used = [False] * n
    result = [0] * n

    def rec(nr: int, s, e) -> bool:
        if s is None or s == e:
            found = False
            for i in range(n):
                if used[i]:
                    continue
                used[i] = True
                result[nr] = i
                nr += 1
                if starts[i] != ends[i]:
                    s, e = starts[i], ends[i]
                    found = True
                    break
            if not found:
                return True
        for i in range(n):
            if used[i]:
                continue
            if starts[i] == e:
                used[i] = True
                result[nr] = i
                if rec(nr + 1, s, ends[i]):
                    return True
                used[i] = False
            if ends[i] == e:
                used[i] = True
                result[nr] = -i  # NB: -0 == 0 — fragment 0 never "reversed"
                if rec(nr + 1, s, starts[i]):
                    return True
                used[i] = False
        return False

    if not rec(0, None, None):
        return None

    rings: list[list[tuple]] = []
    nxt: list[tuple] | None = None
    for i in range(n):
        if nxt is None:
            nxt = []
        frag = fragments[abs(result[i])]
        if result[i] >= 0:
            nxt.extend(frag)
        else:
            nxt.extend(reversed(frag))
        if nxt[0] == nxt[-1]:
            rings.append(nxt)
            nxt = None
    return rings


def assemble_areas(
    outer_fragments: list[list[tuple]], inner_fragments: list[list[tuple]]
) -> list[tuple[list, list]]:
    """→ list of (outer_ring, [hole_rings]) per Multipolygon.createRings +
    sortRings.  Empty when assembly fails."""
    import functools

    outer_rings = create_rings(outer_fragments)
    inner_rings = create_rings(inner_fragments)
    if outer_rings is None:
        return []
    if inner_rings is None:
        inner_rings = []

    outer_rings = sorted(
        outer_rings,
        key=functools.cmp_to_key(
            lambda a, b: -1 if _ring_inside(a, b) else (1 if _ring_inside(b, a) else 0)
        ),
    )
    used = [False] * len(inner_rings)
    areas = []
    for ring in outer_rings:
        holes = []
        for i, inner in enumerate(inner_rings):
            if used[i]:
                continue
            if _ring_inside(inner, ring):
                holes.append(inner)
                used[i] = True
        areas.append((ring, holes))
    return areas


def _sort_via(via: list[list[tuple]]) -> list[tuple] | None:
    """FromTo.sortVia (FromTo.java:163-208)."""
    w = list(via[0])
    used = [False] * len(via)
    used[0] = True
    if len(via) == 1:
        return w
    last = w[-1]
    reversed_once = False
    while True:
        changed = False
        for k in range(len(via)):
            if used[k]:
                continue
            frag = via[k]
            if last == frag[0]:
                w.extend(frag[1:])
                last = w[-1]
                used[k] = True
                changed = True
            elif last == frag[-1]:
                w.extend(frag[-2::-1])
                last = w[-1]
                used[k] = True
                changed = True
        if changed:
            continue
        if reversed_once:
            break
        w.reverse()
        last = w[-1]
        reversed_once = True
    if not all(used):
        return None
    return w


def from_to_ways(
    from_frags: list[list[tuple]],
    via_frags: list[list[tuple]],
    to_frags: list[list[tuple]],
) -> list[list[tuple]]:
    """FromTo.createWays (FromTo.java:62-161): returns stitched restriction
    ways (each: second-to-last from-point + via chain + second to-point).

    Mutates its fragment list arguments in place (list reversals) exactly as
    the reference mutates the shared arrays — the side effects across
    iterations are part of the semantics."""
    ways: list[list[tuple]] = []
    if not to_frags:
        return ways

    via = [list(v) for v in via_frags]
    if not via:
        k1 = to_frags[0][0]
        k2 = to_frags[0][-1]
        first = last = True
        for t in to_frags[1:]:
            if first and k1 != t[0] and k1 != t[-1]:
                first = False
            if last and k2 != t[0] and k2 != t[-1]:
                last = False
        for f in from_frags:
            if first and k1 != f[0] and k1 != f[-1]:
                first = False
            if last and k2 != f[0] and k2 != f[-1]:
                last = False
        if first:
            via.append([k1])
        elif last:
            via.append([k2])
        else:
            return ways

    via_sorted = _sort_via(via)
    if via_sorted is None:
        return ways

    for t in to_frags:
        way = list(via_sorted)
        if way[0] == t[0] or way[0] == t[-1]:
            way.reverse()
        if way[-1] == t[-1]:
            t.reverse()  # in-place: persists for later iterations
        if way[-1] != t[0]:
            continue
        way.append(t[1])

        if not from_frags:
            ways.append([way[0]] + way)
        else:
            for f in from_frags:
                if way[-1] == f[0] or way[-1] == f[-1]:
                    way.reverse()
                if way[0] == f[0]:
                    f.reverse()  # in-place
                if way[0] != f[-1]:
                    continue
                ways.append([f[-2]] + way)
    return ways
