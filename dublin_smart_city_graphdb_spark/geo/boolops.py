"""Polygon boolean operations, convex hull, and DE-9IM relate on WKT.

GeoSPARQL §8.7's non-topological query functions (``geof:intersection``,
``geof:union``, ``geof:difference``, ``geof:symDifference``,
``geof:convexHull``) and §8.8's ``geof:relate`` — the set-valued /
matrix-valued complement of the JVM predicate kernels in
``sparql/extensions.py``. GraphDB serves these from its GeoSPARQL
plugin (engine surface selected at ``Dockerfile:2``; the vocabulary the
reference loads is the geometry table at ``facilities.ttl:161-171``).

Algorithm: slab decomposition. Every vertex y and every proper
edge-crossing y of the two ring sets becomes a slab boundary; inside a
slab no edges cross, so sorting the slab-spanning edges by x at the
slab midline gives a consistent left-to-right order, and one parity
sweep (even-odd fill, so holes and MULTIPOLYGON members need no special
casing) emits the trapezoids where the boolean condition holds. The
trapezoid set is stitched back into rings by cancelling interior
horizontal intervals at each slab interface (symmetric difference of
the upper/lower interval sets) and walking the remaining segment graph;
collinear-point simplification then restores minimal rings. Exact on
the lattice-aligned/straight-edge domain the engine's geo predicates
already promise (shared edges, T-junctions and box grids are exact in
IEEE doubles); general-position float inputs get float-accurate
results.

Scope: polygonal (POLYGON / MULTIPOLYGON), point (POINT /
MULTIPOINT), linework (LINESTRING / MULTILINESTRING — round 8b: 1-D
parametric clipping against areas, collinear-overlap arithmetic between
line sets, JTS-style measure-zero rules), and GEOMETRYCOLLECTIONs of
any mix, composed dimension-wise. ``buffer_wkt`` buffers every type via
capsule unions through the same slab kernel. Malformed input returns
None, surfacing as a SPARQL error. The empty geometry is
``GEOMETRYCOLLECTION EMPTY`` on output and accepted on input. Line
outputs are NODED at proper transversal crossings AND at
collinear-overlap endpoints (JTS overlay canonical form — two crossing
lines union/difference into split pieces, and two partially-overlapping
collinear lines union into three fragments split at the overlap
interval's endpoints). One deliberate canonicalization remains:
tip-to-tip endpoint touches chain-merge (the LineMerger form) — no
overlap interval and no crossing exists there to node on.

These run per-row (no joins, no shuffle): the pandas-UDF wrappers in
sparql/extensions.py stream Arrow batches through them, so the work is
embarrassingly parallel and linear at 100 TB — the same execution shape
as GraphDB's per-binding JTS calls, minus the JVM.
"""

from __future__ import annotations

import re

Pt = tuple[float, float]
Ring = list[Pt]

_NUM = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
_PAIR_RE = re.compile(rf"({_NUM})\s+({_NUM})")
_HEAD_RE = re.compile(r"^\s*(?:<[^>]*>\s*)?([A-Za-z]+)\s*(.*)$", re.S)
_EMPTY_RE = re.compile(r"^\s*EMPTY\s*$", re.I)


class Geom:
    """Normalized geometry: isolated points + polylines + an even-odd
    polygonal area (flattened rings — the same flattening contract as
    the JVM kernel's ``_poly_rings``)."""

    __slots__ = ("points", "rings", "lines")

    def __init__(self, points: list[Pt] | None = None,
                 rings: list[Ring] | None = None,
                 lines: list[list[Pt]] | None = None):
        self.points = points or []
        self.rings = rings or []
        self.lines = lines or []

    def is_empty(self) -> bool:
        return not self.points and not self.rings and not self.lines


def _pairs(text: str) -> list[Pt]:
    return [(float(a), float(b)) for a, b in _PAIR_RE.findall(text)]


def _split_top(body: str) -> list[str]:
    """Split a parenthesized member list at top-level commas."""
    out, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur and "".join(cur).strip():
        out.append("".join(cur))
    return out


def _strip_parens(s: str) -> str:
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        # only strip if the parens match each other
        depth = 0
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(s) - 1:
                    return s
        s = s[1:-1].strip()
    return s


def _close_open(ring: Ring) -> Ring:
    """Drop the WKT closing vertex; internal rings are open."""
    if len(ring) > 1 and ring[0] == ring[-1]:
        return ring[:-1]
    return ring


def parse_geom(wkt: str | None) -> Geom | None:
    """WKT → Geom, or None for unsupported/malformed input. Accepts an
    optional leading ``<crs-iri>`` (the geo:wktLiteral convention)."""
    if wkt is None:
        return None
    m = _HEAD_RE.match(wkt)
    if not m:
        return None
    head, rest = m.group(1).upper(), m.group(2)
    if _EMPTY_RE.match(rest):
        return Geom()
    if head == "POINT":
        pts = _pairs(rest)
        return Geom(points=pts) if len(pts) == 1 else None
    if head == "MULTIPOINT":
        pts = _pairs(rest)
        return Geom(points=sorted(set(pts))) if pts else None
    if head == "POLYGON" or head == "MULTIPOLYGON":
        body = _strip_parens(rest)
        # rings split at ")+ , (+" — POLYGON ring separators and
        # MULTIPOLYGON member separators in one pass (the JVM kernel's
        # _poly_rings contract)
        parts = re.split(r"\)+\s*,\s*\(+", body)
        rings = [_close_open(_pairs(p)) for p in parts]
        rings = [r for r in rings if len(r) >= 3]
        return Geom(rings=rings) if rings else None
    if head == "LINESTRING":
        pts = _pairs(rest)
        return Geom(lines=[pts]) if len(pts) >= 2 else None
    if head == "MULTILINESTRING":
        body = _strip_parens(rest)
        parts = re.split(r"\)+\s*,\s*\(+", body)
        lines = [_pairs(p) for p in parts]
        lines = [ln for ln in lines if len(ln) >= 2]
        return Geom(lines=lines) if lines else None
    if head == "GEOMETRYCOLLECTION":
        body = _strip_parens(rest)
        geom = Geom()
        for member in _split_top(body):
            sub = parse_geom(member)
            if sub is None:
                return None
            geom.points.extend(sub.points)
            geom.rings.extend(sub.rings)
            geom.lines.extend(sub.lines)
        geom.points = sorted(set(geom.points))
        return geom
    return None  # unknown WKT type: SPARQL error


# -- point-in-area ------------------------------------------------------------

def _on_segment(p: Pt, a: Pt, b: Pt) -> bool:
    cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
    if cross != 0:
        return False
    return (min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]))


def _edges(rings: list[Ring]):
    for r in rings:
        for i in range(len(r)):
            a, b = r[i], r[(i + 1) % len(r)]
            if a != b:
                yield a, b


def point_in_rings(p: Pt, rings: list[Ring]) -> int:
    """-1 outside, 0 on boundary, 1 strictly inside (even-odd)."""
    x, y = p
    crossings = 0
    for a, b in _edges(rings):
        if _on_segment(p, a, b):
            return 0
        (ax, ay), (bx, by) = a, b
        if (ay > y) != (by > y):
            xi = ax + (y - ay) * (bx - ax) / (by - ay)
            if xi > x:
                crossings += 1
    return 1 if crossings % 2 else -1


# -- slab boolean core --------------------------------------------------------

def _cross_ys(e, f) -> list[float]:
    """y of the proper crossing of segments e, f (endpoint/collinear
    contacts contribute vertex ys already)."""
    (ax, ay), (bx, by) = e
    (cx, cy), (dx, dy) = f
    rx, ry = bx - ax, by - ay
    sx, sy = dx - cx, dy - cy
    denom = rx * sy - ry * sx
    if denom == 0:
        return []
    t = ((cx - ax) * sy - (cy - ay) * sx) / denom
    u = ((cx - ax) * ry - (cy - ay) * rx) / denom
    if 0 <= t <= 1 and 0 <= u <= 1:
        return [ay + t * ry]
    return []


def _cond(op: str, pa: bool, pb: bool) -> bool:
    if op == "and":
        return pa and pb
    if op == "or":
        return pa or pb
    if op == "sub":
        return pa and not pb
    return pa != pb  # xor


def boolop_rings(ra: list[Ring], rb: list[Ring], op: str) -> list[Ring]:
    """Even-odd boolean combination of two ring sets → minimal rings."""
    ea, eb = list(_edges(ra)), list(_edges(rb))
    ys = {v[1] for e in ea + eb for v in e}
    for e in ea:
        for f in eb:
            ys.update(_cross_ys(e, f))
    ysl = sorted(ys)

    slabs = []  # (y0, y1, [(xl0, xl1, xr0, xr1), ...])
    for y0, y1 in zip(ysl, ysl[1:]):
        if not y1 > y0:
            continue
        ym = (y0 + y1) / 2
        evs = []
        for tag, edges in (("a", ea), ("b", eb)):
            for (px, py), (qx, qy) in edges:
                if py == qy:
                    continue
                if min(py, qy) <= y0 and max(py, qy) >= y1:
                    x0 = px + (qx - px) * (y0 - py) / (qy - py)
                    x1 = px + (qx - px) * (y1 - py) / (qy - py)
                    evs.append((x0 + (x1 - x0) / 2, x0, x1, tag))
        evs.sort(key=lambda t: (t[0], t[1], t[2]))
        traps, pa, pb, left = [], False, False, None
        i = 0
        while i < len(evs):
            j, ca, cb = i, 0, 0
            # coincident edges (shared lattice edges) toggle together —
            # no zero-width slivers between an A edge and the identical
            # B edge
            while (j < len(evs) and evs[j][1] == evs[i][1]
                   and evs[j][2] == evs[i][2]):
                if evs[j][3] == "a":
                    ca += 1
                else:
                    cb += 1
                j += 1
            was = _cond(op, pa, pb)
            if ca % 2:
                pa = not pa
            if cb % 2:
                pb = not pb
            now = _cond(op, pa, pb)
            if now and not was:
                left = (evs[i][1], evs[i][2])
            elif was and not now and left is not None:
                if not (left[0] == evs[i][1] and left[1] == evs[i][2]):
                    traps.append((left[0], left[1], evs[i][1], evs[i][2]))
                left = None
            i = j
        if traps:
            slabs.append((y0, y1, traps))
    return _stitch(slabs)


def _interval_symdiff(lower: list[tuple[float, float]],
                      upper: list[tuple[float, float]]
                      ) -> list[tuple[float, float]]:
    pts = sorted({x for iv in lower + upper for x in iv})
    out = []
    for x0, x1 in zip(pts, pts[1:]):
        if not x1 > x0:
            continue
        xm = x0 + (x1 - x0) / 2
        in_l = any(a <= xm <= b for a, b in lower)
        in_u = any(a <= xm <= b for a, b in upper)
        if in_l != in_u:
            # do NOT merge adjacent pieces: a shared breakpoint can be a
            # junction vertex where two faces meet — merging across it
            # would weld distinct rings into a self-crossing one. The
            # ring walk's collinear simplification re-joins pieces that
            # genuinely belong to one face.
            out.append((x0, x1))
    return out


def _stitch(slabs) -> list[Ring]:
    """Trapezoid set → boundary segments → closed minimal rings."""
    segs: list[tuple[Pt, Pt]] = []
    tops: dict[float, list[tuple[float, float]]] = {}
    bots: dict[float, list[tuple[float, float]]] = {}
    for y0, y1, traps in slabs:
        for xl0, xl1, xr0, xr1 in traps:
            if (xl0, y0) != (xl1, y1):
                segs.append(((xl0, y0), (xl1, y1)))
            if (xr0, y0) != (xr1, y1):
                segs.append(((xr0, y0), (xr1, y1)))
            tops.setdefault(y1, []).append((xl1, xr1))
            bots.setdefault(y0, []).append((xl0, xr0))
    for y in sorted(set(tops) | set(bots)):
        for x0, x1 in _interval_symdiff(tops.get(y, []), bots.get(y, [])):
            segs.append(((x0, y), (x1, y)))

    # walk the segment graph into closed rings; at junction vertices
    # (two region corners meeting at a point) pick the most-clockwise
    # continuation relative to the incoming direction — consistent
    # face tracing keeps every emitted ring SIMPLE (no even-odd ring
    # pair whose "hole" escapes its shell)
    import math

    adj: dict[Pt, list[int]] = {}
    for i, (a, b) in enumerate(segs):
        adj.setdefault(a, []).append(i)
        adj.setdefault(b, []).append(i)
    used = [False] * len(segs)
    rings: list[Ring] = []
    for start in range(len(segs)):
        if used[start]:
            continue
        used[start] = True
        a, b = segs[start]
        ring = [a, b]
        while ring[-1] != ring[0]:
            cur, prev = ring[-1], ring[-2]
            cands = [i for i in adj.get(cur, []) if not used[i]]
            if not cands:
                ring = None  # dangling — numeric sliver; drop
                break
            din = math.atan2(cur[1] - prev[1], cur[0] - prev[0])

            def turn(i: int) -> tuple:
                p, q = segs[i]
                n = q if p == cur else p
                ang = math.atan2(n[1] - cur[1], n[0] - cur[0])
                # clockwise angle from the reversed incoming direction,
                # in (0, 2π] — smallest = sharpest right turn
                rel = (din + math.pi - ang) % (2 * math.pi)
                return (rel if rel > 1e-12 else 2 * math.pi, n)

            nxt = min(cands, key=turn)
            used[nxt] = True
            p, q = segs[nxt]
            ring.append(q if p == cur else p)
        if ring:
            rings.extend(_split_pinched(_simplify(ring[:-1])))
    return [r for r in rings if len(r) >= 3]


def _split_pinched(ring: Ring) -> list[Ring]:
    """A ring that visits a vertex twice is two faces touching at a
    point — split it there (recursively) so every emitted ring is
    simple."""
    seen: dict[Pt, int] = {}
    for i, p in enumerate(ring):
        if p in seen:
            j = seen[p]
            inner = _simplify(ring[j:i])
            outer = _simplify(ring[:j] + ring[i:])
            return _split_pinched(inner) + _split_pinched(outer)
        seen[p] = i
    return [ring] if len(ring) >= 3 else []


def _simplify(ring: Ring) -> Ring:
    """Drop duplicate and collinear vertices (incl. zero-area spikes)."""
    out = ring
    changed = True
    while changed and len(out) >= 3:
        changed = False
        nxt = []
        n = len(out)
        for i in range(n):
            p, c, q = out[i - 1], out[i], out[(i + 1) % n]
            cross = ((c[0] - p[0]) * (q[1] - p[1])
                     - (c[1] - p[1]) * (q[0] - p[0]))
            if c == p or cross == 0:
                changed = True
                continue
            nxt.append(c)
        out = nxt
    return out



# -- 1-D (linework) machinery -------------------------------------------------

Seg = tuple[Pt, Pt]


def _lsegs(lines: list[list[Pt]]):
    for ln in lines:
        for a, b in zip(ln, ln[1:]):
            if a != b:
                yield a, b


def _seg_split_ts(e: Seg, rings: list[Ring], lines: list[list[Pt]]) -> list[float]:
    """Sorted parameter values splitting segment ``e`` at every contact
    with the rings' edges and the polylines' segments (proper crossings
    plus collinear-overlap endpoints) — the 1-D analogue of the slab
    boundaries."""
    (ax, ay), (bx, by) = e
    rx, ry = bx - ax, by - ay
    den2 = rx * rx + ry * ry
    ts = {0.0, 1.0}
    for c, d in list(_edges(rings)) + list(_lsegs(lines)):
        (cx, cy), (dx, dy) = c, d
        sx, sy = dx - cx, dy - cy
        denom = rx * sy - ry * sx
        if denom == 0:
            if _on_segment(c, e[0], e[1]):
                ts.add(min(1.0, max(0.0, ((cx - ax) * rx + (cy - ay) * ry) / den2)))
            if _on_segment(d, e[0], e[1]):
                ts.add(min(1.0, max(0.0, ((dx - ax) * rx + (dy - ay) * ry) / den2)))
            continue
        t = ((cx - ax) * sy - (cy - ay) * sx) / denom
        u = ((cx - ax) * ry - (cy - ay) * rx) / denom
        if 0 <= t <= 1 and 0 <= u <= 1:
            ts.add(t)
    return sorted(ts)


def _t_point(e: Seg, t: float) -> Pt:
    (ax, ay), (bx, by) = e
    return (ax + t * (bx - ax), ay + t * (by - ay))


def _clip_lines_to_area(lines: list[list[Pt]], rings: list[Ring],
                        keep: tuple[int, ...]) -> list[Seg]:
    """Pieces of the polylines whose midpoint classifies into ``keep``
    against the even-odd area (1 inside, 0 boundary, -1 outside)."""
    out: list[Seg] = []
    for e in _lsegs(lines):
        ts = _seg_split_ts(e, rings, [])
        for t0, t1 in zip(ts, ts[1:]):
            if not t1 > t0:
                continue
            if point_in_rings(_t_point(e, t0 + (t1 - t0) / 2), rings) in keep:
                out.append((_t_point(e, t0), _t_point(e, t1)))
    return out


def _on_any_line(p: Pt, lines: list[list[Pt]]) -> bool:
    return any(_on_segment(p, a, b) for a, b in _lsegs(lines))


def _line_line_bits(la: list[list[Pt]], lb: list[list[Pt]]
                    ) -> tuple[list[Seg], list[Pt]]:
    """(collinear-overlap segments, isolated contact points) of two
    polyline sets."""
    segs: list[Seg] = []
    pts: set[Pt] = set()
    for e in _lsegs(la):
        (ax, ay), (bx, by) = e
        rx, ry = bx - ax, by - ay
        den2 = rx * rx + ry * ry
        for f in _lsegs(lb):
            (cx, cy), (dx, dy) = f
            sx, sy = dx - cx, dy - cy
            denom = rx * sy - ry * sx
            if denom == 0:
                if _collinear_overlap(e, f):
                    tc = ((cx - ax) * rx + (cy - ay) * ry) / den2
                    td = ((dx - ax) * rx + (dy - ay) * ry) / den2
                    lo, hi = max(0.0, min(tc, td)), min(1.0, max(tc, td))
                    if hi > lo:
                        segs.append((_t_point(e, lo), _t_point(e, hi)))
                elif (rx * (cy - ay) - ry * (cx - ax)) == 0:
                    # collinear, no overlap: endpoint touch only
                    for q in (c_ for c_ in (f[0], f[1])
                              if _on_segment(c_, e[0], e[1])):
                        pts.add(q)
                continue
            t = ((cx - ax) * sy - (cy - ay) * sx) / denom
            u = ((cx - ax) * ry - (cy - ay) * rx) / denom
            if 0 <= t <= 1 and 0 <= u <= 1:
                pts.add(_t_point(e, t))
    # contact points riding an overlap segment are not isolated
    pts = {p for p in pts
           if not any(_on_segment(p, s[0], s[1]) for s in segs)}
    return segs, sorted(pts)


def _subtract_line_overlaps(lines: list[list[Pt]],
                            other: list[list[Pt]]) -> list[Seg]:
    """Pieces of ``lines`` NOT collinear-covered by ``other`` (isolated
    crossing points don't subtract — removing measure zero keeps the
    piece whole, matching JTS difference)."""
    out: list[Seg] = []
    for e in _lsegs(lines):
        ts = _seg_split_ts(e, [], other)
        for t0, t1 in zip(ts, ts[1:]):
            if not t1 > t0:
                continue
            mid = _t_point(e, t0 + (t1 - t0) / 2)
            if not _on_any_line(mid, other):
                out.append((_t_point(e, t0), _t_point(e, t1)))
    return out


def _overlap_nodes(la: list[list[Pt]], lb: list[list[Pt]]) -> set:
    """Endpoints of the collinear-overlap intervals between two polyline
    sets — overlay nodes in JTS canonical output (the noding the r8
    review flagged as the last line-overlay divergence): union /
    difference / symDifference split their linework there instead of
    dissolving through."""
    if not la or not lb:
        return set()
    ov, _ = _line_line_bits(la, lb)
    return {s[0] for s in ov} | {s[1] for s in ov}


def _node_crossings(
    pieces: list[Seg], extra_lines: list[list[Pt]] | None = None,
    forced: set | frozenset = frozenset(),
) -> tuple[list[Seg], set]:
    """Split every piece at its PROPER transversal crossings (interior
    of one segment meeting the other, non-collinear) with the other
    pieces and with ``extra_lines`` — the JTS overlay canonical form for
    line output. Returns (noded pieces, crossing points); the points
    feed ``_merge_line_pieces(breaks=...)`` so chain rejoining cannot
    undo a node whose degree in the RESULT is 2 (e.g. A − B split where
    B's pieces are absent from the result). ``forced`` adds overlay
    nodes that aren't transversal crossings — the collinear-overlap
    endpoints (JTS nodes linework there too: LINESTRING(0 0,2 0) ∪
    LINESTRING(1 0,3 0) is three fragments, split at x=1 and x=2) —
    splitting any piece they land inside and surviving the chain merge."""
    # normalize first: upstream clip/overlap splits may have fragmented a
    # piece exactly AT a crossing, hiding it from interior-contact
    # detection below — re-merge (degree-2 chains only), then re-fragment
    segs = [
        s
        for ln in _merge_line_pieces([s for s in pieces if s[0] != s[1]])
        for s in zip(ln, ln[1:])
    ]
    others = [(c, d) for c, d in segs]
    if extra_lines:
        others += list(_lsegs(extra_lines))
    out: list[Seg] = []
    nodes: set = set(forced)
    for e in segs:
        (ax, ay), (bx, by) = e
        rx, ry = bx - ax, by - ay
        den2 = rx * rx + ry * ry
        ts = {0.0, 1.0}
        for p in forced:
            if p != e[0] and p != e[1] and _on_segment(p, e[0], e[1]):
                ts.add(((p[0] - ax) * rx + (p[1] - ay) * ry) / den2)
        for f in others:
            if f == e:
                continue
            (cx, cy), (dx, dy) = f
            sx, sy = dx - cx, dy - cy
            denom = rx * sy - ry * sx
            if denom == 0:
                continue  # parallel/collinear: not a transversal node
            t = ((cx - ax) * sy - (cy - ay) * sx) / denom
            u = ((cx - ax) * ry - (cy - ay) * rx) / denom
            if 0 < t < 1 and 0 <= u <= 1:
                ts.add(t)
                nodes.add(_t_point(e, t))
            elif t in (0.0, 1.0) and 0 < u < 1:
                # piece ENDPOINT in the other segment's interior: an
                # upstream split already landed exactly on the crossing —
                # still an overlay node the chain merge must not erase
                nodes.add(_t_point(e, t))
        for t0, t1 in zip(sorted(ts), sorted(ts)[1:]):
            if t1 > t0:
                out.append((_t_point(e, t0), _t_point(e, t1)))
    return out, nodes


def _merge_line_pieces(
    pieces: list[Seg], breaks: frozenset | set = frozenset(),
) -> list[list[Pt]]:
    """2-point pieces → maximal polylines: dedupe (direction-normalized),
    then walk chains through degree-2 vertices (the JTS LineMerger
    behavior, so clipping doesn't fragment a polyline at its own
    bends). ``breaks`` lists vertices chains must NOT walk through —
    crossing nodes that must survive in the output even at degree 2."""
    norm = {tuple(sorted(s)) for s in pieces if s[0] != s[1]}
    if not norm:
        return []
    adj: dict[Pt, list[tuple[Pt, Pt]]] = {}
    for s in norm:
        adj.setdefault(s[0], []).append(s)
        adj.setdefault(s[1], []).append(s)
    used: set = set()
    out: list[list[Pt]] = []
    # chain starts: vertices with degree != 2 (or forced breaks) first,
    # then leftovers (loops)
    starts = [
        v for v, ss in adj.items() if len(ss) != 2 or v in breaks
    ] or list(adj)
    for v0 in sorted(starts):
        for s0 in adj[v0]:
            if s0 in used:
                continue
            used.add(s0)
            line = [v0, s0[1] if s0[0] == v0 else s0[0]]
            while True:
                cur = line[-1]
                nxts = [s for s in adj.get(cur, []) if s not in used]
                if len(adj.get(cur, [])) != 2 or cur in breaks or not nxts:
                    break
                s = nxts[0]
                used.add(s)
                line.append(s[1] if s[0] == cur else s[0])
            out.append(_simplify_line(line))
    # leftover pure loops
    for s in sorted(norm):
        if s not in used:
            used.add(s)
            line = [s[0], s[1]]
            while True:
                cur = line[-1]
                if cur in breaks:
                    break
                nxts = [x for x in adj.get(cur, []) if x not in used]
                if not nxts:
                    break
                x = nxts[0]
                used.add(x)
                line.append(x[1] if x[0] == cur else x[0])
            out.append(_simplify_line(line))
    return [ln for ln in out if len(ln) >= 2]


def _simplify_line(line: list[Pt]) -> list[Pt]:
    """Drop interior collinear vertices (straight continuations only —
    bends stay)."""
    out = [line[0]]
    for i in range(1, len(line) - 1):
        p, c, q = out[-1], line[i], line[i + 1]
        cross = (c[0] - p[0]) * (q[1] - p[1]) - (c[1] - p[1]) * (q[0] - p[0])
        dot = (c[0] - p[0]) * (q[0] - c[0]) + (c[1] - p[1]) * (q[1] - c[1])
        if cross == 0 and dot >= 0:
            continue
        out.append(c)
    out.append(line[-1])
    return out


def _canon_lines(lines: list[list[Pt]]) -> list[list[Pt]]:
    """Canonical direction (lexicographically smaller endpoint first)
    and canonical order."""
    out = []
    for ln in lines:
        if len(ln) >= 2 and (ln[-1], ln[0]) < (ln[0], ln[-1]):
            ln = list(reversed(ln))
        out.append(ln)
    return sorted(out)


# -- WKT formatting -----------------------------------------------------------

def _fmt(v: float) -> str:
    return repr(float(v))


def _ring_wkt(ring: Ring, hole: bool) -> str:
    """Canonical ring text: starts at the (x, y)-minimal vertex, shells
    counter-clockwise, holes clockwise, explicitly closed."""
    area2 = sum(
        ring[i][0] * ring[(i + 1) % len(ring)][1]
        - ring[(i + 1) % len(ring)][0] * ring[i][1]
        for i in range(len(ring))
    )
    ccw = area2 > 0
    pts = list(ring) if ccw != hole else list(reversed(ring))
    k = min(range(len(pts)), key=lambda i: pts[i])
    pts = pts[k:] + pts[:k] + [pts[k]]
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts) + ")"


def _ring_sample(ring: Ring, others: list[Ring]):
    """A vertex of ``ring`` not on any other ring's boundary (depth
    classification needs a strictly-classifiable sample)."""
    for p in ring:
        if all(point_in_rings(p, [o]) != 0 for o in others):
            return p
    # fall back to an edge midpoint
    for i in range(len(ring)):
        a, b = ring[i], ring[(i + 1) % len(ring)]
        p = (a[0] + (b[0] - a[0]) / 2, a[1] + (b[1] - a[1]) / 2)
        if all(point_in_rings(p, [o]) != 0 for o in others):
            return p
    return ring[0]


def _polygonal_wkt(rings: list[Ring]) -> str:
    """Ring set → POLYGON / MULTIPOLYGON with holes grouped under their
    shells by even-odd depth."""
    depth = []
    for i, r in enumerate(rings):
        others = [o for j, o in enumerate(rings) if j != i]
        p = _ring_sample(r, others)
        depth.append(sum(point_in_rings(p, [o]) == 1 for o in others))
    shells = [i for i, d in enumerate(depth) if d % 2 == 0]
    members = []
    for si in shells:
        holes = [
            hi for hi, d in enumerate(depth)
            if d == depth[si] + 1
            and point_in_rings(_ring_sample(rings[hi], [rings[si]]),
                               [rings[si]]) == 1
        ]
        texts = [_ring_wkt(rings[si], hole=False)] + sorted(
            _ring_wkt(rings[h], hole=True) for h in holes
        )
        members.append("(" + ", ".join(texts) + ")")
    members.sort()
    if len(members) == 1:
        return "POLYGON" + members[0]
    return "MULTIPOLYGON(" + ", ".join(members) + ")"


def _lines_wkt(lines: list[list[Pt]]) -> str:
    bodies = [
        "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in ln) + ")"
        for ln in _canon_lines(lines)
    ]
    if len(bodies) == 1:
        return "LINESTRING" + bodies[0]
    return "MULTILINESTRING(" + ", ".join(bodies) + ")"


def format_geom(g: Geom) -> str:
    if g.is_empty():
        return "GEOMETRYCOLLECTION EMPTY"
    pts = sorted(set(g.points))
    kinds = (bool(pts), bool(g.lines), bool(g.rings))
    if kinds == (True, False, False):
        if len(pts) == 1:
            return f"POINT({_fmt(pts[0][0])} {_fmt(pts[0][1])})"
        return "MULTIPOINT(" + ", ".join(
            f"({_fmt(x)} {_fmt(y)})" for x, y in pts) + ")"
    if kinds == (False, True, False):
        return _lines_wkt(g.lines)
    if kinds == (False, False, True):
        return _polygonal_wkt(g.rings)
    parts = [f"POINT({_fmt(x)} {_fmt(y)})" for x, y in pts]
    if g.lines:
        parts.append(_lines_wkt(g.lines))
    if g.rings:
        parts.append(_polygonal_wkt(g.rings))
    return "GEOMETRYCOLLECTION(" + ", ".join(parts) + ")"


# -- the public ops -----------------------------------------------------------

def _covered(p: Pt, g: Geom) -> bool:
    return (p in g.points or point_in_rings(p, g.rings) >= 0
            or _on_any_line(p, g.lines))


def boolop_geom(a: Geom, b: Geom, op: str) -> Geom:
    """Dimension-wise boolean combination: 2-D via the slab clipper,
    1-D via parametric clipping of polylines against areas plus
    collinear-overlap arithmetic between line sets, 0-D via coverage
    tests. Lower-dimensional parts absorbed by a kept area drop out;
    line endpoints/crossing contacts keep JTS's measure-zero rules
    (isolated points never subtract from a line)."""
    if op == "xor":
        left, right = boolop_geom(a, b, "sub"), boolop_geom(b, a, "sub")
        xor_segs, xor_nodes = _node_crossings(
            [s for ln in left.lines + right.lines
             for s in zip(ln, ln[1:])],
            forced=_overlap_nodes(a.lines, b.lines),
        )
        merged = Geom(
            points=sorted(set(left.points + right.points)),
            rings=left.rings + right.rings,
            lines=_merge_line_pieces(xor_segs, breaks=xor_nodes),
        )
        # adjacent sub-results can share boundary; re-run the 2-D union
        # so shared edges weld (e.g. A Δ A-half)
        merged.rings = boolop_rings(left.rings, right.rings, "or")
        return merged

    rings = boolop_rings(a.rings, b.rings, op)
    pieces: list[Seg] = []
    if op == "and":
        if b.rings:
            pieces += _clip_lines_to_area(a.lines, b.rings, (0, 1))
        if a.rings:
            pieces += _clip_lines_to_area(b.lines, a.rings, (0, 1))
        ov, contacts = _line_line_bits(a.lines, b.lines)
        pieces += ov
        pts = [p for p in a.points if _covered(p, b)]
        pts += [p for p in b.points if _covered(p, a)]
        pts += contacts
    elif op == "or":
        a_out = (_clip_lines_to_area(a.lines, b.rings, (-1,))
                 if b.rings else list(_lsegs(a.lines)))
        b_out = (_clip_lines_to_area(b.lines, a.rings, (-1,))
                 if a.rings else list(_lsegs(b.lines)))
        # dissolve collinear overlaps: the B side carries them once
        a_out = _subtract_line_overlaps(
            _merge_line_pieces(a_out), [list(s) for s in b_out]
        )
        pieces += a_out + b_out
        pts = [p for p in a.points + b.points
               if point_in_rings(p, rings) == -1]
    else:  # sub: A − B
        kept = _clip_lines_to_area(a.lines, b.rings, (-1,)) \
            if b.rings else [s for s in _lsegs(a.lines)]
        if b.lines:
            kept_lines = _merge_line_pieces(kept)
            kept = _subtract_line_overlaps(kept_lines, b.lines)
        pieces += kept
        pts = [p for p in a.points if not _covered(p, b)]
    # JTS overlay noding: line output splits at proper transversal
    # crossings — with the other operand's lines too for A − B, whose
    # crossing partners are absent from the result (breaks keep the
    # node through the degree-2 chain merge) — and at collinear-overlap
    # endpoints (forced nodes: JTS keeps the overlay fragments there)
    pieces, cross_nodes = _node_crossings(
        pieces, b.lines if op == "sub" else None,
        forced=_overlap_nodes(a.lines, b.lines),
    )
    lines = _merge_line_pieces(pieces, breaks=cross_nodes)
    # a line piece riding the kept area's interior/boundary is absorbed
    if rings and lines:
        absorbed = []
        for s in [x for ln in lines for x in zip(ln, ln[1:])]:
            mid = _t_point(s, 0.5)
            if point_in_rings(mid, rings) == -1:
                absorbed.append(s)
        lines = _merge_line_pieces(absorbed, breaks=cross_nodes)
    pts = [p for p in pts
           if point_in_rings(p, rings) == -1 and not _on_any_line(p, lines)]
    return Geom(points=sorted(set(pts)), rings=rings, lines=lines)


def boolop_wkt(wkt_a: str | None, wkt_b: str | None, op: str) -> str | None:
    a, b = parse_geom(wkt_a), parse_geom(wkt_b)
    if a is None or b is None:
        return None
    return format_geom(boolop_geom(a, b, op))


def convex_hull_wkt(wkt: str | None) -> str | None:
    """Andrew's monotone chain over every coordinate of the geometry
    (any WKT type with coordinates qualifies, matching JTS)."""
    if wkt is None:
        return None
    m = _HEAD_RE.match(wkt)
    if not m:
        return None
    if _EMPTY_RE.match(m.group(2)):
        return "GEOMETRYCOLLECTION EMPTY"
    pts = sorted(set(_pairs(m.group(2))))
    if not pts:
        return None
    if len(pts) == 1:
        return f"POINT({_fmt(pts[0][0])} {_fmt(pts[0][1])})"

    def half(seq):
        out: list[Pt] = []
        for p in seq:
            while len(out) >= 2:
                o, q = out[-2], out[-1]
                if ((q[0] - o[0]) * (p[1] - o[1])
                        - (q[1] - o[1]) * (p[0] - o[0])) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower, upper = half(pts), half(list(reversed(pts)))
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:  # collinear input
        a, b = pts[0], pts[-1]
        return (f"LINESTRING({_fmt(a[0])} {_fmt(a[1])}, "
                f"{_fmt(b[0])} {_fmt(b[1])})")
    return _polygonal_wkt([hull])


# -- DE-9IM relate ------------------------------------------------------------

def _edge_inside_intervals(e, rings: list[Ring], want: int) -> bool:
    """True iff a positive-length piece of segment ``e`` lies strictly
    inside (want=1) / strictly outside (want=-1) the even-odd area."""
    (ax, ay), (bx, by) = e
    ts = {0.0, 1.0}
    for c, d in _edges(rings):
        (cx, cy), (dx, dy) = c, d
        rx, ry = bx - ax, by - ay
        sx, sy = dx - cx, dy - cy
        denom = rx * sy - ry * sx
        if denom == 0:
            # collinear overlap: project the other edge's endpoints
            if _on_segment(c, (ax, ay), (bx, by)):
                tc = ((cx - ax) * rx + (cy - ay) * ry) / (rx * rx + ry * ry)
                ts.add(min(1.0, max(0.0, tc)))
            if _on_segment(d, (ax, ay), (bx, by)):
                td = ((dx - ax) * rx + (dy - ay) * ry) / (rx * rx + ry * ry)
                ts.add(min(1.0, max(0.0, td)))
            continue
        t = ((cx - ax) * sy - (cy - ay) * sx) / denom
        u = ((cx - ax) * ry - (cy - ay) * rx) / denom
        if 0 <= t <= 1 and 0 <= u <= 1:
            ts.add(t)
    tsl = sorted(ts)
    for t0, t1 in zip(tsl, tsl[1:]):
        if not t1 > t0:
            continue
        tm = t0 + (t1 - t0) / 2
        p = (ax + tm * (bx - ax), ay + tm * (by - ay))
        if point_in_rings(p, rings) == want:
            return True
    return False


def _collinear_overlap(e, f) -> bool:
    """Segments e, f are collinear and overlap with positive length."""
    (ax, ay), (bx, by) = e
    (cx, cy), (dx, dy) = f
    rx, ry = bx - ax, by - ay
    if rx * (dy - cy) - ry * (dx - cx) != 0:
        return False
    if rx * (cy - ay) - ry * (cx - ax) != 0:
        return False
    den = rx * rx + ry * ry
    tc = ((cx - ax) * rx + (cy - ay) * ry) / den
    td = ((dx - ax) * rx + (dy - ay) * ry) / den
    lo, hi = max(0.0, min(tc, td)), min(1.0, max(tc, td))
    return hi > lo


def _boundaries_share_segment(ra: list[Ring], rb: list[Ring]) -> bool:
    return any(
        _collinear_overlap(e, f) for e in _edges(ra) for f in _edges(rb)
    )


def _boundaries_touch(ra: list[Ring], rb: list[Ring]) -> bool:
    for e in _edges(ra):
        for f in _edges(rb):
            if _cross_ys(e, f):
                return True
            if (_on_segment(f[0], e[0], e[1])
                    or _on_segment(f[1], e[0], e[1])
                    or _on_segment(e[0], f[0], f[1])
                    or _on_segment(e[1], f[0], f[1])):
                return True
    return False


def _line_boundary_pts(lines: list[list[Pt]]) -> set[Pt]:
    """OGC Mod-2 boundary of a polyline set: endpoints occurring an odd
    number of times (closed polylines have empty boundary)."""
    from collections import Counter

    c: Counter = Counter()
    for ln in lines:
        if ln[0] == ln[-1]:
            continue
        c[ln[0]] += 1
        c[ln[-1]] += 1
    return {q for q, n in c.items() if n % 2}


def _rings_as_lines(rings: list[Ring]) -> list[list[Pt]]:
    return [r + [r[0]] for r in rings if len(r) >= 2]


def _dim_area_line(rings: list[Ring], lines: list[list[Pt]],
                   want: int) -> int:
    """1 if a positive-length piece of ``lines`` classifies ``want``
    against the area, else -1."""
    return 1 if _clip_lines_to_area(lines, rings, (want,)) else -1


def _dim_line_line(la: list[list[Pt]], ea: set, lb: list[list[Pt]],
                   eb: set) -> int:
    """Dim of (lineset A minus excluded points) ∩ (lineset B minus
    excluded points): 1 for a collinear overlap, 0 for an isolated
    contact outside both exclusion sets."""
    if not la or not lb:
        return -1
    segs, pts = _line_line_bits(la, lb)
    if segs:
        return 1
    if any(q not in ea and q not in eb for q in pts):
        return 0
    return -1


def de9im(wkt_a: str | None, wkt_b: str | None) -> list[int] | None:
    """The DE-9IM matrix [II, IB, IE, BI, BB, BE, EI, EB, EE] as
    dimensions (-1 = empty) for point / line / polygonal operand pairs
    (mixed-dimension GEOMETRYCOLLECTIONs compose cell-wise). OGC SFA
    topology on the kernel's exactness domain: polygon interior = open
    even-odd area, boundary = rings; line interior = the polyline minus
    its Mod-2 endpoints, boundary = those endpoints; point interior =
    the point, boundary empty."""
    a, b = parse_geom(wkt_a), parse_geom(wkt_b)
    if a is None or b is None:
        return None

    abnd, bbnd = _line_boundary_pts(a.lines), _line_boundary_pts(b.lines)
    aring_l, bring_l = _rings_as_lines(a.rings), _rings_as_lines(b.rings)

    def covered_by(q: Pt, g: Geom) -> bool:
        return (q in g.points or _on_any_line(q, g.lines)
                or point_in_rings(q, g.rings) >= 0)

    # ---- II ----
    ii = -1
    if a.rings and b.rings and boolop_rings(a.rings, b.rings, "and"):
        ii = 2
    if ii < 1:
        if a.rings and _dim_area_line(a.rings, b.lines, 1) == 1:
            ii = max(ii, 1)
        if b.rings and _dim_area_line(b.rings, a.lines, 1) == 1:
            ii = max(ii, 1)
        ii = max(ii, _dim_line_line(a.lines, abnd, b.lines, bbnd))
    for q in a.points:
        if (q in b.points or point_in_rings(q, b.rings) == 1
                or (_on_any_line(q, b.lines) and q not in bbnd)):
            ii = max(ii, 0)
    for q in b.points:
        if (q in a.points or point_in_rings(q, a.rings) == 1
                or (_on_any_line(q, a.lines) and q not in abnd)):
            ii = max(ii, 0)

    # ---- IB: interior(A) ∩ boundary(B) ----
    ib = -1
    if b.rings:
        if a.rings and any(
            _edge_inside_intervals(e, a.rings, 1) for e in _edges(b.rings)
        ):
            ib = 1
        ib = max(ib, _dim_line_line(a.lines, abnd, bring_l, set()))
        for q in a.points:
            if point_in_rings(q, b.rings) == 0:
                ib = max(ib, 0)
    if bbnd:
        for q in bbnd:
            if (point_in_rings(q, a.rings) == 1
                    or (_on_any_line(q, a.lines) and q not in abnd)
                    or q in a.points):
                ib = max(ib, 0)

    # ---- IE: interior(A) ∩ exterior(B) ----
    ie = -1
    if a.rings and (not b.rings or boolop_rings(a.rings, b.rings, "sub")):
        ie = 2
    if ie < 1 and a.lines:
        outside = (_clip_lines_to_area(a.lines, b.rings, (-1,))
                   if b.rings else list(_lsegs(a.lines)))
        if b.lines and outside:
            outside = _subtract_line_overlaps(
                _merge_line_pieces(outside), b.lines
            )
        if outside:
            ie = max(ie, 1)
    for q in a.points:
        if not covered_by(q, b):
            ie = max(ie, 0)

    # ---- BI: boundary(A) ∩ interior(B) ----
    bi = -1
    if a.rings:
        if b.rings and any(
            _edge_inside_intervals(e, b.rings, 1) for e in _edges(a.rings)
        ):
            bi = 1
        bi = max(bi, _dim_line_line(aring_l, set(), b.lines, bbnd))
        for q in b.points:
            if point_in_rings(q, a.rings) == 0:
                bi = max(bi, 0)
    for q in abnd:
        if (point_in_rings(q, b.rings) == 1
                or (_on_any_line(q, b.lines) and q not in bbnd)
                or q in b.points):
            bi = max(bi, 0)

    # ---- BB ----
    bb = -1
    if a.rings and b.rings:
        if _boundaries_share_segment(a.rings, b.rings):
            bb = 1
        elif _boundaries_touch(a.rings, b.rings):
            bb = 0
    if bb < 1 and a.rings and bbnd:
        if any(_on_any_line(q, aring_l) for q in bbnd):
            bb = max(bb, 0)
    if bb < 1 and b.rings and abnd:
        if any(_on_any_line(q, bring_l) for q in abnd):
            bb = max(bb, 0)
    if abnd & bbnd:
        bb = max(bb, 0)

    # ---- BE: boundary(A) ∩ exterior(B) ----
    be = -1
    if a.rings:
        outside = (_clip_lines_to_area(aring_l, b.rings, (-1,))
                   if b.rings else list(_lsegs(aring_l)))
        if b.lines and outside:
            outside = _subtract_line_overlaps(
                _merge_line_pieces(outside), b.lines
            )
        if outside:
            be = 1
    for q in abnd:
        if not covered_by(q, b):
            be = max(be, 0)

    # ---- EI: exterior(A) ∩ interior(B) ----
    ei = -1
    if b.rings and (not a.rings or boolop_rings(b.rings, a.rings, "sub")):
        ei = 2
    if ei < 1 and b.lines:
        outside = (_clip_lines_to_area(b.lines, a.rings, (-1,))
                   if a.rings else list(_lsegs(b.lines)))
        if a.lines and outside:
            outside = _subtract_line_overlaps(
                _merge_line_pieces(outside), a.lines
            )
        if outside:
            ei = max(ei, 1)
    for q in b.points:
        if not covered_by(q, a):
            ei = max(ei, 0)

    # ---- EB: exterior(A) ∩ boundary(B) ----
    eb = -1
    if b.rings:
        outside = (_clip_lines_to_area(bring_l, a.rings, (-1,))
                   if a.rings else list(_lsegs(bring_l)))
        if a.lines and outside:
            outside = _subtract_line_overlaps(
                _merge_line_pieces(outside), a.lines
            )
        if outside:
            eb = 1
    for q in bbnd:
        if not covered_by(q, a):
            eb = max(eb, 0)

    return [ii, ib, ie, bi, bb, be, ei, eb, 2]


def relate_wkt(wkt_a: str | None, wkt_b: str | None,
               pattern: str | None) -> bool | None:
    """geof:relate(a, b, DE-9IM pattern) → boolean; None on unsupported
    input or malformed pattern."""
    if pattern is None or len(pattern.strip()) != 9:
        return None
    matrix = de9im(wkt_a, wkt_b)
    if matrix is None:
        return None
    for cell, want in zip(matrix, pattern.strip()):
        if want == "*":
            continue
        if want in "Tt":
            if cell < 0:
                return False
        elif want in "Ff":
            if cell >= 0:
                return False
        elif want in "012":
            if cell != int(want):
                return False
        else:
            return None
    return True


# -- buffer (general geometries) ----------------------------------------------

_BUF_ARC_SEGS = 8  # quarter-circle segments: 32 per full circle


def _circle_ring(cx: float, cy: float, r: float, segs: int = 4 * _BUF_ARC_SEGS) -> Ring:
    import math

    # 12-dp rounding kills the ±1e-16 trig artifacts so outputs stay
    # regex-consumable by the JVM predicate kernels
    return [
        (round(cx + r * math.cos(2 * math.pi * i / segs), 12),
         round(cy + r * math.sin(2 * math.pi * i / segs), 12))
        for i in range(segs)
    ]


def _segment_capsule(a: Pt, b: Pt, r: float) -> list[Ring]:
    """Rectangle along the segment plus full-circle caps at both ends
    (union via even-odd is wrong for overlapping rings, so the caller
    merges capsules through boolop_rings 'or')."""
    import math

    (ax, ay), (bx, by) = a, b
    dx, dy = bx - ax, by - ay
    ln = math.hypot(dx, dy)
    if ln == 0:
        return [_circle_ring(ax, ay, r)]
    nx, ny = -dy / ln * r, dx / ln * r
    rect = [(round(ax + nx, 12), round(ay + ny, 12)),
            (round(bx + nx, 12), round(by + ny, 12)),
            (round(bx - nx, 12), round(by - ny, 12)),
            (round(ax - nx, 12), round(ay - ny, 12))]
    return [rect, _circle_ring(ax, ay, r), _circle_ring(bx, by, r)]


def buffer_wkt(wkt: str | None, radius: float,
               geographic: bool = False) -> str | None:
    """Positive-radius buffer of any supported geometry: the union of
    per-segment capsules (rectangle + 32-gon end caps) with the original
    area — assembled through the same slab boolean kernel, so output is
    canonical WKT. ``radius`` is in y-coordinate units; with
    ``geographic=True`` the x axis is pre-scaled by cos(mean latitude)
    so the buffer is metrically round under the same equirectangular
    model as geof:distance, then unscaled on output."""
    import math

    g = parse_geom(wkt)
    if g is None or radius is None or radius <= 0:
        return None
    if g.is_empty():
        return "GEOMETRYCOLLECTION EMPTY"
    c = 1.0
    if geographic:
        ys = ([y for _, y in g.points]
              + [y for ln in g.lines for _, y in ln]
              + [y for r in g.rings for _, y in r])
        c = math.cos(math.radians(sum(ys) / len(ys))) or 1.0

    def fwd(p: Pt) -> Pt:
        return (p[0] * c, p[1])

    pts = [fwd(p) for p in g.points]
    lines = [[fwd(p) for p in ln] for ln in g.lines]
    rings = [[fwd(p) for p in r] for r in g.rings]
    acc: list[Ring] = list(rings)
    pieces: list[Ring] = []
    for x, y in pts:
        pieces.append(_circle_ring(x, y, radius))
    for a, b in _lsegs(lines):
        pieces.extend(_segment_capsule(a, b, radius))
    for a, b in _edges(rings):
        pieces.extend(_segment_capsule(a, b, radius))
    for ring in pieces:
        acc = boolop_rings(acc, [ring], "or")
    out = [[(round(x / c, 12), y) for x, y in r] for r in acc]
    return format_geom(Geom(rings=out))


# -- OGC named predicates over the DE-9IM (generality escape hatch) -----------

def _geom_dim(g: Geom) -> int:
    if g.rings:
        return 2
    if g.lines:
        return 1
    if g.points:
        return 0
    return -1


def _match(matrix: list[int], pattern: str) -> bool:
    for cell, want in zip(matrix, pattern):
        if want == "*":
            continue
        if want == "T" and cell < 0:
            return False
        if want == "F" and cell >= 0:
            return False
        if want in "012" and cell != int(want):
            return False
    return True


def named_predicate(wkt_a: str | None, wkt_b: str | None,
                    name: str) -> bool | None:
    """The OGC simple-features named predicates evaluated through the
    full DE-9IM — the dimension-aware generality path the JVM Column
    kernels dispatch to for shapes outside their envelope (mixed
    GEOMETRYCOLLECTIONs, line containment). Dim-dependent patterns
    (overlaps/crosses) follow JTS RelateOp."""
    a, b = parse_geom(wkt_a), parse_geom(wkt_b)
    if a is None or b is None:
        return None
    if a.is_empty() or b.is_empty():
        return name == "disjoint"
    m = de9im(wkt_a, wkt_b)
    if m is None:
        return None
    da, db = _geom_dim(a), _geom_dim(b)
    if name == "disjoint":
        return _match(m, "FF*FF****")
    if name == "intersects":
        return not _match(m, "FF*FF****")
    if name == "equals":
        return _match(m, "T*F**FFF*")
    if name == "within":
        return _match(m, "T*F**F***")
    if name == "contains":
        return _match(m, "T*****FF*")
    if name == "touches":
        return (_match(m, "FT*******") or _match(m, "F**T*****")
                or _match(m, "F***T****"))
    if name == "overlaps":
        if da != db:
            return False
        if da == 1:
            return _match(m, "1*T***T**")
        return _match(m, "T*T***T**")
    if name == "crosses":
        if da < db:
            return _match(m, "T*T******")
        if da > db:
            return _match(m, "T*****T**")
        if da == 1:
            return _match(m, "0********")
        return False
    return None
