"""GeoSPARQL §8.7-8.8 non-topological functions (VERDICT r7 task 2) and
GEOMETRYCOLLECTION / empty-geometry consumption (task 3).

Expectations derived from OGC set semantics on hand-verifiable
lattice-aligned shapes, plus hypothesis property tests: membership
algebra (p ∈ A∩B ⟺ p ∈ A ∧ p ∈ B …), commutativity, containment
invariants, and self-output consumption (every produced WKT parses and
classifies through the same kernels and the JVM predicates).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dublin_smart_city_graphdb_spark.geo.boolops import (
    boolop_wkt,
    convex_hull_wkt,
    de9im,
    parse_geom,
    point_in_rings,
    relate_wkt,
)

A = "POLYGON((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0))"
B = "POLYGON((5.0 5.0, 15.0 5.0, 15.0 15.0, 5.0 15.0, 5.0 5.0))"
FAR = "POLYGON((20.0 20.0, 30.0 20.0, 30.0 30.0, 20.0 30.0, 20.0 20.0))"
EDGE = "POLYGON((10.0 0.0, 20.0 0.0, 20.0 10.0, 10.0 10.0, 10.0 0.0))"
INNER = "POLYGON((2.0 2.0, 8.0 2.0, 8.0 8.0, 2.0 8.0, 2.0 2.0))"
EMPTY = "GEOMETRYCOLLECTION EMPTY"


# -- kernel unit tests (pure Python, no Spark) --------------------------------

def test_intersection_overlap():
    assert boolop_wkt(A, B, "and") == (
        "POLYGON((5.0 5.0, 10.0 5.0, 10.0 10.0, 5.0 10.0, 5.0 5.0))"
    )


def test_union_overlap_is_octagon():
    out = boolop_wkt(A, B, "or")
    g = parse_geom(out)
    assert len(g.rings) == 1 and len(g.rings[0]) == 8


def test_difference_containment_makes_hole():
    out = boolop_wkt(A, INNER, "sub")
    g = parse_geom(out)
    assert len(g.rings) == 2  # shell + hole
    assert point_in_rings((1.0, 1.0), g.rings) == 1
    assert point_in_rings((5.0, 5.0), g.rings) == -1  # inside the hole
    # reverse containment is empty
    assert boolop_wkt(INNER, A, "sub") == EMPTY


def test_symdifference_membership():
    g = parse_geom(boolop_wkt(A, B, "xor"))
    for p, want in [((2, 2), 1), ((7, 7), -1), ((12, 12), 1),
                    ((7, 2), 1), ((12, 7), 1), ((20, 20), -1)]:
        assert point_in_rings((float(p[0]), float(p[1])), g.rings) == want


def test_disjoint_and_shared_edge():
    assert boolop_wkt(A, FAR, "and") == EMPTY
    assert parse_geom(boolop_wkt(A, FAR, "or")).rings.__len__() == 2
    assert boolop_wkt(A, EDGE, "and") == EMPTY  # shared edge: no area
    # shared edge union welds into one rectangle
    assert boolop_wkt(A, EDGE, "or") == (
        "POLYGON((0.0 0.0, 20.0 0.0, 20.0 10.0, 0.0 10.0, 0.0 0.0))"
    )


def test_corner_touch_union_splits_simply():
    c = "POLYGON((10.0 10.0, 20.0 10.0, 20.0 20.0, 10.0 20.0, 10.0 10.0))"
    out = boolop_wkt(A, c, "or")
    assert out.startswith("MULTIPOLYGON")
    g = parse_geom(out)
    assert len(g.rings) == 2


def test_non_axis_aligned_clip():
    tri = "POLYGON((0.0 0.0, 10.0 0.0, 5.0 10.0, 0.0 0.0))"
    box = "POLYGON((0.0 0.0, 10.0 0.0, 10.0 5.0, 0.0 5.0, 0.0 0.0))"
    assert boolop_wkt(tri, box, "and") == (
        "POLYGON((0.0 0.0, 10.0 0.0, 7.5 5.0, 2.5 5.0, 0.0 0.0))"
    )
    # xor splits at the two crossing junctions into three simple pieces
    g = parse_geom(boolop_wkt(tri, box, "xor"))
    assert len(g.rings) == 3


def test_self_and_empty_identities():
    assert boolop_wkt(A, A, "and") == A
    assert boolop_wkt(A, A, "sub") == EMPTY
    assert boolop_wkt(A, A, "xor") == EMPTY
    assert boolop_wkt(A, EMPTY, "and") == EMPTY
    assert boolop_wkt(A, EMPTY, "or") == A
    assert boolop_wkt(EMPTY, A, "sub") == EMPTY


def test_point_mixed_dimension_ops():
    assert boolop_wkt("POINT(3.0 3.0)", A, "and") == "POINT(3.0 3.0)"
    assert boolop_wkt("POINT(30.0 30.0)", A, "and") == EMPTY
    assert boolop_wkt("POINT(30.0 30.0)", A, "or").startswith(
        "GEOMETRYCOLLECTION(POINT(30.0 30.0), POLYGON"
    )
    assert boolop_wkt("POINT(3.0 3.0)", A, "or") == A
    assert boolop_wkt("POINT(3.0 3.0)", "POINT(3.0 3.0)", "and") == \
        "POINT(3.0 3.0)"
    assert boolop_wkt("POINT(1.0 1.0)", "POINT(2.0 2.0)", "or") == \
        "MULTIPOINT((1.0 1.0), (2.0 2.0))"
    assert boolop_wkt("POINT(1.0 1.0)", A, "sub") == EMPTY  # on closure? no
    assert boolop_wkt("POINT(30.0 30.0)", A, "sub") == "POINT(30.0 30.0)"


def test_malformed_wkt_is_error():
    assert boolop_wkt(A, "not wkt at all 123", "or") is None
    assert boolop_wkt("CIRCULARSTRING(0 0, 1 1, 2 0)", A, "and") is None


def test_geometrycollection_input_flattens():
    gc = f"GEOMETRYCOLLECTION({A}, {FAR})"
    assert boolop_wkt(gc, B, "and") == boolop_wkt(A, B, "and")
    out = boolop_wkt(gc, EMPTY, "or")
    assert out.startswith("MULTIPOLYGON")


def test_convex_hull():
    assert convex_hull_wkt(
        "MULTIPOINT((0.0 0.0), (4.0 0.0), (4.0 4.0), (2.0 1.0), (0.0 4.0))"
    ) == "POLYGON((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))"
    assert convex_hull_wkt("POINT(3.0 4.0)") == "POINT(3.0 4.0)"
    assert convex_hull_wkt(
        "MULTIPOINT((0.0 0.0), (1.0 1.0), (2.0 2.0))"
    ) == "LINESTRING(0.0 0.0, 2.0 2.0)"
    assert convex_hull_wkt(EMPTY) == EMPTY
    # hull of a polygon covers the polygon
    hull = convex_hull_wkt(
        "POLYGON((0.0 0.0, 10.0 0.0, 5.0 3.0, 10.0 10.0, 0.0 10.0, 0.0 0.0))"
    )
    g = parse_geom(hull)
    assert point_in_rings((7.0, 5.0), g.rings) == 1  # the concavity filled


DE9IM_PATTERNS = [
    # (a, b, pattern, expect) — the standard named-predicate patterns
    (A, B, "T*T***T**", True),          # overlaps (area/area)
    (A, A, "T*F**FFF*", True),          # equals
    (INNER, A, "T*F**F***", True),      # within
    (A, INNER, "T*****FF*", True),      # contains
    (A, EDGE, "F***T****", True),       # touches (area/area: BB arm of
                                        # the OGC three-pattern union)
    (A, EDGE, "FF2F11212", True),       # the exact JTS matrix
    (A, EDGE, "FT*******", False),      # IB empty for edge-touch areas
    (A, FAR, "FF*FF****", True),        # disjoint
    (A, B, "FF*FF****", False),
    (INNER, A, "T*****FF*", False),     # inner does not contain A
    ("POINT(3.0 3.0)", A, "T*F**F***", True),   # point within
    ("POINT(10.0 5.0)", A, "FF*FF****", False),  # on boundary ≠ disjoint
]


@pytest.mark.parametrize("a,b,pattern,expect", DE9IM_PATTERNS)
def test_relate_patterns(a, b, pattern, expect):
    assert relate_wkt(a, b, pattern) is expect


def test_de9im_dims():
    m = de9im(A, B)
    assert m == [2, 1, 2, 1, 0, 1, 2, 1, 2]
    assert de9im(A, EDGE)[4] == 1  # boundaries share a segment
    assert de9im(A, FAR) == [-1, -1, 2, -1, -1, 1, 2, 1, 2]
    assert relate_wkt(A, B, "bogus") is None
    assert relate_wkt(A, B, "212101212") is True


# -- hypothesis: membership algebra on lattice boxes --------------------------

def _box(x0, y0, w, h):
    x1, y1 = x0 + w, y0 + h
    return (f"POLYGON(({x0}.0 {y0}.0, {x1}.0 {y0}.0, {x1}.0 {y1}.0, "
            f"{x0}.0 {y1}.0, {x0}.0 {y0}.0))")


boxes = st.tuples(
    st.integers(0, 12), st.integers(0, 12),
    st.integers(1, 8), st.integers(1, 8),
)


@settings(max_examples=60, deadline=None)
@given(boxes, boxes)
def test_boolop_membership_algebra(ba, bb):
    wa, wb = _box(*ba), _box(*bb)
    ga, gb = parse_geom(wa), parse_geom(wb)
    results = {op: parse_geom(boolop_wkt(wa, wb, op)) for op in
               ("and", "or", "sub", "xor")}
    # sample strictly-interior lattice-offset points so boundary ties
    # can't blur the membership predicate
    for px in range(0, 22):
        for py in range(0, 22):
            p = (px + 0.5, py + 0.5)
            in_a = point_in_rings(p, ga.rings) == 1
            in_b = point_in_rings(p, gb.rings) == 1
            assert (point_in_rings(p, results["and"].rings) == 1) == (
                in_a and in_b)
            assert (point_in_rings(p, results["or"].rings) == 1) == (
                in_a or in_b)
            assert (point_in_rings(p, results["sub"].rings) == 1) == (
                in_a and not in_b)
            assert (point_in_rings(p, results["xor"].rings) == 1) == (
                in_a != in_b)


@settings(max_examples=40, deadline=None)
@given(boxes, boxes)
def test_boolop_commutativity_and_roundtrip(ba, bb):
    wa, wb = _box(*ba), _box(*bb)
    for op in ("and", "or", "xor"):
        ab, ba_ = boolop_wkt(wa, wb, op), boolop_wkt(wb, wa, op)
        assert ab == ba_  # canonical output ⇒ commutativity is textual
        assert parse_geom(ab) is not None  # self-consumable
    # hull(hull(x)) == hull(x)
    h = convex_hull_wkt(wa)
    assert convex_hull_wkt(h) == h


# -- SPARQL end-to-end + JVM-predicate interop --------------------------------

GEO_TTL = """
@prefix ex: <http://x#> .
@prefix geo: <http://www.opengis.net/ont/geosparql#> .
ex:a geo:asWKT "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"^^geo:wktLiteral .
ex:b geo:asWKT "POLYGON((5 5, 15 5, 15 15, 5 15, 5 5))"^^geo:wktLiteral .
ex:p geo:asWKT "POINT(1 1)"^^geo:wktLiteral .
"""

PFX = """
PREFIX ex: <http://x#>
PREFIX geo: <http://www.opengis.net/ont/geosparql#>
PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
"""


@pytest.fixture(scope="module")
def geo_repo(spark):
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    # 120s: the geo set-function queries carry a fixed plan-analysis +
    # Arrow-eval cost that can exceed the default 30s query timeout on a
    # fully loaded 32-thread suite run (observed: TimeoutError flakes
    # under concurrent full-suite load, instant standalone)
    r = eng.create_repository(
        "geo_boolops", ruleset="none", query_timeout=120.0
    )
    r.load_turtle(GEO_TTL)
    yield r
    eng.drop_repository("geo_boolops")


def test_sparql_intersection_bind(geo_repo):
    rows = geo_repo.sparql_collect(PFX + """
        SELECT ?i WHERE {
          ex:a geo:asWKT ?wa . ex:b geo:asWKT ?wb .
          BIND(geof:intersection(?wa, ?wb) AS ?i)
        }
    """)
    assert rows[0]["i"]["lex"] == (
        "POLYGON((5.0 5.0, 10.0 5.0, 10.0 10.0, 5.0 10.0, 5.0 5.0))"
    )
    assert rows[0]["i"]["dtype"].endswith("wktLiteral")


def test_sparql_setops_feed_jvm_predicates(geo_repo):
    """Self-output consumption: set-op results flow into the JVM
    predicate kernels (the r6/r7 finding class this round closes)."""
    rows = geo_repo.sparql_collect(PFX + """
        SELECT ?inInter ?unionHasA ?diffDisjointB WHERE {
          ex:a geo:asWKT ?wa . ex:b geo:asWKT ?wb . ex:p geo:asWKT ?wp .
          BIND(geof:intersection(?wa, ?wb) AS ?i)
          BIND(geof:union(?wa, ?wb) AS ?u)
          BIND(geof:difference(?wa, ?wb) AS ?d)
          BIND(geof:sfWithin("POINT(7 7)"^^geo:wktLiteral, ?i) AS ?inInter)
          BIND(geof:ehCoveredBy(?wa, ?u) AS ?unionHasA)
          BIND(geof:sfDisjoint(?d, ?wb) AS ?diffDisjointB)
        }
    """)
    r = rows[0]
    assert r["inInter"]["lex"] == "true"
    assert r["unionHasA"]["lex"] == "true"
    # difference touches B along the cut line, so NOT disjoint — the
    # predicate must still answer (false), not error
    assert r["diffDisjointB"]["lex"] == "false"


def test_sparql_relate_filter(geo_repo):
    rows = geo_repo.sparql_collect(PFX + """
        SELECT ?g WHERE {
          ?g geo:asWKT ?w .
          FILTER(geof:relate(?w,
            "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"^^geo:wktLiteral,
            "T*F**F***"))
        } ORDER BY ?g
    """)
    # within pattern: a itself and the point inside it
    assert [r["g"]["lex"] for r in rows] == ["http://x#a", "http://x#p"]


def test_boundary_empty_roundtrip(geo_repo):
    """VERDICT r7 task 3 done-criterion: boundary(point) →
    GEOMETRYCOLLECTION EMPTY → sfDisjoint answers true, no error."""
    rows = geo_repo.sparql_collect(PFX + """
        SELECT ?d ?i WHERE {
          ex:p geo:asWKT ?wp . ex:a geo:asWKT ?wa .
          BIND(geof:boundary(?wp) AS ?e)
          BIND(geof:sfDisjoint(?e, ?wa) AS ?d)
          BIND(geof:sfIntersects(?e, ?wa) AS ?i)
        }
    """)
    assert rows[0]["d"]["lex"] == "true"
    assert rows[0]["i"]["lex"] == "false"


def test_geometrycollection_consumed_by_predicates(geo_repo):
    rows = geo_repo.sparql_collect(PFX + """
        SELECT ?eq ?tch WHERE {
          BIND("GEOMETRYCOLLECTION(POLYGON((0 0, 2 0, 2 2, 0 2, 0 0)))"^^geo:wktLiteral AS ?gc)
          BIND(geof:sfEquals(?gc,
            "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"^^geo:wktLiteral) AS ?eq)
          BIND(geof:sfTouches("POINT(1 0)"^^geo:wktLiteral, ?gc) AS ?tch)
        }
    """)
    assert rows[0]["eq"]["lex"] == "true"
    assert rows[0]["tch"]["lex"] == "true"


# -- round 8b: linework set operations ---------------------------------------

L_CROSS = "LINESTRING(-5.0 5.0, 15.0 5.0)"
L_IN = "LINESTRING(2.0 2.0, 8.0 2.0)"
L_EDGE = "LINESTRING(10.0 0.0, 10.0 10.0)"
M1 = "LINESTRING(0.0 0.0, 10.0 0.0)"
M2 = "LINESTRING(4.0 0.0, 14.0 0.0)"
M3 = "LINESTRING(5.0 -5.0, 5.0 5.0)"


def test_line_polygon_set_ops():
    assert boolop_wkt(L_CROSS, A, "and") == "LINESTRING(0.0 5.0, 10.0 5.0)"
    assert boolop_wkt(L_CROSS, A, "sub") == (
        "MULTILINESTRING((-5.0 5.0, 0.0 5.0), (10.0 5.0, 15.0 5.0))"
    )
    out = boolop_wkt(L_CROSS, A, "or")
    assert out.startswith("GEOMETRYCOLLECTION(MULTILINESTRING")
    assert "POLYGON" in out
    # a line inside the polygon is absorbed by union, kept by intersection
    assert boolop_wkt(L_IN, A, "or") == A
    assert boolop_wkt(L_IN, A, "and") == L_IN
    # polygon minus a line is the polygon (measure zero)
    assert boolop_wkt(A, L_CROSS, "sub") == A
    # boundary-riding line
    assert boolop_wkt(L_EDGE, A, "and") == L_EDGE


def test_line_line_set_ops():
    assert boolop_wkt(M1, M2, "and") == "LINESTRING(4.0 0.0, 10.0 0.0)"
    assert boolop_wkt(M1, M2, "sub") == "LINESTRING(0.0 0.0, 4.0 0.0)"
    # overlapping collinear union: NODED at the overlap endpoints (JTS
    # overlay canonical form — r8 verdict task 4; previously dissolved
    # into one merged line)
    assert boolop_wkt(M1, M2, "or") == (
        "MULTILINESTRING((0.0 0.0, 4.0 0.0), (4.0 0.0, 10.0 0.0), "
        "(10.0 0.0, 14.0 0.0))"
    )
    assert boolop_wkt(M1, M2, "xor") == (
        "MULTILINESTRING((0.0 0.0, 4.0 0.0), (10.0 0.0, 14.0 0.0))"
    )
    # overlap strictly inside one operand: three fragments, the middle
    # one being the shared interval (JTS union of (0..10) with (4..7))
    assert boolop_wkt(M1, "LINESTRING(4.0 0.0, 7.0 0.0)", "or") == (
        "MULTILINESTRING((0.0 0.0, 4.0 0.0), (4.0 0.0, 7.0 0.0), "
        "(7.0 0.0, 10.0 0.0))"
    )
    # ... and difference keeps the gap fragments unmerged
    assert boolop_wkt(M1, "LINESTRING(4.0 0.0, 7.0 0.0)", "sub") == (
        "MULTILINESTRING((0.0 0.0, 4.0 0.0), (7.0 0.0, 10.0 0.0))"
    )
    # transversal crossing: point intersection; difference/union/xor are
    # NODED at the crossing (JTS overlay canonical form — the measure-
    # zero point still subtracts nothing, but the linework splits)
    assert boolop_wkt(M1, M3, "and") == "POINT(5.0 0.0)"
    assert boolop_wkt(M1, M3, "sub") == (
        "MULTILINESTRING((0.0 0.0, 5.0 0.0), (5.0 0.0, 10.0 0.0))"
    )
    assert boolop_wkt(M1, M3, "or") == (
        "MULTILINESTRING((0.0 0.0, 5.0 0.0), (5.0 -5.0, 5.0 0.0), "
        "(5.0 0.0, 5.0 5.0), (5.0 0.0, 10.0 0.0))"
    )
    assert boolop_wkt(M1, M3, "xor") == boolop_wkt(M1, M3, "or")
    # T-contact: the other line's endpoint in M1's interior also nodes
    assert boolop_wkt(M1, "LINESTRING(5.0 0.0, 5.0 5.0)", "sub") == (
        "MULTILINESTRING((0.0 0.0, 5.0 0.0), (5.0 0.0, 10.0 0.0))"
    )
    # tip-to-tip touch stays chain-merged (LineMerger canonicalization)
    assert boolop_wkt(M1, "LINESTRING(10.0 0.0, 15.0 5.0)", "or") == (
        "LINESTRING(0.0 0.0, 10.0 0.0, 15.0 5.0)"
    )
    for op in ("and", "or", "xor"):
        assert boolop_wkt(M1, M2, op) == boolop_wkt(M2, M1, op), op
        assert boolop_wkt(M1, M3, op) == boolop_wkt(M3, M1, op), op


def test_polyline_bend_survives_clipping():
    bend = "LINESTRING(-5.0 2.0, 5.0 2.0, 5.0 8.0, 15.0 8.0)"
    assert boolop_wkt(bend, A, "and") == (
        "LINESTRING(0.0 2.0, 5.0 2.0, 5.0 8.0, 10.0 8.0)"
    )


def test_line_outputs_feed_back():
    clipped = boolop_wkt(L_CROSS, A, "and")
    g = parse_geom(clipped)
    assert g is not None and len(g.lines) == 1
    assert boolop_wkt(clipped, A, "sub") == "GEOMETRYCOLLECTION EMPTY"
    assert convex_hull_wkt(clipped) == clipped  # straight line: own hull


LINE_DE9IM = [
    # JTS-derived matrices
    (L_CROSS, A, [1, 0, 1, -1, -1, 0, 2, 1, 2]),    # line crosses area
    (L_IN, A, [1, -1, -1, 0, -1, -1, 2, 1, 2]),     # line within area
    (L_EDGE, A, [-1, 1, -1, -1, 0, -1, 2, 1, 2]),   # line on boundary
    (M1, M3, [0, -1, 1, -1, -1, 0, 1, 0, 2]),       # lines cross at a point
    (M1, M2, [1, 0, 1, 0, -1, 0, 1, 0, 2]),         # collinear overlap
    (M1, "LINESTRING(10.0 0.0, 20.0 0.0)",
     [-1, -1, 1, -1, 0, 0, 1, 0, 2]),               # endpoint touch
]


@pytest.mark.parametrize("a,b,want", LINE_DE9IM)
def test_line_de9im_matrices(a, b, want):
    assert de9im(a, b) == want


def test_line_relate_patterns():
    assert relate_wkt(L_IN, A, "T*F**F***") is True      # within
    assert relate_wkt(L_CROSS, A, "T*T******") is True    # crosses (dim mix)
    assert relate_wkt(M1, "LINESTRING(10.0 0.0, 20.0 0.0)",
                      "F***T****") is True                # touches (BB arm)
    assert relate_wkt(M1, M3, "0********") is True        # 0-dim crossing


def test_buffer_general_kernel():
    """buffer(line/polygon): capsule-union through the slab kernel —
    membership at radius±ε, hole shrinkage preserved."""
    from dublin_smart_city_graphdb_spark.geo.boolops import buffer_wkt

    out = buffer_wkt("LINESTRING(0.0 0.0, 10.0 0.0)", 2.0)
    g = parse_geom(out)
    for p, want in [((5.0, 1.9), 1), ((5.0, 2.1), -1),
                    ((-1.9, 0.0), 1), ((-2.5, 0.0), -1),
                    ((11.9, 0.1), 1)]:
        assert point_in_rings(p, g.rings) == want, p
    out2 = buffer_wkt(A, 1.0)
    g2 = parse_geom(out2)
    for p, want in [((5.0, 5.0), 1), ((-0.9, 5.0), 1), ((-1.1, 5.0), -1),
                    ((10.5, 10.5), 1), ((11.0, 11.0), -1)]:
        assert point_in_rings(p, g2.rings) == want, p
    # a holed polygon's hole SHRINKS by the radius
    holed = ("POLYGON((0.0 0.0, 20.0 0.0, 20.0 20.0, 0.0 20.0, 0.0 0.0), "
             "(5.0 5.0, 15.0 5.0, 15.0 15.0, 5.0 15.0, 5.0 5.0))")
    g3 = parse_geom(buffer_wkt(holed, 1.0))
    assert point_in_rings((10.0, 10.0), g3.rings) == -1  # still a hole
    assert point_in_rings((5.5, 10.0), g3.rings) == 1    # eaten by buffer
    assert buffer_wkt(A, 0.0) is None and buffer_wkt(A, -1.0) is None
    assert buffer_wkt("GEOMETRYCOLLECTION EMPTY", 1.0) == \
        "GEOMETRYCOLLECTION EMPTY"


def test_sparql_buffer_general_and_line_ops(geo_repo):
    """r8b: geof:buffer on non-point geometries (capsule-union kernel)
    and LINESTRING operands in the set functions, end-to-end through
    SPARQL with self-consumption into JVM predicates."""
    rows = geo_repo.sparql_collect(PFX + """
        SELECT ?inBuf ?outBuf ?clip WHERE {
          ex:a geo:asWKT ?wa .
          BIND(geof:buffer(?wa, 1, <http://www.opengis.net/def/uom/OGC/1.0/degree>) AS ?b)
          BIND(geof:sfWithin("POINT(-0.5 5)"^^geo:wktLiteral, ?b) AS ?inBuf)
          BIND(geof:sfWithin("POINT(-1.5 5)"^^geo:wktLiteral, ?b) AS ?outBuf)
          BIND(geof:intersection("LINESTRING(-5 5, 15 5)"^^geo:wktLiteral, ?wa) AS ?clip)
        }
    """)
    r = rows[0]
    assert r["inBuf"]["lex"] == "true"
    assert r["outBuf"]["lex"] == "false"
    assert r["clip"]["lex"] == "LINESTRING(0.0 5.0, 10.0 5.0)"


def test_sparql_mixed_gc_and_line_containment_predicates(geo_repo):
    """r8b dispatch escapes: mixed-dimension GEOMETRYCOLLECTION operands
    and line-containment shapes route to the DE-9IM evaluator; the JVM
    envelope (incl. its documented bbox fallbacks) is untouched."""
    rows = geo_repo.sparql_collect(PFX + """
        SELECT ?gcHit ?gcMiss ?lineIn ?lineOut ?contLine ?eqLine WHERE {
          ex:a geo:asWKT ?wa .
          BIND("GEOMETRYCOLLECTION(POINT(30 30), POLYGON((0 0, 10 0, 10 10, 0 10, 0 0)))"^^geo:wktLiteral AS ?gc)
          BIND(geof:sfIntersects(?gc, "POINT(30 30)"^^geo:wktLiteral) AS ?gcHit)
          BIND(geof:sfDisjoint(?gc, "POINT(40 40)"^^geo:wktLiteral) AS ?gcMiss)
          BIND(geof:sfWithin("LINESTRING(2 2, 8 2)"^^geo:wktLiteral, ?wa) AS ?lineIn)
          BIND(geof:sfWithin("LINESTRING(-5 5, 15 5)"^^geo:wktLiteral, ?wa) AS ?lineOut)
          BIND(geof:sfContains(?wa, "LINESTRING(2 2, 8 2)"^^geo:wktLiteral) AS ?contLine)
          BIND(geof:sfEquals("LINESTRING(0 0, 4 4)"^^geo:wktLiteral,
                             "LINESTRING(4 4, 2 2, 0 0)"^^geo:wktLiteral) AS ?eqLine)
        }
    """)
    r = rows[0]
    assert r["gcHit"]["lex"] == "true"     # the point member hits
    assert r["gcMiss"]["lex"] == "true"
    assert r["lineIn"]["lex"] == "true"    # line within polygon (was error)
    assert r["lineOut"]["lex"] == "false"
    assert r["contLine"]["lex"] == "true"
    assert r["eqLine"]["lex"] == "true"    # same line, reversed+split


# horizontal lattice segments: y fixed per case, integer endpoints
hsegs = st.tuples(st.integers(0, 14), st.integers(0, 14), st.integers(1, 8))


@settings(max_examples=60, deadline=None)
@given(hsegs, hsegs)
def test_line_boolop_membership_algebra(sa, sb):
    """1-D membership algebra on collinear lattice segments: a sample
    point is on A∩B / A∪B / A−B / AΔB exactly per the set algebra of
    being on A and on B."""
    from dublin_smart_city_graphdb_spark.geo.boolops import _on_any_line

    (xa, y, wa), (xb, _, wb) = sa, sb
    la = f"LINESTRING({xa}.0 {y}.0, {xa + wa}.0 {y}.0)"
    lb = f"LINESTRING({xb}.0 {y}.0, {xb + wb}.0 {y}.0)"
    res = {op: parse_geom(boolop_wkt(la, lb, op))
           for op in ("and", "or", "sub", "xor")}

    def on(g, p):
        return _on_any_line(p, g.lines) or p in g.points

    for px2 in range(0, 2 * 24 + 1):  # half-integer samples
        p = (px2 / 2.0, float(y))
        in_a = xa <= p[0] <= xa + wa
        in_b = xb <= p[0] <= xb + wb
        assert on(res["or"], p) == (in_a or in_b), ("or", p)
        assert on(res["and"], p) == (in_a and in_b), ("and", p)
        # sub/xor drop only positive-length pieces; a boundary sample at
        # the cut can legitimately remain an endpoint of a kept piece,
        # so check strict-interior samples (odd px2) only
        if px2 % 2 == 1:
            assert on(res["sub"], p) == (in_a and not in_b), ("sub", p)
            assert on(res["xor"], p) == (in_a != in_b), ("xor", p)
