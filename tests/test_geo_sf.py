"""Simple-features completion (round 6): sfEquals / sfTouches /
sfOverlaps / sfCrosses plus the geometry constructors envelope /
boundary / buffer / getSRID.

Fixtures are hand-verifiable shapes (axis-aligned and rotated squares,
triangles, a holed polygon); every expectation below was derived from
the DE-9IM definitions, not from the engine. GraphDB exposes the same
predicates through its GeoSPARQL plugin (reference selects the engine
wholesale at Dockerfile:2); geometry semantics are the public OGC
simple-features ones.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from dublin_smart_city_graphdb_spark.sparql.extensions import (
    geof_boundary,
    geof_buffer,
    geof_envelope,
    geof_get_srid,
    geof_sf_crosses,
    geof_sf_equals,
    geof_sf_overlaps,
    geof_sf_touches,
    geof_sf_within,
)

SQ = "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"
SQ_ROT = "POLYGON((2 2, 0 2, 0 0, 2 0, 2 2))"
SQ_REV = "POLYGON((0 0, 0 2, 2 2, 2 0, 0 0))"
SQ_EDGE = "POLYGON((2 0, 4 0, 4 2, 2 2, 2 0))"
SQ_OVER = "POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))"
SQ_FAR = "POLYGON((5 5, 6 5, 6 6, 5 6, 5 5))"
SQ_IN = "POLYGON((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))"
SQ_CORNER = "POLYGON((2 2, 3 2, 3 3, 2 3, 2 2))"
TRI = "POLYGON((0 0, 4 0, 0 4, 0 0))"
TRI_RR = "POLYGON((0 4, 4 0, 0 0, 0 4))"
HOLED = "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
IN_HOLE = "POLYGON((1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))"
LINE_THROUGH = "LINESTRING(-1 1, 3 1)"
LINE_INSIDE = "LINESTRING(0.5 0.5, 1.5 1.5)"
LINE_OUTSIDE = "LINESTRING(5 5, 6 6)"
LINE_VERT = "LINESTRING(1 -1, 1 3)"


def _term(lex, num=None):
    return F.struct(
        F.lit(2).cast("tinyint").alias("kind"),
        F.lit(lex).cast("string").alias("lex"),
        F.lit(None).cast("string").alias("dtype"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(num).cast("decimal(38,10)").alias("num"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("boolean").alias("bool"),
    )


@pytest.fixture(scope="module")
def geo_eval(spark):
    one = spark.range(1)

    def run(fn, *wkts, num=None):
        args = [_term(w) for w in wkts]
        if num is not None:
            args.append(_term(str(num), num=num))
        row = one.select(fn(args).alias("r")).collect()[0]["r"]
        if row is None or row["kind"] is None:
            return None
        return row["lex"]

    return run


EQUALS_CASES = [
    (SQ, SQ, "true"),
    (SQ, SQ_ROT, "true"),       # same ring, rotated start vertex
    (SQ, SQ_REV, "true"),       # same ring, opposite direction
    (TRI, TRI_RR, "true"),      # rotated AND reversed
    (SQ, SQ_EDGE, "false"),
    (SQ, SQ_IN, "false"),
    ("POINT(1 1)", "POINT(1.0 1)", "true"),   # numeric, not lexical
    ("POINT(1 1)", "POINT(2 1)", "false"),
    ("POINT(1 1)", SQ, "false"),
]


@pytest.mark.parametrize("a,b,want", EQUALS_CASES)
def test_sf_equals(geo_eval, a, b, want):
    assert geo_eval(geof_sf_equals, a, b) == want
    assert geo_eval(geof_sf_equals, b, a) == want  # symmetric


TOUCHES_CASES = [
    (SQ, SQ_EDGE, "true"),      # shared edge
    (SQ, SQ_CORNER, "true"),    # shared corner only
    (SQ, SQ_OVER, "false"),     # interiors overlap
    (SQ, SQ_FAR, "false"),      # disjoint
    (SQ, SQ_IN, "false"),       # containment is not touching
    (SQ, SQ, "false"),          # equal polygons share interiors
    ("POINT(1 0)", SQ, "true"),   # point ON the boundary
    ("POINT(1 1)", SQ, "false"),  # interior point
    ("POINT(9 9)", SQ, "false"),
    ("POINT(1 1)", "POINT(1 1)", "false"),  # points have no boundary
]


@pytest.mark.parametrize("a,b,want", TOUCHES_CASES)
def test_sf_touches(geo_eval, a, b, want):
    assert geo_eval(geof_sf_touches, a, b) == want
    assert geo_eval(geof_sf_touches, b, a) == want


OVERLAPS_CASES = [
    (SQ, SQ_OVER, "true"),
    (SQ, SQ_EDGE, "false"),     # boundary contact only
    (SQ, SQ_IN, "false"),       # containment
    (SQ, SQ, "false"),          # equality
    (SQ, SQ_FAR, "false"),
    (HOLED, IN_HOLE, "false"),  # nested in the other's hole: disjoint
    ("POINT(1 1)", SQ, "false"),  # mixed dimensions never overlap
    ("POINT(1 1)", "POINT(1 1)", "false"),
]


@pytest.mark.parametrize("a,b,want", OVERLAPS_CASES)
def test_sf_overlaps(geo_eval, a, b, want):
    assert geo_eval(geof_sf_overlaps, a, b) == want
    assert geo_eval(geof_sf_overlaps, b, a) == want


CROSSES_CASES = [
    (LINE_THROUGH, SQ, "true"),   # enters and leaves
    (SQ, LINE_THROUGH, "true"),   # either argument order
    (LINE_INSIDE, SQ, "false"),   # fully interior
    (LINE_OUTSIDE, SQ, "false"),
    (LINE_THROUGH, LINE_VERT, "true"),   # proper line-line crossing
    (LINE_THROUGH, LINE_OUTSIDE, "false"),
    (SQ, SQ_OVER, "false"),       # same dimension: never crosses
    ("POINT(1 1)", SQ, "false"),
]


@pytest.mark.parametrize("a,b,want", CROSSES_CASES)
def test_sf_crosses(geo_eval, a, b, want):
    assert geo_eval(geof_sf_crosses, a, b) == want


def test_envelope_is_bbox(geo_eval):
    assert geo_eval(geof_envelope, TRI) == (
        "POLYGON((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))"
    )
    # degenerate (a point) still closes into valid WKT
    assert "POLYGON((3.0 4.0" in geo_eval(geof_envelope, "POINT(3 4)")


def test_envelope_contains_every_vertex(geo_eval, spark):
    env = geo_eval(geof_envelope, HOLED)
    one = spark.range(1)
    for x, y in [(0, 0), (4, 4), (1, 1), (3, 3), (2, 2)]:
        row = one.select(
            geof_sf_within([_term(f"POINT({x} {y})"), _term(env)]).alias("r")
        ).collect()[0]["r"]
        assert row["lex"] == "true", (x, y)


def test_boundary(geo_eval):
    assert geo_eval(geof_boundary, HOLED) == (
        "MULTILINESTRING((0 0, 4 0, 4 4, 0 4, 0 0), "
        "(1 1, 3 1, 3 3, 1 3, 1 1))"
    )
    assert geo_eval(geof_boundary, "POINT(1 2)") == (
        "GEOMETRYCOLLECTION EMPTY"
    )


def test_get_srid(geo_eval):
    assert geo_eval(geof_get_srid, SQ) == (
        "http://www.opengis.net/def/crs/OGC/1.3/CRS84"
    )
    assert geo_eval(
        geof_get_srid,
        "<http://www.opengis.net/def/crs/EPSG/0/4326> POINT(1 2)",
    ) == "http://www.opengis.net/def/crs/EPSG/0/4326"


def test_buffer_circle_geometry(geo_eval):
    """Every buffer vertex sits ~radius meters from the center (within
    the documented equirectangular approximation), and the polygon ring
    closes exactly."""
    cx, cy, r = -6.26, 53.35, 1000.0
    wkt = geo_eval(geof_buffer, f"POINT({cx} {cy})", num=r)
    assert wkt.startswith("POLYGON((") and wkt.endswith("))")
    pts = [tuple(map(float, p.split())) for p in
           wkt[len("POLYGON(("):-2].split(", ")]
    assert len(pts) == 33 and pts[0] == pts[-1]
    for x, y in pts[:-1]:
        # haversine
        phi1, phi2 = math.radians(cy), math.radians(y)
        a = (math.sin((phi2 - phi1) / 2) ** 2
             + math.cos(phi1) * math.cos(phi2)
             * math.sin(math.radians(x - cx) / 2) ** 2)
        d = 2 * 6371008.8 * math.asin(math.sqrt(a))
        assert abs(d - r) < r * 0.01, (x, y, d)


def test_buffer_non_point_general_path(geo_eval, spark):
    """r8b: non-point buffers route to the capsule-union kernel (the
    former point-only stub); bad radius is still an error."""
    one = spark.range(1)
    wkt = geo_eval(geof_buffer, SQ, num=100.0)
    assert wkt.startswith("POLYGON((")
    # the original square is covered by its buffer
    row = one.select(
        geof_sf_within([_term("POINT(1 1)"), _term(wkt)]).alias("r")
    ).collect()[0]["r"]
    assert row["lex"] == "true"
    assert geo_eval(geof_buffer, "LINESTRING(0 0, 1 1)", num=0.0) is None


# -- Egenhofer / RCC8 families (round-6 session 3) --------------------------

BIG = "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"

EH_CASES = [
    # strictly interior square: non-tangential proper part
    ("ehInside", SQ_IN, SQ, "true"),
    ("ehInside", SQ, BIG, "false"),       # SQ touches BIG's boundary
    ("ehInside", SQ, SQ, "false"),        # equals is not a proper part
    ("ehInside", "POINT(1 1)", SQ, "true"),
    ("ehInside", "POINT(0 1)", SQ, "false"),  # on the boundary
    ("ehContains", SQ, SQ_IN, "true"),
    ("ehContains", SQ_IN, SQ, "false"),
    # boundary-touching containment: tangential proper part
    ("ehCoveredBy", SQ, BIG, "true"),
    ("ehCoveredBy", SQ_IN, SQ, "false"),  # no boundary contact
    ("ehCoveredBy", SQ, SQ, "false"),     # equal is not covered-by
    ("ehCovers", BIG, SQ, "true"),
    ("ehCovers", SQ, BIG, "false"),
]


@pytest.mark.parametrize("fn_name,a,b,want", EH_CASES)
def test_egenhofer_containment_family(geo_eval, fn_name, a, b, want):
    from dublin_smart_city_graphdb_spark.sparql import extensions as X

    fn = {
        "ehInside": X.geof_eh_inside,
        "ehContains": X.geof_eh_contains,
        "ehCoveredBy": X.geof_eh_covered_by,
        "ehCovers": X.geof_eh_covers,
    }[fn_name]
    assert geo_eval(fn, a, b) == want


def test_rcc8_aliases_registered(spark):
    """All 16 Egenhofer/RCC8 IRIs resolve in the default registry and the
    delegating ones share the simple-features kernels."""
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        GEOF, default_extensions, geof_sf_equals, geof_sf_touches,
    )

    ext = default_extensions()
    for name in ("ehEquals", "ehDisjoint", "ehMeet", "ehOverlap",
                 "ehInside", "ehContains", "ehCoveredBy", "ehCovers",
                 "rcc8eq", "rcc8dc", "rcc8ec", "rcc8po",
                 "rcc8ntpp", "rcc8ntppi", "rcc8tpp", "rcc8tppi"):
        assert GEOF + name in ext, name
    # delegating aliases share the simple-features kernels — since r8
    # every boolean predicate is wrapped with OGC empty-geometry
    # semantics (and since r12 the wrappers compose the RAW boolean
    # kernels so EBV extraction sees one kernel instance), so compare
    # the raw kernels through the wrapper's closure
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        _b_sf_equals, _b_sf_touches,
    )

    def raw_of(wrapped):
        cells = [c.cell_contents for c in wrapped.__closure__]
        return [c for c in cells if callable(c)][0]

    assert raw_of(ext[GEOF + "rcc8eq"]) is _b_sf_equals
    assert raw_of(ext[GEOF + "ehMeet"]) is _b_sf_touches
    assert _b_sf_equals is not _b_sf_touches and geof_sf_equals \
        and geof_sf_touches


# -- round-7: MULTI* WKT geometries ---------------------------------------

from dublin_smart_city_graphdb_spark.sparql.extensions import (  # noqa: E402
    geof_distance,
    geof_sf_contains,
    geof_sf_disjoint,
    geof_sf_intersects,
)

MPOLY = "MULTIPOLYGON(((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"
MPOLY_HOLED = ("MULTIPOLYGON(((0 0, 4 0, 4 4, 0 4, 0 0), "
               "(1 1, 3 1, 3 3, 1 3, 1 1)), ((10 10, 11 10, 11 11, 10 11, 10 10)))")
MPOINT = "MULTIPOINT((1 1), (6 6))"
MPOINT_BARE = "MULTIPOINT(1 1, 6 6)"
MPOINT_OUT = "MULTIPOINT((1 1), (9 9))"
MLINE = "MULTILINESTRING((-1 1, 3 1), (9 9, 10 10))"


MULTI_WITHIN_CASES = [
    # point in either member of a multipolygon
    ("POINT(1 1)", MPOLY, "true"),
    ("POINT(6 6)", MPOLY, "true"),
    ("POINT(3 3)", MPOLY, "false"),      # between members
    ("POINT(2 2)", MPOLY_HOLED, "false"),  # in the first member's hole
    ("POINT(0.5 0.5)", MPOLY_HOLED, "true"),
    ("POINT(10.5 10.5)", MPOLY_HOLED, "true"),
    # MULTIPOINT within: ALL members must be inside
    (MPOINT, MPOLY, "true"),
    (MPOINT_BARE, MPOLY, "true"),        # bare-member WKT form
    (MPOINT_OUT, MPOLY, "false"),
    (MPOINT, SQ, "false"),               # (6 6) outside the square
]


@pytest.mark.parametrize("a,b,want", MULTI_WITHIN_CASES)
def test_multi_within(geo_eval, a, b, want):
    assert geo_eval(geof_sf_within, a, b) == want


def test_multi_contains_and_intersects(geo_eval):
    # sfContains mirrors within
    assert geo_eval(geof_sf_contains, MPOLY, "POINT(6 6)") == "true"
    assert geo_eval(geof_sf_contains, MPOLY, MPOINT) == "true"
    assert geo_eval(geof_sf_contains, MPOLY, MPOINT_OUT) == "false"
    # MULTIPOINT intersects: ANY member suffices
    assert geo_eval(geof_sf_intersects, MPOINT_OUT, MPOLY) == "true"
    assert geo_eval(geof_sf_intersects, MPOLY, MPOINT_OUT) == "true"
    assert geo_eval(geof_sf_disjoint, MPOINT_OUT, MPOLY) == "false"
    assert geo_eval(
        geof_sf_intersects, "MULTIPOINT((3 3), (9 9))", MPOLY
    ) == "false"
    assert geo_eval(
        geof_sf_disjoint, "MULTIPOINT((3 3), (9 9))", MPOLY
    ) == "true"
    # multipolygon-polygon: the SECOND member overlaps (any-vertex probe)
    assert geo_eval(geof_sf_intersects, MPOLY,
                    "POLYGON((6 6, 8 6, 8 8, 6 8, 6 6))") == "true"
    assert geo_eval(geof_sf_intersects, MPOLY, SQ_FAR) == "true"  # 5..6 box
    assert geo_eval(geof_sf_intersects, MPOLY,
                    "POLYGON((3 3, 4 3, 4 4, 3 4, 3 3))") == "false"
    # a polygon fully inside a member (no edge crossings)
    assert geo_eval(geof_sf_intersects, MPOLY,
                    "POLYGON((5.5 5.5, 6.5 5.5, 6.5 6.5, 5.5 6.5, 5.5 5.5))"
                    ) == "true"


def test_multi_equals_and_boundary_roundtrip(geo_eval):
    # member order / ring rotation insensitive
    mp_reordered = ("MULTIPOLYGON(((5 5, 7 5, 7 7, 5 7, 5 5)), "
                    "((2 2, 0 2, 0 0, 2 0, 2 2)))")
    assert geo_eval(geof_sf_equals, MPOLY, mp_reordered) == "true"
    assert geo_eval(geof_sf_equals, MPOLY, MPOLY_HOLED) == "false"
    # geof:boundary of a MULTIPOLYGON emits every member's rings, and its
    # MULTILINESTRING output is consumable by sfCrosses (the r6 verdict's
    # self-consistency gap)
    b = geo_eval(geof_boundary, MPOLY)
    assert b.startswith("MULTILINESTRING(")
    assert b.count("(") == 3  # head + 2 rings
    assert geo_eval(geof_sf_crosses, MLINE, SQ) == "true"
    assert geo_eval(geof_sf_crosses, "MULTILINESTRING((9 9, 10 10))",
                    SQ) == "false"
    # boundary itself never CROSSES its own polygon (no interior vertex)
    assert geo_eval(geof_sf_crosses, b, MPOLY) == "false"


def test_multi_distance(geo_eval):
    """Distance to a MULTIPOLYGON is the min over members; inside any
    member → 0."""
    d_in = float(geo_eval(geof_distance, "POINT(6 6)", MPOLY))
    assert d_in == 0.0
    # point (3, 1): 1 degree east of member-1's edge x=2; ~111 km
    d_gap = float(geo_eval(geof_distance, "POINT(3 1)", MPOLY))
    assert 100_000 < d_gap < 120_000


def test_scientific_notation_coordinates(geo_eval):
    """r8: the WKT float regexes accept exponent notation — the old
    character-class pattern silently truncated negative exponents
    ("1e-5" matched as "1e" → null cast → dropped row)."""
    box = "POLYGON((0 0, 1e-3 0, 1e-3 1e-3, 0 1e-3, 0 0))"
    assert geo_eval(geof_sf_within, "POINT(1e-5 2.5e-4)", box) == "true"
    assert geo_eval(geof_sf_within, "POINT(5e-3 5e-3)", box) == "false"
    # Spark's own E-notation output round-trips through the kernels
    env = geo_eval(geof_envelope, "LINESTRING(1e-5 0, 2e-5 1e-5)")
    assert geo_eval(geof_sf_within, "POINT(1.5e-5 5e-6)", env) == "true"
