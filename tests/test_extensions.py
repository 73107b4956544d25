"""SPARQL extension-function registry (SURVEY §2.9): built-in Haversine and
user-registered functions, callable by IRI in FILTER/BIND."""

from __future__ import annotations

import math

import pytest

from dublin_smart_city_graphdb_spark.engine import Engine

TTL = """
@prefix ex: <http://x#> .
ex:spire ex:lat 53.3498 ; ex:lon -6.2603 .
ex:howth ex:lat 53.3873 ; ex:lon -6.0654 .
ex:bray  ex:lat 53.2009 ; ex:lon -6.1114 .
"""

P = "PREFIX ex: <http://x#>\nPREFIX fn: <urn:spark-graft:fn:>\n"


def _haversine_py(lat1, lon1, lat2, lon2):
    r = 6371.0088
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1)
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(a))


@pytest.fixture(scope="module")
def repo(spark):
    eng = Engine(spark)
    r = eng.create_repository("ext_fns", ruleset="none")
    r.load_turtle(TTL)
    return r


def test_haversine_builtin_extension(repo):
    # generous timeout: this asserts function semantics, not the 30s query
    # budget, and late in a full-suite run the shared JVM can be GC-bound
    rows = repo.sparql_collect(
        P + """SELECT ?place ?d WHERE {
            ?place ex:lat ?lat ; ex:lon ?lon .
            BIND(fn:haversineKm(53.3498, -6.2603, ?lat, ?lon) AS ?d)
        } ORDER BY ?d""",
        timeout=180,
    )
    got = {r_["place"].lex.split("#")[1]: float(r_["d"].lex) for r_ in rows}
    for name, (lat, lon) in {
        "spire": (53.3498, -6.2603),
        "howth": (53.3873, -6.0654),
        "bray": (53.2009, -6.1114),
    }.items():
        want = _haversine_py(53.3498, -6.2603, lat, lon)
        assert abs(got[name] - want) < 1e-6
    assert [r_["place"].lex for r_ in rows][0] == "http://x#spire"


def test_haversine_in_filter(repo):
    rows = repo.sparql_collect(
        P + """SELECT ?place WHERE {
            ?place ex:lat ?lat ; ex:lon ?lon .
            FILTER(fn:haversineKm(53.3498, -6.2603, ?lat, ?lon) < 15)
        }"""
    )
    got = {r_["place"].lex for r_ in rows}
    assert got == {"http://x#spire", "http://x#howth"}


def test_user_registered_function(spark):
    import pyspark.sql.functions as F

    from dublin_smart_city_graphdb_spark.sparql.termcol import make_string

    eng = Engine(spark)
    eng.register_function(
        "urn:me:shout", lambda args: make_string(F.upper(args[0]["lex"]))
    )
    r = eng.create_repository("ext_user", ruleset="none")
    r.load_turtle('@prefix ex: <http://x#> .\nex:a ex:name "dublin" .')
    rows = r.sparql_collect(
        "PREFIX ex: <http://x#> SELECT ?u WHERE "
        "{ ?s ex:name ?n . BIND(<urn:me:shout>(?n) AS ?u) }"
    )
    assert rows[0]["u"].lex == "DUBLIN"


def test_unknown_function_raises(repo):
    with pytest.raises(Exception, match="unsupported function"):
        repo.sparql(
            P + "SELECT ?d WHERE { ?p ex:lat ?lat . BIND(<urn:nope:fn>(?lat) AS ?d) }"
        )


def test_wkt_point_accessors(spark):
    """fn:wktLon/fn:wktLat pull coordinates out of the reference's
    POINT(lon lat) wktLiterals (facilities.ttl:161-171); malformed WKT is
    a SPARQL error (unbound), never a wrong number."""
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    r = eng.create_repository("ext_wkt", ruleset="none")
    r.load_turtle("""
        @prefix ex: <http://x#> .
        @prefix geo: <http://www.opengis.net/ont/geosparql#> .
        ex:g1 geo:asWKT "POINT(-6.2603 53.3498)"^^geo:wktLiteral .
        ex:g2 geo:asWKT "LINESTRING(0 0, 1 1)"^^geo:wktLiteral .
    """)
    rows = r.sparql_collect("""
        PREFIX geo: <http://www.opengis.net/ont/geosparql#>
        PREFIX fn: <urn:spark-graft:fn:>
        SELECT ?g ?lon ?lat WHERE {
          ?g geo:asWKT ?w .
          BIND(fn:wktLon(?w) AS ?lon) BIND(fn:wktLat(?w) AS ?lat)
        } ORDER BY ?g
    """)
    assert rows[0]["lon"].lex == "-6.2603" and rows[0]["lat"].lex == "53.3498"
    assert rows[1]["lon"] is None or rows[1]["lon"]["kind"] is None
    # composes with haversine: distance from the point to itself is 0
    rows2 = r.sparql_collect("""
        PREFIX geo: <http://www.opengis.net/ont/geosparql#>
        PREFIX fn: <urn:spark-graft:fn:>
        SELECT ?d WHERE {
          ?g geo:asWKT ?w . FILTER(ISLITERAL(?w) && STRSTARTS(STR(?w), "POINT"))
          BIND(fn:haversineKm(fn:wktLat(?w), fn:wktLon(?w),
                              fn:wktLat(?w), fn:wktLon(?w)) AS ?d)
        }
    """)
    assert float(rows2[0]["d"].lex) == 0.0


def test_sf_within_polygon_shapes(spark):
    """geof:sfWithin: ray-cast point-in-polygon for general rings,
    closed-bbox exactness for axis-aligned rectangles, bbox fallback for
    non-polygons (VERDICT r4 task 6)."""
    eng = Engine(spark)
    r = eng.create_repository("geo_poly", ruleset="none")
    r.load_turtle("""
    @prefix ex: <http://g#> .
    @prefix geo: <http://www.opengis.net/ont/geosparql#> .
    ex:inTri   geo:asWKT "POINT(1.0 1.0)"^^geo:wktLiteral .
    ex:concave geo:asWKT "POINT(4.9 2.5)"^^geo:wktLiteral .
    ex:edgeRect geo:asWKT "POINT(0.0 1.0)"^^geo:wktLiteral .
    ex:outside geo:asWKT "POINT(9.0 9.0)"^^geo:wktLiteral .
    """)

    def within(poly):
        got = r.sparql(f"""
            PREFIX geo: <http://www.opengis.net/ont/geosparql#>
            PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
            SELECT ?s WHERE {{
              ?s geo:asWKT ?w .
              FILTER(geof:sfWithin(?w, "{poly}"^^geo:wktLiteral))
            }} ORDER BY ?s
        """).collect()
        return [x[0]["lex"].rsplit("#", 1)[1] for x in got]

    # triangle (0,0)-(4,0)-(0,4): (1,1) strictly inside; (4.9,2.5) and
    # (9,9) outside; (0,1) lies ON the vertical edge x=0 — even-odd
    # counts the edge crossing at x=0 left-inclusive, point included here
    tri = "POLYGON((0 0, 4 0, 0 4, 0 0))"
    assert within(tri) == ["edgeRect", "inTri"]

    # concave "C" shape: bbox is [0,6]x[0,5]; (4.9,2.5) is inside the
    # bbox but inside the NOTCH — a bbox approximation would wrongly
    # include it, ray casting excludes it. (0,1) sits ON the left edge:
    # even-odd's tie-break includes it here (documented boundary
    # ambiguity for non-rectangles); (1,1) is strictly inside.
    concave = "POLYGON((0 0, 6 0, 6 1, 2 1, 2 4, 6 4, 6 5, 0 5, 0 0))"
    assert within(concave) == ["edgeRect", "inTri"]

    # axis-aligned rectangle: closed boundary (edge point included),
    # bit-compatible with the r4 bbox behavior
    rect = "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"
    assert within(rect) == ["edgeRect", "inTri"]

    # non-polygon geomB falls back to bbox of its coordinate pairs
    line = "LINESTRING(0 0, 2 2)"
    assert within(line) == ["edgeRect", "inTri"]

    # inner ring (hole, r5 task 5): big square with a hole covering
    # (0.5,0.5)-(1.5,1.5) — (1,1) now falls IN the hole and drops out;
    # (4.9,2.5) is in the shell away from the hole
    holed = ("POLYGON((0 0, 6 0, 6 5, 0 5, 0 0),"
             "(0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))")
    assert within(holed) == ["concave", "edgeRect"]
    eng.drop_repository("geo_poly")


def test_sf_contains_intersects_disjoint(spark):
    """The remaining simple-features predicates: sfContains (within
    swapped), sfIntersects (point exact / bbox coarse), sfDisjoint."""
    eng = Engine(spark)
    r = eng.create_repository("geo_sf", ruleset="none")
    r.load_turtle("""
    @prefix ex: <http://g#> .
    @prefix geo: <http://www.opengis.net/ont/geosparql#> .
    ex:p1 geo:asWKT "POINT(1 1)"^^geo:wktLiteral .
    ex:p2 geo:asWKT "POINT(9 9)"^^geo:wktLiteral .
    """)

    def ask(fn, a, b):
        got = r.sparql(f"""
            PREFIX geo: <http://www.opengis.net/ont/geosparql#>
            PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
            ASK {{ FILTER(geof:{fn}("{a}"^^geo:wktLiteral,
                                    "{b}"^^geo:wktLiteral)) }}
        """).collect()
        return got[0][0]

    tri = "POLYGON((0 0, 4 0, 0 4, 0 0))"
    assert ask("sfContains", tri, "POINT(1 1)") is True
    assert ask("sfContains", tri, "POINT(9 9)") is False
    assert ask("sfIntersects", "POINT(1 1)", tri) is True
    assert ask("sfIntersects", tri, "POINT(9 9)") is False
    # two rectangles: overlap vs apart
    r1 = "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"
    r2 = "POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))"
    r3 = "POLYGON((5 5, 6 5, 6 6, 5 6, 5 5))"
    assert ask("sfIntersects", r1, r2) is True
    assert ask("sfIntersects", r1, r3) is False
    assert ask("sfDisjoint", r1, r3) is True
    assert ask("sfDisjoint", r1, r2) is False

    # exact polygon-polygon (round 6): bbox-overlapping but geometrically
    # DISJOINT pair — a bbox approximation would wrongly intersect these
    tri_up = "POLYGON((0 0, 4 0, 4 4, 0 0))"      # below the diagonal
    tri_dn = "POLYGON((0 0.5, 3.5 4, 0 4, 0 0.5))"  # above the diagonal
    assert ask("sfIntersects", tri_up, tri_dn) is False
    assert ask("sfDisjoint", tri_up, tri_dn) is True
    # full containment without edge crossings
    inner = "POLYGON((1 0.25, 2 0.25, 2 0.75, 1 0.75, 1 0.25))"
    assert ask("sfIntersects", tri_up, inner) is True
    assert ask("sfIntersects", inner, tri_up) is True
    # a polygon nested inside the other's HOLE is disjoint
    holed = ("POLYGON((0 0, 6 0, 6 6, 0 6, 0 0),"
             "(2 2, 4 2, 4 4, 2 4, 2 2))")
    in_hole = "POLYGON((2.5 2.5, 3.5 2.5, 3.5 3.5, 2.5 3.5, 2.5 2.5))"
    assert ask("sfIntersects", holed, in_hole) is False
    assert ask("sfDisjoint", holed, in_hole) is True
    # crossing the hole boundary from inside it does intersect
    out_of_hole = "POLYGON((2.5 2.5, 5 2.5, 5 3.5, 2.5 3.5, 2.5 2.5))"
    assert ask("sfIntersects", holed, out_of_hole) is True
    eng.drop_repository("geo_sf")


def test_geof_distance(spark):
    """geof:distance (round 6): point-point great-circle, point-polygon
    via nearest-edge projection (0 inside), polygon-polygon via mutual
    vertex-edge sweep (0 when intersecting), OGC unit IRIs."""
    eng = Engine(spark)
    r = eng.create_repository("geo_dist", ruleset="none")
    r.load_turtle("""
    @prefix ex: <http://g#> .
    @prefix geo: <http://www.opengis.net/ont/geosparql#> .
    ex:o geo:asWKT "POINT(0 0)"^^geo:wktLiteral .
    """)
    uom = "http://www.opengis.net/def/uom/OGC/1.0/"

    def dist(a, b, unit=None):
        u = f', <{uom}{unit}>' if unit else ""
        got = r.sparql(f"""
            PREFIX geo: <http://www.opengis.net/ont/geosparql#>
            PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
            SELECT ?d WHERE {{
              BIND(geof:distance("{a}"^^geo:wktLiteral,
                                 "{b}"^^geo:wktLiteral{u}) AS ?d)
            }}
        """).collect()
        v = got[0][0]
        return float(v["lex"]) if v["lex"] is not None else None

    # 1 degree of longitude on the equator: pi/180 * R
    import math
    deg_m = math.pi / 180.0 * 6371.0088e3
    assert abs(dist("POINT(0 0)", "POINT(1 0)") - deg_m) < 1.0
    assert abs(dist("POINT(0 0)", "POINT(1 0)", "kilometre")
               - deg_m / 1000) < 1e-3
    assert abs(dist("POINT(0 0)", "POINT(1 0)", "degree") - 1.0) < 1e-9
    sq = "POLYGON((1 -0.5, 2 -0.5, 2 0.5, 1 0.5, 1 -0.5))"
    assert abs(dist("POINT(0 0)", sq) - deg_m) < 1.0     # to edge x=1
    assert dist("POINT(1.5 0)", sq) == 0.0               # inside
    assert dist(sq, sq) == 0.0                           # self-intersect
    sq2 = "POLYGON((3 -0.5, 4 -0.5, 4 0.5, 3 0.5, 3 -0.5))"
    d = dist(sq, sq2)                                    # gap of 1 degree
    assert abs(d - deg_m) < deg_m * 0.001
    eng.drop_repository("geo_dist")
