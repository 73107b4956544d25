"""Built-in extension functions (SURVEY §2.9): SPARQL custom-IRI functions
compiled to vectorized Column expressions — JVM trig/math, no Python in the
hot path. Users register their own via ``Engine.register_function`` (a
pandas_udf-returning callable slots in identically when JVM builtins can't
express the semantics).

The flagship is Haversine distance — the reference's own spatial idiom is
lat/lon arithmetic (``facilities.ttl:211-218``), and ``geof:distance``-style
point distance is the natural function form of it (SURVEY §2.7 geo row).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from dublin_smart_city_graphdb_spark.model.terms import XSD
from dublin_smart_city_graphdb_spark.sparql.termcol import (
    make_bool,
    make_numeric,
)

FN = "urn:spark-graft:fn:"

_EARTH_RADIUS_KM = 6371.0088


def haversine_km(args: list[Column]) -> Column:
    """fn:haversineKm(lat1, lon1, lat2, lon2) → great-circle km (double)."""
    lat1, lon1, lat2, lon2 = [a["num"].cast("double") for a in args]
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(phi1) * F.cos(phi2) * F.sin(dlmb / 2) * F.sin(dlmb / 2)
    )
    d = F.lit(2.0 * _EARTH_RADIUS_KM) * F.asin(F.sqrt(a))
    return make_numeric(d.cast("decimal(38,10)"), XSD + "double")


_WKT_POINT = r"^\s*POINT\s*\(\s*(-?[0-9.eE+]+)\s+(-?[0-9.eE+]+)\s*\)\s*$"


def _wkt_coord(args: list[Column], group: int) -> Column:
    """Extract a coordinate from a ``POINT(lon lat)`` wktLiteral (the
    reference's geometry encoding, facilities.ttl:161-171). Non-POINT or
    malformed input → empty extract → null cast → SPARQL error (row
    dropped in FILTER, unbound in BIND) — never a wrong number."""
    coord = F.regexp_extract(args[0]["lex"], _WKT_POINT, group)
    return make_numeric(
        F.when(coord != "", coord).cast("decimal(38,10)")
    )


def wkt_lon(args: list[Column]) -> Column:
    """fn:wktLon("POINT(lon lat)") → longitude as xsd:decimal."""
    return _wkt_coord(args, 1)


def wkt_lat(args: list[Column]) -> Column:
    """fn:wktLat("POINT(lon lat)") → latitude as xsd:decimal."""
    return _wkt_coord(args, 2)


GEOF = "http://www.opengis.net/def/function/geosparql/"

# all coordinate pairs inside any WKT geometry body: "lon lat"
_WKT_PAIR = r"(-?[0-9.eE+]+)\s+(-?[0-9.eE+]+)"


def _geom_lons(col: Column) -> Column:
    return F.transform(
        F.regexp_extract_all(col, F.lit(_WKT_PAIR), 1),
        lambda s: s.cast("double"),
    )


def _geom_lats(col: Column) -> Column:
    return F.transform(
        F.regexp_extract_all(col, F.lit(_WKT_PAIR), 2),
        lambda s: s.cast("double"),
    )


def wkt_within_bbox(args: list[Column]) -> Column:
    """fn:wktWithinBBox(wkt, minLon, minLat, maxLon, maxLat) → xsd:boolean.

    True iff the POINT wktLiteral lies inside the closed bounding box —
    the WKT-native form of the reference's own spatial idiom (a lat/lon
    range FILTER, facilities.ttl:211-218) applied to its ``geo:asWKT``
    POINT geometries (facilities.ttl:161-171). Pure JVM regexp + compare;
    malformed/non-POINT input → null → SPARQL error semantics (row drops
    in FILTER), never a wrong answer."""
    lon = F.regexp_extract(args[0]["lex"], _WKT_POINT, 1)
    lat = F.regexp_extract(args[0]["lex"], _WKT_POINT, 2)
    lon_d = F.when(lon != "", lon).cast("double")
    lat_d = F.when(lat != "", lat).cast("double")
    bounds = [a["num"].cast("double") for a in args[1:5]]
    inside = (
        (lon_d >= bounds[0])
        & (lat_d >= bounds[1])
        & (lon_d <= bounds[2])
        & (lat_d <= bounds[3])
    )
    return make_bool(inside)


# POLYGON body: everything inside the outermost parens — "(r1),(r2),..."
# where the first ring is the shell and the rest are holes
_WKT_POLY_BODY = r"^\s*POLYGON\s*\(\s*(.*\S)\s*\)\s*$"


def geof_sf_within(args: list[Column]) -> Column:
    """geof:sfWithin(geomA, geomB) → xsd:boolean — GeoSPARQL simple-features
    containment: geomA a POINT, geomB a POLYGON (general rings INCLUDING
    holes via ray-casting, r5 task 5) or any other geometry (tested
    against its bounding box).

    Three JVM-only paths, no UDF anywhere:
    - geomB a single-ring axis-aligned rectangle POLYGON (every vertex
      lon ∈ {min, max} and lat ∈ {min, max}): CLOSED bbox compare —
      exact, boundary inclusive, the reference's own spatial idiom
      (facilities.ttl:211-218) and bit-compatible with the r4 behavior.
    - geomB any other POLYGON: even-odd ray casting over ALL rings —
      each ring's edges are walked independently (no phantom edge
      between rings) and the crossing counts sum, so an odd total means
      inside the shell and outside every hole (XOR semantics; a point in
      a hole crosses shell once and hole once → even → outside). Points
      exactly ON a non-axis-aligned edge follow the even-odd tie-break.
    - non-POLYGON geomB: bounding box of all coordinate pairs (unchanged).
    Non-POINT geomA or empty geomB → null (SPARQL error → row drops)."""
    return make_bool(_point_in_geom(args[0]["lex"], args[1]["lex"]))


def _ring_crossings(ring: Column, x: Column, y: Column) -> Column:
    """Even-odd ray cast for one ring's coordinate list: the number of
    edges (i, i+1) that straddle the horizontal line through y with the
    crossing strictly left of x. Pure higher-order functions; a ring with
    <2 vertices contributes 0 (out-of-range F.get → null → filtered)."""
    xs = _geom_lons(ring)
    ys = _geom_lats(ring)
    idx = F.sequence(F.lit(0), F.greatest(F.size(xs) - 2, F.lit(0)))
    return F.size(
        F.filter(
            idx,
            lambda i: (
                ((F.get(ys, i) > y) != (F.get(ys, i + 1) > y))
                & (
                    x
                    < (F.get(xs, i + 1) - F.get(xs, i))
                    * (y - F.get(ys, i))
                    / (F.get(ys, i + 1) - F.get(ys, i))
                    + F.get(xs, i)
                )
            ),
        )
    )


def _point_in_geom(a_lex: Column, b_lex: Column) -> Column:
    """Nullable boolean: the POINT ``a_lex`` lies in geometry ``b_lex``
    (see geof_sf_within for path semantics)."""
    lon = F.regexp_extract(a_lex, _WKT_POINT, 1)
    lat = F.regexp_extract(a_lex, _WKT_POINT, 2)
    x = F.when(lon != "", lon).cast("double")
    y = F.when(lat != "", lat).cast("double")

    body = F.regexp_extract(b_lex, _WKT_POLY_BODY, 1)
    is_poly = body != ""
    # ring strings: strip the leading "(" / trailing ")" then split on
    # the ")...(" separators — first element is the shell, rest holes
    rings = F.split(
        F.regexp_replace(
            F.regexp_replace(body, r"^\s*\(", ""), r"\)\s*$", ""
        ),
        r"\)\s*,\s*\(",
    )
    src = F.when(is_poly, body).otherwise(b_lex)
    xs = _geom_lons(src)
    ys = _geom_lats(src)
    nonempty = F.size(xs) > 0

    xmin, xmax = F.array_min(xs), F.array_max(xs)
    ymin, ymax = F.array_min(ys), F.array_max(ys)
    bbox_inside = (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)

    is_rect = (
        F.forall(xs, lambda v: (v == xmin) | (v == xmax))
        & F.forall(ys, lambda v: (v == ymin) | (v == ymax))
        & (F.size(rings) <= 1)
    )

    # even-odd over ALL rings: per-ring crossings summed, odd = inside
    total = F.aggregate(
        rings, F.lit(0), lambda acc, r: acc + _ring_crossings(r, x, y)
    )
    ray_inside = total % 2 == 1

    inside = F.when(is_rect | ~is_poly, bbox_inside).otherwise(ray_inside)
    return F.when(nonempty, inside)


def _is_point(lex: Column) -> Column:
    return F.regexp_extract(lex, _WKT_POINT, 1) != ""


def _bbox_overlap(a_lex: Column, b_lex: Column) -> Column:
    """Nullable boolean: the bounding boxes of two geometries intersect
    (closed compare). Exact for axis-aligned rectangles, the standard
    coarse filter otherwise."""
    axs, ays = _geom_lons(a_lex), _geom_lats(a_lex)
    bxs, bys = _geom_lons(b_lex), _geom_lats(b_lex)
    nonempty = (F.size(axs) > 0) & (F.size(bxs) > 0)
    overlap = (
        (F.array_min(axs) <= F.array_max(bxs))
        & (F.array_min(bxs) <= F.array_max(axs))
        & (F.array_min(ays) <= F.array_max(bys))
        & (F.array_min(bys) <= F.array_max(ays))
    )
    return F.when(nonempty, overlap)


def geof_sf_contains(args: list[Column]) -> Column:
    """geof:sfContains(geomA, geomB) ≡ sfWithin(geomB, geomA) for the
    POINT-in-polygon shapes this engine evaluates exactly."""
    return make_bool(_point_in_geom(args[1]["lex"], args[0]["lex"]))


def _poly_rings(lex: Column) -> Column:
    """Ring coordinate strings of a POLYGON lex; empty array otherwise."""
    body = F.regexp_extract(lex, _WKT_POLY_BODY, 1)
    rings = F.split(
        F.regexp_replace(
            F.regexp_replace(body, r"^\s*\(", ""), r"\)\s*$", ""
        ),
        r"\)\s*,\s*\(",
    )
    return F.when(body != "", rings).otherwise(
        F.array().cast("array<string>")
    )


def _point_in_rings(rings: Column, x: Column, y: Column) -> Column:
    """Even-odd point-in-polygon over pre-split rings (holes included)."""
    total = F.aggregate(
        rings, F.lit(0), lambda acc, r: acc + _ring_crossings(r, x, y)
    )
    return total % 2 == 1


def _orient(px, py, qx, qy, rx, ry):
    """Signed area orientation of the triangle (P, Q, R)."""
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


def _rings_edges_cross(rings_a: Column, rings_b: Column) -> Column:
    """TRUE when any edge of any ring of A properly crosses any edge of
    any ring of B (strict orientation-sign test; pure touching follows
    the documented boundary tie-break). O(|A|·|B|) per geometry pair in
    one codegen'd expression — WKT vertex counts are small by
    construction, and the work is per-row, shuffle-free."""
    def ring_pair(ra: Column, rb: Column) -> Column:
        xa, ya = _geom_lons(ra), _geom_lats(ra)
        xb, yb = _geom_lons(rb), _geom_lats(rb)
        ia = F.sequence(F.lit(0), F.greatest(F.size(xa) - 2, F.lit(0)))
        ib = F.sequence(F.lit(0), F.greatest(F.size(xb) - 2, F.lit(0)))

        def edge_pair(i: Column, j: Column) -> Column:
            px, py = F.get(xa, i), F.get(ya, i)
            qx, qy = F.get(xa, i + 1), F.get(ya, i + 1)
            rx, ry = F.get(xb, j), F.get(yb, j)
            sx, sy = F.get(xb, j + 1), F.get(yb, j + 1)
            o1 = _orient(px, py, qx, qy, rx, ry)
            o2 = _orient(px, py, qx, qy, sx, sy)
            o3 = _orient(rx, ry, sx, sy, px, py)
            o4 = _orient(rx, ry, sx, sy, qx, qy)
            return (o1 * o2 < 0) & (o3 * o4 < 0)

        return F.exists(ia, lambda i: F.exists(ib, lambda j: edge_pair(i, j)))

    return F.exists(
        rings_a, lambda ra: F.exists(rings_b, lambda rb: ring_pair(ra, rb))
    )


def _poly_poly_intersects(a_lex: Column, b_lex: Column) -> Column:
    """Exact polygon-polygon intersection (round 6, closes the r5 'coarse
    bbox' gap): the filled regions meet iff an edge pair properly crosses
    OR one polygon's first vertex lies inside the other (covers full
    containment; the even-odd test over ALL rings makes a polygon nested
    inside the other's hole correctly disjoint)."""
    ra, rb = _poly_rings(a_lex), _poly_rings(b_lex)
    both = (F.size(ra) > 0) & (F.size(rb) > 0)
    ax0 = F.get(_geom_lons(F.get(ra, 0)), 0)
    ay0 = F.get(_geom_lats(F.get(ra, 0)), 0)
    bx0 = F.get(_geom_lons(F.get(rb, 0)), 0)
    by0 = F.get(_geom_lats(F.get(rb, 0)), 0)
    inter = (
        _rings_edges_cross(ra, rb)
        | _point_in_rings(ra, bx0, by0)
        | _point_in_rings(rb, ax0, ay0)
    )
    return F.when(both, inter)


def _intersects_col(a_lex: Column, b_lex: Column) -> Column:
    """Nullable boolean shared by sfIntersects and sfDisjoint: exact for
    point-vs-anything (ray cast) and polygon-vs-polygon (edge crossing +
    containment probes); the remaining non-point pairs (LINESTRING vs
    anything) keep the closed bounding-box overlap, documented coarse."""
    a_poly = F.size(_poly_rings(a_lex)) > 0
    b_poly = F.size(_poly_rings(b_lex)) > 0
    return (
        F.when(_is_point(a_lex), _point_in_geom(a_lex, b_lex))
        .when(_is_point(b_lex), _point_in_geom(b_lex, a_lex))
        .when(a_poly & b_poly, _poly_poly_intersects(a_lex, b_lex))
        .otherwise(_bbox_overlap(a_lex, b_lex))
    )


def geof_sf_intersects(args: list[Column]) -> Column:
    """geof:sfIntersects(geomA, geomB): exact for points and for
    polygon-polygon (see _intersects_col)."""
    return make_bool(_intersects_col(args[0]["lex"], args[1]["lex"]))


def geof_sf_disjoint(args: list[Column]) -> Column:
    """geof:sfDisjoint(geomA, geomB) = NOT sfIntersects — same exactness
    envelope as sfIntersects."""
    return make_bool(~_intersects_col(args[0]["lex"], args[1]["lex"]))


def default_extensions() -> dict:
    return {
        FN + "haversineKm": haversine_km,
        FN + "wktLon": wkt_lon,
        FN + "wktLat": wkt_lat,
        FN + "wktWithinBBox": wkt_within_bbox,
        GEOF + "sfWithin": geof_sf_within,
        GEOF + "sfContains": geof_sf_contains,
        GEOF + "sfIntersects": geof_sf_intersects,
        GEOF + "sfDisjoint": geof_sf_disjoint,
    }
