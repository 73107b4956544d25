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


def _let(cols: dict, body) -> Column:
    """Single-evaluation let binding for Column expressions. Column trees
    are trees, not DAGs: referencing a derived array N times embeds N
    copies of its whole subtree in the plan, and Catalyst analysis of the
    geo kernels was blowing up on exactly that (the point-to-polygon
    distance compiled in ~70 s). Packing the intermediates into a struct
    and routing them through a one-element ``transform`` makes every
    reference a lambda-variable field access — a leaf — so each heavy
    subtree appears exactly once. ``body`` receives the struct lambda
    variable."""
    packed = F.struct(*[c.alias(k) for k, c in cols.items()])
    return F.get(F.transform(F.array(packed), lambda s: body(s)), 0)


def _flat_ring_coords(rings: Column) -> tuple[Column, Column]:
    """Every ring's vertices flattened into ONE lon array and ONE lat
    array with a null separator after each ring. Any edge (i, i+1)
    spanning a ring boundary sees a null endpoint, its predicate/distance
    evaluates to null, and Spark's filter/exists/array_min all ignore
    null results — so one flat index sweep walks all rings' edges without
    nested per-ring lambdas. This keeps Catalyst's lambda-resolution cost
    LINEAR in the kernel: the earlier per-ring nesting (3-6 lambda
    levels) made plan analysis, not execution, the dominant cost of the
    geo predicates."""
    sep = F.array(F.lit(None).cast("double"))
    xs = F.flatten(
        F.transform(rings, lambda r: F.concat(_geom_lons(r), sep))
    )
    ys = F.flatten(
        F.transform(rings, lambda r: F.concat(_geom_lats(r), sep))
    )
    return xs, ys


def _edge_straddle_left(xs: Column, ys: Column, i, x: Column,
                        y: Column) -> Column:
    """Edge (i, i+1) straddles the horizontal through y with its crossing
    strictly left of x (null when the edge touches a ring separator)."""
    return (
        ((F.get(ys, i) > y) != (F.get(ys, i + 1) > y))
        & (
            x
            < (F.get(xs, i + 1) - F.get(xs, i))
            * (y - F.get(ys, i))
            / (F.get(ys, i + 1) - F.get(ys, i))
            + F.get(xs, i)
        )
    )


def _crossings_flat(xs: Column, ys: Column, x: Column,
                    y: Column) -> Column:
    """Ray-cast crossing count over flat coordinate arrays. Callers MUST
    pass leaf columns (lambda-variable fields from `_let`) — see _let."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(xs) - 2, F.lit(0)))
    return F.size(
        F.filter(idx, lambda i: _edge_straddle_left(xs, ys, i, x, y))
    )


def _point_in_geom(a_lex: Column, b_lex: Column) -> Column:
    """Nullable boolean: the POINT ``a_lex`` lies in geometry ``b_lex``
    (see geof_sf_within for path semantics). All derived arrays bind once
    through `_let` so the plan stays linear in the kernel size."""
    lon = F.regexp_extract(a_lex, _WKT_POINT, 1)
    lat = F.regexp_extract(a_lex, _WKT_POINT, 2)
    x = F.when(lon != "", lon).cast("double")
    y = F.when(lat != "", lat).cast("double")

    body = F.regexp_extract(b_lex, _WKT_POLY_BODY, 1)
    is_poly = body != ""
    rings = _poly_rings(b_lex)
    src = F.when(is_poly, body).otherwise(b_lex)
    fxs, fys = _flat_ring_coords(rings)

    def k(s) -> Column:
        xs, ys = s["xs"], s["ys"]
        xv, yv = s["x"], s["y"]
        nonempty = F.size(xs) > 0
        xmin, xmax = F.array_min(xs), F.array_max(xs)
        ymin, ymax = F.array_min(ys), F.array_max(ys)
        bbox_inside = (
            (xv >= xmin) & (xv <= xmax) & (yv >= ymin) & (yv <= ymax)
        )
        is_rect = (
            F.forall(xs, lambda v: (v == xmin) | (v == xmax))
            & F.forall(ys, lambda v: (v == ymin) | (v == ymax))
            & (s["nr"] <= 1)
        )
        ray_inside = (
            _crossings_flat(s["fxs"], s["fys"], xv, yv) % 2 == 1
        )
        inside = F.when(
            is_rect | ~s["poly"], bbox_inside
        ).otherwise(ray_inside)
        return F.when(nonempty, inside)

    return _let(
        {"x": x, "y": y, "xs": _geom_lons(src), "ys": _geom_lats(src),
         "fxs": fxs, "fys": fys, "nr": F.size(rings), "poly": is_poly},
        k,
    )


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
    """Even-odd point-in-polygon over pre-split rings (holes included),
    one flat index sweep bound through `_let`."""
    xs, ys = _flat_ring_coords(rings)
    return _let(
        {"xs": xs, "ys": ys, "x": x, "y": y},
        lambda s: _crossings_flat(s["xs"], s["ys"], s["x"], s["y"]) % 2 == 1,
    )


def _orient(px, py, qx, qy, rx, ry):
    """Signed area orientation of the triangle (P, Q, R)."""
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


def _edges_cross_flat(xa: Column, ya: Column, xb: Column,
                      yb: Column) -> Column:
    """TRUE when any edge of A properly crosses any edge of B over flat
    coordinate arrays (strict orientation-sign test; pure touching
    follows the documented boundary tie-break; ring-separator edges
    null-poison and never count). O(|A|·|B|) per geometry pair in one
    codegen'd expression. Callers pass leaf columns (see _let)."""
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
        # coalesce: a separator edge gives a NULL predicate, and exists()
        # is three-valued — without this a disjoint pair returns NULL,
        # not false
        return F.coalesce((o1 * o2 < 0) & (o3 * o4 < 0), F.lit(False))

    return F.exists(ia, lambda i: F.exists(ib, lambda j: edge_pair(i, j)))


def _poly_intersects_flat(s) -> Column:
    """Polygon-polygon intersection over the bound flat arrays {xa, ya,
    xb, yb}: an edge pair properly crosses OR one polygon's first vertex
    lies inside the other (covers full containment; the even-odd test
    over ALL rings makes a polygon nested inside the other's hole
    correctly disjoint)."""
    xa, ya, xb, yb = s["xa"], s["ya"], s["xb"], s["yb"]
    ax0, ay0 = F.get(xa, 0), F.get(ya, 0)
    bx0, by0 = F.get(xb, 0), F.get(yb, 0)
    return (
        _edges_cross_flat(xa, ya, xb, yb)
        | (_crossings_flat(xa, ya, bx0, by0) % 2 == 1)
        | (_crossings_flat(xb, yb, ax0, ay0) % 2 == 1)
    )


def _poly_poly_intersects(a_lex: Column, b_lex: Column) -> Column:
    """Exact polygon-polygon intersection (round 6, closes the r5 'coarse
    bbox' gap) — see _poly_intersects_flat."""
    ra, rb = _poly_rings(a_lex), _poly_rings(b_lex)
    both = (F.size(ra) > 0) & (F.size(rb) > 0)
    fxa, fya = _flat_ring_coords(ra)
    fxb, fyb = _flat_ring_coords(rb)
    return F.when(both, _let(
        {"xa": fxa, "ya": fya, "xb": fxb, "yb": fyb},
        _poly_intersects_flat,
    ))


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


_UOM = "http://www.opengis.net/def/uom/OGC/1.0/"
_EARTH_RADIUS_M = _EARTH_RADIUS_KM * 1000.0


def _pt_xy(lex: Column) -> tuple[Column, Column]:
    lon = F.regexp_extract(lex, _WKT_POINT, 1)
    lat = F.regexp_extract(lex, _WKT_POINT, 2)
    return (F.when(lon != "", lon).cast("double"),
            F.when(lat != "", lat).cast("double"))


def _haversine_m(x1, y1, x2, y2) -> Column:
    phi1, phi2 = F.radians(y1), F.radians(y2)
    dphi = F.radians(y2 - y1)
    dlmb = F.radians(x2 - x1)
    a = (F.sin(dphi / 2) * F.sin(dphi / 2)
         + F.cos(phi1) * F.cos(phi2) * F.sin(dlmb / 2) * F.sin(dlmb / 2))
    return F.lit(2.0 * _EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def _pt_seg_deg(xs: Column, ys: Column, i, x: Column, y: Column,
                coslat: Column) -> Column:
    """Projected-degree distance from (x, y) to edge (i, i+1) of the flat
    coordinate arrays, in a local equirectangular projection centered on
    the point (lon scaled by cos(lat) — the standard small-extent
    approximation). Null when the edge touches a ring separator."""
    ax = (F.get(xs, i) - x) * coslat
    ay = F.get(ys, i) - y
    bx = (F.get(xs, i + 1) - x) * coslat
    by = F.get(ys, i + 1) - y
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t = F.when(len2 > 0, -(ax * dx + ay * dy) / len2).otherwise(F.lit(0.0))
    t = F.greatest(F.lit(0.0), F.least(F.lit(1.0), t))
    cx, cy = ax + t * dx, ay + t * dy
    return F.sqrt(cx * cx + cy * cy)


def _min_edge_deg_flat(xs: Column, ys: Column, x: Column,
                       y: Column) -> Column:
    """Projected-degree distance from a point to the nearest edge of the
    flat arrays (array_min skips the null separator edges). Callers pass
    leaf columns (see _let)."""
    coslat = F.cos(F.radians(y))
    idx = F.sequence(F.lit(0), F.greatest(F.size(xs) - 2, F.lit(0)))
    return F.array_min(F.transform(
        idx, lambda i: _pt_seg_deg(xs, ys, i, x, y, coslat)
    ))


def _min_vert_edge_deg_flat(xf: Column, yf: Column, xt: Column,
                            yt: Column) -> Column:
    """Minimum projected-degree distance from any vertex of the first
    flat arrays to any edge of the second (separator nulls skip)."""
    iv = F.sequence(F.lit(0), F.greatest(F.size(xf) - 1, F.lit(0)))
    ie = F.sequence(F.lit(0), F.greatest(F.size(xt) - 2, F.lit(0)))
    return F.array_min(F.transform(
        iv, lambda i: F.array_min(F.transform(
            ie, lambda j: _pt_seg_deg(
                xt, yt, j, F.get(xf, i), F.get(yf, i),
                F.cos(F.radians(F.get(yf, i))),
            )
        ))
    ))


def geof_distance(args: list[Column]) -> Column:
    """geof:distance(geomA, geomB [, unit]) → xsd:double (round 6).

    point-point: exact great-circle Haversine. point-polygon (either
    order): 0 when the point is inside (even-odd over all rings), else
    the distance to the nearest ring edge via a local equirectangular
    projection (small-extent approximation, documented). polygon-polygon:
    0 when they intersect, else the minimum over both vertex-to-other's-
    edges directions. Unit IRIs: OGC metre (default), kilometre, degree
    (central angle), radian. Unknown geometry/unit → null → SPARQL
    error semantics."""
    import math as _math

    a_lex, b_lex = args[0]["lex"], args[1]["lex"]
    ax, ay = _pt_xy(a_lex)
    bx, by = _pt_xy(b_lex)
    ra, rb = _poly_rings(a_lex), _poly_rings(b_lex)
    fxa, fya = _flat_ring_coords(ra)
    fxb, fyb = _flat_ring_coords(rb)
    deg_scale = F.lit(_math.pi / 180.0 * _EARTH_RADIUS_M)

    def k(s) -> Column:
        pax, pay, pbx, pby = s["pax"], s["pay"], s["pbx"], s["pby"]
        xa, ya, xb, yb = s["xa"], s["ya"], s["xb"], s["yb"]
        a_pt, b_pt = pax.isNotNull(), pbx.isNotNull()
        a_poly, b_poly = s["na"] > 0, s["nb"] > 0

        def pt_poly(x, y, xs, ys) -> Column:
            inside = _crossings_flat(xs, ys, x, y) % 2 == 1
            return F.when(inside, F.lit(0.0)).otherwise(
                _min_edge_deg_flat(xs, ys, x, y) * deg_scale
            )

        poly_poly = F.when(
            _poly_intersects_flat(s), F.lit(0.0)
        ).otherwise(
            F.least(
                _min_vert_edge_deg_flat(xa, ya, xb, yb),
                _min_vert_edge_deg_flat(xb, yb, xa, ya),
            ) * deg_scale
        )
        return (
            F.when(a_pt & b_pt, _haversine_m(pax, pay, pbx, pby))
            .when(a_pt & b_poly, pt_poly(pax, pay, xb, yb))
            .when(b_pt & a_poly, pt_poly(pbx, pby, xa, ya))
            .when(a_poly & b_poly, poly_poly)
        )

    meters = _let(
        {"pax": ax, "pay": ay, "pbx": bx, "pby": by,
         "xa": fxa, "ya": fya, "xb": fxb, "yb": fyb,
         "na": F.size(ra), "nb": F.size(rb)},
        k,
    )
    if len(args) >= 3:
        unit = args[2]["lex"]
        import math as _math

        meters = (
            F.when(unit == _UOM + "metre", meters)
            .when(unit == _UOM + "kilometre", meters / 1000.0)
            .when(unit == _UOM + "degree",
                  meters / F.lit(_math.pi / 180.0 * _EARTH_RADIUS_M))
            .when(unit == _UOM + "radian",
                  meters / F.lit(_EARTH_RADIUS_M))
        )
    return make_numeric(meters.cast("decimal(38,10)"), XSD + "double")


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
        GEOF + "distance": geof_distance,
    }
