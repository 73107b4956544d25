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

import pandas as pd
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


# proper float pattern: the old character-class form ([0-9.eE+]+)
# silently truncated negative exponents ("1e-5" matched as "1e")
_WKT_NUM = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
_WKT_POINT = rf"^\s*POINT\s*\(\s*({_WKT_NUM})\s+({_WKT_NUM})\s*\)\s*$"


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
_WKT_PAIR = rf"({_WKT_NUM})\s+({_WKT_NUM})"


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
# Polygonal body: POLYGON or MULTIPOLYGON (round 7). A MULTIPOLYGON's
# members flatten into ONE ring set: valid multipolygon members are
# interior-disjoint, so the even-odd crossing count over ALL rings gives
# union containment exactly (inside exactly one member ⇒ odd), and the
# flat-array edge sweeps see every member's edges. Overlapping members
# (invalid WKT) are outside the exactness envelope, documented.
_WKT_POLYGONAL_BODY = r"^\s*(?:MULTI)?POLYGON\s*\(\s*(.*\S)\s*\)\s*$"
# MULTIPOINT head (members parenthesized or bare per WKT)
_WKT_MPOINT_HEAD = r"^\s*MULTIPOINT\s*\("
# GEOMETRYCOLLECTION member list (non-empty form)
_WKT_GC_BODY = r"^\s*GEOMETRYCOLLECTION\s*\(\s*(.*\S)\s*\)\s*$"
# the empty geometry, any head type ("GEOMETRYCOLLECTION EMPTY",
# "POLYGON EMPTY", ...) with an optional CRS IRI prefix
_WKT_EMPTY = r"(?i)^\s*(?:<[^>]*>\s*)?[A-Z]+\s+EMPTY\s*$"


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


def _point_in_geom(a_lex: Column, b_lex: Column,
                   all_members: bool = True) -> Column:
    """Nullable boolean: the POINT (or MULTIPOINT, round 7) ``a_lex``
    lies in geometry ``b_lex`` (see geof_sf_within for path semantics).
    MULTIPOINT semantics follow ``all_members``: every member inside
    (sfWithin/sfContains) or any member inside (sfIntersects). All
    derived arrays bind once through `_let` so the plan stays linear in
    the kernel size."""
    lon = F.regexp_extract(a_lex, _WKT_POINT, 1)
    lat = F.regexp_extract(a_lex, _WKT_POINT, 2)
    x = F.when(lon != "", lon).cast("double")
    y = F.when(lat != "", lat).cast("double")
    is_mp = F.regexp_extract(a_lex, _WKT_MPOINT_HEAD, 0) != ""

    body = F.regexp_extract(b_lex, _WKT_POLYGONAL_BODY, 1)
    is_poly = body != ""
    rings = _poly_rings(b_lex)
    src = F.when(is_poly, body).otherwise(b_lex)
    fxs, fys = _flat_ring_coords(rings)

    def k(s) -> Column:
        xs, ys = s["xs"], s["ys"]
        nonempty = F.size(xs) > 0
        xmin, xmax = F.array_min(xs), F.array_max(xs)
        ymin, ymax = F.array_min(ys), F.array_max(ys)
        is_rect = (
            F.forall(xs, lambda v: (v == xmin) | (v == xmax))
            & F.forall(ys, lambda v: (v == ymin) | (v == ymax))
            & (s["nr"] <= 1)
        )

        def inside_at(xv: Column, yv: Column) -> Column:
            bbox_inside = (
                (xv >= xmin) & (xv <= xmax) & (yv >= ymin) & (yv <= ymax)
            )
            ray_inside = (
                _crossings_flat(s["fxs"], s["fys"], xv, yv) % 2 == 1
            )
            return F.when(
                is_rect | ~s["poly"], bbox_inside
            ).otherwise(ray_inside)

        idx = F.sequence(F.lit(0), F.greatest(F.size(s["mxs"]) - 1,
                                              F.lit(0)))
        member = lambda i: inside_at(F.get(s["mxs"], i), F.get(s["mys"], i))
        multi = (
            F.forall(idx, member) if all_members else F.exists(idx, member)
        ) & (F.size(s["mxs"]) > 0)
        single = inside_at(s["x"], s["y"])
        return F.when(nonempty, F.when(s["mp"], multi).otherwise(single))

    return _let(
        {"x": x, "y": y, "xs": _geom_lons(src), "ys": _geom_lats(src),
         "fxs": fxs, "fys": fys, "nr": F.size(rings), "poly": is_poly,
         "mp": is_mp, "mxs": _geom_lons(a_lex), "mys": _geom_lats(a_lex)},
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
    """Ring coordinate strings of a POLYGON or MULTIPOLYGON lex (a
    multipolygon's members flatten into one ring set — see
    _WKT_POLYGONAL_BODY); empty array otherwise. The separator between
    rings is one-or-more closing parens, comma, one-or-more opening
    parens, which covers both the intra-polygon ``),(`` and the
    inter-member ``)),((`` forms in a single split.

    A GEOMETRYCOLLECTION whose members are ALL polygonal (the form our
    own geof:union/symDifference and SPARQL CONSTRUCT round-trips can
    produce) flattens the same way: member type words drop out and the
    combined ring set keeps even-odd semantics, exactly like
    MULTIPOLYGON members (VERDICT r7 task 3 — self-output consumption).
    Collections containing POINT/LINESTRING members stay outside the
    polygonal path (mixed-dimension predicates: SURVEY §8)."""
    body = F.regexp_extract(lex, _WKT_POLYGONAL_BODY, 1)
    gc = F.regexp_extract(lex, _WKT_GC_BODY, 1)
    gc_poly = F.when(
        (gc != "") & ~gc.rlike(r"(?i)\b(?:POINT|LINESTRING)\b"),
        F.regexp_replace(gc, r"(?i)(?:MULTI)?POLYGON\s*", ""),
    ).otherwise(F.lit(""))
    body = F.when(body != "", body).otherwise(gc_poly)
    rings = F.split(
        F.regexp_replace(
            F.regexp_replace(body, r"^\s*\(+", ""), r"\)+\s*$", ""
        ),
        r"\)+\s*,\s*\(+",
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
    xb, yb}: an edge pair properly crosses OR any vertex of one lies
    inside the other (covers full containment; the even-odd test over
    ALL rings makes a polygon nested inside the other's hole correctly
    disjoint). ANY-vertex (round 7, was first-vertex): with MULTIPOLYGON
    members flattened, the member that lies inside the other geometry
    need not own the first vertex — O(V²), the same order as the edge
    sweep."""
    xa, ya, xb, yb = s["xa"], s["ya"], s["xb"], s["yb"]
    return (
        _edges_cross_flat(xa, ya, xb, yb)
        | _any_vertex(
            xb, yb, lambda x, y: _crossings_flat(xa, ya, x, y) % 2 == 1
        )
        | _any_vertex(
            xa, ya, lambda x, y: _crossings_flat(xb, yb, x, y) % 2 == 1
        )
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
    a_mp = F.regexp_extract(a_lex, _WKT_MPOINT_HEAD, 0) != ""
    b_mp = F.regexp_extract(b_lex, _WKT_MPOINT_HEAD, 0) != ""
    return (
        F.when(_is_point(a_lex), _point_in_geom(a_lex, b_lex))
        .when(_is_point(b_lex), _point_in_geom(b_lex, a_lex))
        .when(a_mp, _point_in_geom(a_lex, b_lex, all_members=False))
        .when(b_mp, _point_in_geom(b_lex, a_lex, all_members=False))
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


# ---------------------------------------------------------------------------
# Remaining simple-features predicates (round 6): sfEquals / sfTouches /
# sfOverlaps / sfCrosses, plus the geometry constructors envelope /
# boundary / buffer / getSRID. Same design rules as the rest of the
# kernel: WKT lex in, pure JVM higher-order Columns, heavy intermediates
# bound once through `_let`, ring-separator nulls coalesced at every
# three-valued site.
# ---------------------------------------------------------------------------

_GEO_NS = "http://www.opengis.net/ont/geosparql#"
_CRS84 = "http://www.opengis.net/def/crs/OGC/1.3/CRS84"


def _make_wkt(lex: Column) -> Column:
    """WKT string → geo:wktLiteral term (null lex → SPARQL error)."""
    from dublin_smart_city_graphdb_spark.sparql.termcol import (
        _NULL_B, _NULL_N, _NULL_S, _NULL_T, _struct, null_struct,
    )

    made = _struct(
        F.lit(2), lex, F.lit(_GEO_NS + "wktLiteral"),
        _NULL_S(), _NULL_N(), _NULL_T(), _NULL_B(),
    )
    return F.when(lex.isNotNull(), made).otherwise(null_struct())


def _on_any_edge_flat(xs: Column, ys: Column, x: Column,
                      y: Column) -> Column:
    """TRUE when (x, y) lies ON an edge of the flat coordinate arrays
    (collinear + inside the segment's bbox; separator edges never hit)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(xs) - 2, F.lit(0)))

    def hit(i: Column) -> Column:
        px, py = F.get(xs, i), F.get(ys, i)
        qx, qy = F.get(xs, i + 1), F.get(ys, i + 1)
        return F.coalesce(
            (_orient(px, py, qx, qy, x, y) == 0)
            & (x >= F.least(px, qx)) & (x <= F.greatest(px, qx))
            & (y >= F.least(py, qy)) & (y <= F.greatest(py, qy)),
            F.lit(False),
        )

    return F.exists(idx, hit)


def _strictly_inside_flat(xs: Column, ys: Column, x: Column,
                          y: Column) -> Column:
    return (
        (_crossings_flat(xs, ys, x, y) % 2 == 1)
        & ~_on_any_edge_flat(xs, ys, x, y)
    )


def _any_vertex(xs: Column, ys: Column, pred) -> Column:
    """∃ vertex of the flat arrays satisfying pred (separators skip)."""
    iv = F.sequence(F.lit(0), F.greatest(F.size(xs) - 1, F.lit(0)))
    return F.exists(iv, lambda i: F.coalesce(
        pred(F.get(xs, i), F.get(ys, i)), F.lit(False)
    ))


def _all_vertices(xs: Column, ys: Column, pred) -> Column:
    """∀ vertices of the flat arrays satisfying pred. Separator vertices
    must be skipped by the NULL-ness of the vertex itself — a null vertex
    can still drive pred to a non-null FALSE (an empty crossing count is
    0, and 0 % 2 == 1 is false, not null)."""
    iv = F.sequence(F.lit(0), F.greatest(F.size(xs) - 1, F.lit(0)))
    return F.forall(iv, lambda i: (
        F.get(xs, i).isNull()
        | F.coalesce(pred(F.get(xs, i), F.get(ys, i)), F.lit(True))
    ))


def _any_edge_midpoint(xs: Column, ys: Column, pred) -> Column:
    """∃ edge of the flat arrays whose MIDPOINT satisfies pred
    (separator-adjacent edges have a null endpoint → null midpoint →
    coalesced to false)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(xs) - 2, F.lit(0)))
    return F.exists(idx, lambda i: F.coalesce(
        pred(
            (F.get(xs, i) + F.get(xs, i + 1)) / 2,
            (F.get(ys, i) + F.get(ys, i + 1)) / 2,
        ),
        F.lit(False),
    ))


def _interiors_meet_flat(s) -> Column:
    """Polygon interiors share a point over bound arrays {xa,ya,xb,yb}:
    a proper edge crossing, a vertex of one STRICTLY inside the other,
    or an edge MIDPOINT of one strictly inside the other. The midpoint
    probe (round 9 — found by the interval-algebra property test: a box
    nested in another while spanning its full y-extent has EVERY vertex
    on the other's boundary, no crossing, yet its interior is inside)
    covers the all-vertices-on-boundary containment class; what remains
    outside the envelope is a boundary that lies ENTIRELY on the other's
    boundary — the equals guard at the call sites."""
    xa, ya, xb, yb = s["xa"], s["ya"], s["xb"], s["yb"]
    return (
        _edges_cross_flat(xa, ya, xb, yb)
        | _any_vertex(xb, yb, lambda x, y: _strictly_inside_flat(xa, ya, x, y))
        | _any_vertex(xa, ya, lambda x, y: _strictly_inside_flat(xb, yb, x, y))
        | _any_edge_midpoint(
            xb, yb, lambda x, y: _strictly_inside_flat(xa, ya, x, y)
        )
        | _any_edge_midpoint(
            xa, ya, lambda x, y: _strictly_inside_flat(xb, yb, x, y)
        )
    )


def _contains_flat(s) -> Column:
    """A covers B over bound arrays: every B vertex inside-or-on A, no
    A vertex strictly inside B (catches an A hole nested in B), and no
    proper edge crossing."""
    xa, ya, xb, yb = s["xa"], s["ya"], s["xb"], s["yb"]
    in_or_on = _all_vertices(xb, yb, lambda x, y: (
        (_crossings_flat(xa, ya, x, y) % 2 == 1)
        | _on_any_edge_flat(xa, ya, x, y)
    ))
    return (
        in_or_on
        & ~_any_vertex(xa, ya, lambda x, y: _strictly_inside_flat(xb, yb, x, y))
        & ~_edges_cross_flat(xa, ya, xb, yb)
    )


def _canon_rings(lex: Column) -> Column:
    """POLYGON lex → sorted array of canonical ring keys: each ring's
    vertex cycle rotated to start at its lexicographically-least vertex
    and oriented toward the smaller neighbour, so the SAME ring written
    with any rotation/direction serializes identically."""
    def canon(r: Column) -> Column:
        pts = F.transform(
            F.split(r, r"\s*,\s*"),
            lambda p: F.struct(
                F.element_at(F.split(F.trim(p), r"\s+"), 1)
                .cast("double").alias("x"),
                F.element_at(F.split(F.trim(p), r"\s+"), 2)
                .cast("double").alias("y"),
            ),
        )
        return _let({"pts": pts}, _canon_key)

    return F.array_sort(F.transform(_poly_rings(lex), canon))


def _canon_key(s) -> Column:
    pts = s["pts"]
    n = F.size(pts)
    closed = (n > 1) & (F.get(pts, 0) == F.get(pts, n - 1))
    opened = F.when(closed, F.slice(pts, F.lit(1), n - 1)).otherwise(pts)

    def key(op) -> Column:
        o = op["o"]
        m = F.array_min(o)
        idx = F.sequence(F.lit(0), F.greatest(F.size(o) - 1, F.lit(0)))
        mi = F.get(F.filter(idx, lambda i: F.get(o, i) == m), 0)
        rot = F.concat(
            F.slice(o, mi + 1, F.size(o) - mi),
            F.slice(o, F.lit(1), mi),
        )
        fwd = (F.size(rot) <= 2) | (
            F.get(rot, 1) <= F.get(rot, F.size(rot) - 1)
        )
        ordered = F.when(fwd, rot).otherwise(F.concat(
            F.array(F.get(rot, 0)),
            F.reverse(F.slice(rot, F.lit(2), F.size(rot) - 1)),
        ))
        return F.array_join(F.transform(
            ordered,
            lambda pt: F.concat_ws(
                " ", pt["x"].cast("string"), pt["y"].cast("string")
            ),
        ), ",")

    return _let({"o": opened}, key)


def _poly_pair_let(a_lex: Column, b_lex: Column, body) -> Column:
    ra, rb = _poly_rings(a_lex), _poly_rings(b_lex)
    fxa, fya = _flat_ring_coords(ra)
    fxb, fyb = _flat_ring_coords(rb)
    both = (F.size(ra) > 0) & (F.size(rb) > 0)
    return F.when(both, _let(
        {"xa": fxa, "ya": fya, "xb": fxb, "yb": fyb}, body
    ))


def geof_sf_equals(args: list[Column]) -> Column:
    """geof:sfEquals: point-point by coordinates; polygon-polygon by
    canonical ring-set comparison (rotation/direction insensitive, holes
    included); mixed point/polygon false; other pairs by exact lex."""
    a_lex, b_lex = args[0]["lex"], args[1]["lex"]
    ax, ay = _pt_xy(a_lex)
    bx, by = _pt_xy(b_lex)
    a_pt, b_pt = _is_point(a_lex), _is_point(b_lex)
    a_poly = F.size(_poly_rings(a_lex)) > 0
    b_poly = F.size(_poly_rings(b_lex)) > 0
    return make_bool(
        F.when(a_pt & b_pt, (ax == bx) & (ay == by))
        .when(a_poly & b_poly, _canon_rings(a_lex) == _canon_rings(b_lex))
        .when(a_pt | b_pt | a_poly | b_poly, F.lit(False))
        .otherwise(F.trim(a_lex) == F.trim(b_lex))
    )


def geof_sf_touches(args: list[Column]) -> Column:
    """geof:sfTouches: boundaries meet, interiors don't. Exact for
    point-polygon (point ON a ring edge) and polygon-polygon via
    vertex-on-edge contact with no proper crossing, no strict
    containment of any vertex, and not equal (see _interiors_meet_flat
    for the documented envelope). Point-point is always false (points
    have no boundary)."""
    a_lex, b_lex = args[0]["lex"], args[1]["lex"]
    ax, ay = _pt_xy(a_lex)
    bx, by = _pt_xy(b_lex)
    a_pt, b_pt = _is_point(a_lex), _is_point(b_lex)
    a_poly = F.size(_poly_rings(a_lex)) > 0
    b_poly = F.size(_poly_rings(b_lex)) > 0

    def pt_on_boundary(x, y, poly_lex) -> Column:
        fxs, fys = _flat_ring_coords(_poly_rings(poly_lex))
        return _let(
            {"xs": fxs, "ys": fys, "x": x, "y": y},
            lambda s: _on_any_edge_flat(s["xs"], s["ys"], s["x"], s["y"]),
        )

    def poly_poly(s) -> Column:
        xa, ya, xb, yb = s["xa"], s["ya"], s["xb"], s["yb"]
        contact = (
            _any_vertex(xb, yb, lambda x, y: _on_any_edge_flat(xa, ya, x, y))
            | _any_vertex(xa, ya, lambda x, y: _on_any_edge_flat(xb, yb, x, y))
        )
        return contact & ~_interiors_meet_flat(s)

    return make_bool(
        F.when(a_pt & b_pt, F.lit(False))
        .when(a_pt & b_poly, pt_on_boundary(ax, ay, b_lex))
        .when(b_pt & a_poly, pt_on_boundary(bx, by, a_lex))
        .when(
            a_poly & b_poly,
            _poly_pair_let(a_lex, b_lex, poly_poly)
            & ~(_canon_rings(a_lex) == _canon_rings(b_lex)),
        )
    )


def geof_sf_overlaps(args: list[Column]) -> Column:
    """geof:sfOverlaps (same-dimension): polygon interiors share a point,
    neither covers the other, and they are not equal. Point pairs are
    never overlaps; mixed dimensions are false per DE-9IM."""
    a_lex, b_lex = args[0]["lex"], args[1]["lex"]
    a_poly = F.size(_poly_rings(a_lex)) > 0
    b_poly = F.size(_poly_rings(b_lex)) > 0

    def body(s) -> Column:
        ba = {"xa": s["xb"], "ya": s["yb"], "xb": s["xa"], "yb": s["ya"]}
        return (
            _interiors_meet_flat(s)
            & ~_contains_flat(s)
            & ~_contains_flat(ba)
        )

    return make_bool(
        F.when(
            a_poly & b_poly,
            _poly_pair_let(a_lex, b_lex, body)
            & ~(_canon_rings(a_lex) == _canon_rings(b_lex)),
        ).otherwise(F.lit(False))
    )


_WKT_LINE_BODY = r"^\s*LINESTRING\s*\(\s*(.*\S)\s*\)\s*$"
_WKT_MLINE_BODY = r"^\s*MULTILINESTRING\s*\(\s*(.*\S)\s*\)\s*$"


def _line_parts(lex: Column) -> Column:
    """Component coordinate strings of a LINESTRING (one component) or
    MULTILINESTRING (round 7 — including geof:boundary's own output);
    empty array otherwise. Flattening through _flat_ring_coords puts a
    null separator between components, so no phantom edge spans them."""
    line = F.regexp_extract(lex, _WKT_LINE_BODY, 1)
    mbody = F.regexp_extract(lex, _WKT_MLINE_BODY, 1)
    parts = F.split(
        F.regexp_replace(
            F.regexp_replace(mbody, r"^\s*\(+", ""), r"\)+\s*$", ""
        ),
        r"\)+\s*,\s*\(+",
    )
    return (
        F.when(line != "", F.array(line))
        .when(mbody != "", parts)
        .otherwise(F.array().cast("array<string>"))
    )


def geof_sf_crosses(args: list[Column]) -> Column:
    """geof:sfCrosses: LINESTRING/MULTILINESTRING vs POLYGON/MULTIPOLYGON
    (either order) — the line properly crosses a ring edge, or has a
    vertex strictly inside AND a vertex strictly outside. Line-line: any
    proper edge crossing. Exactness envelope: a passage whose interior
    dip has no witnessing vertex and no proper crossing is undetected
    (documented). Point and polygon-polygon pairs are false per DE-9IM
    dimension rules."""
    a_lex, b_lex = args[0]["lex"], args[1]["lex"]
    a_line = F.size(_line_parts(a_lex)) > 0
    b_line = F.size(_line_parts(b_lex)) > 0
    a_poly = F.size(_poly_rings(a_lex)) > 0
    b_poly = F.size(_poly_rings(b_lex)) > 0

    def line_poly(line_lex, poly_lex) -> Column:
        lxs, lys = _flat_ring_coords(_line_parts(line_lex))
        fxs, fys = _flat_ring_coords(_poly_rings(poly_lex))

        def k(s) -> Column:
            lx, ly, xs, ys = s["lx"], s["ly"], s["xs"], s["ys"]
            inside = _any_vertex(
                lx, ly, lambda x, y: _strictly_inside_flat(xs, ys, x, y)
            )
            # x.isNotNull(): the component-separator vertex must not
            # count as "outside" (a null vertex crosses 0 edges → even)
            outside = _any_vertex(lx, ly, lambda x, y: (
                x.isNotNull()
                & (_crossings_flat(xs, ys, x, y) % 2 == 0)
                & ~_on_any_edge_flat(xs, ys, x, y)
            ))
            return (
                _edges_cross_flat(lx, ly, xs, ys) | (inside & outside)
            )

        return _let({"lx": lxs, "ly": lys, "xs": fxs, "ys": fys}, k)

    def line_line(s) -> Column:
        return _edges_cross_flat(s["xa"], s["ya"], s["xb"], s["yb"])

    return make_bool(
        F.when(a_line & b_poly, line_poly(a_lex, b_lex))
        .when(b_line & a_poly, line_poly(b_lex, a_lex))
        .when(a_line & b_line, _let(
            dict(zip(
                ("xa", "ya", "xb", "yb"),
                _flat_ring_coords(_line_parts(a_lex))
                + _flat_ring_coords(_line_parts(b_lex)),
            )),
            line_line,
        ))
        .otherwise(F.lit(False))
    )


def geof_envelope(args: list[Column]) -> Column:
    """geof:envelope(geom) → the axis-aligned bounding box as a
    geo:wktLiteral POLYGON (degenerate boxes stay valid WKT)."""
    lex = args[0]["lex"]
    xs, ys = _geom_lons(lex), _geom_lats(lex)

    def k(s) -> Column:
        x1, x2 = s["x1"].cast("string"), s["x2"].cast("string")
        y1, y2 = s["y1"].cast("string"), s["y2"].cast("string")
        sp, cm = F.lit(" "), F.lit(", ")
        return F.concat(
            F.lit("POLYGON(("),
            x1, sp, y1, cm, x2, sp, y1, cm,
            x2, sp, y2, cm, x1, sp, y2, cm, x1, sp, y1,
            F.lit("))"),
        )

    wkt = F.when(F.size(xs) > 0, _let(
        {"x1": F.array_min(xs), "x2": F.array_max(xs),
         "y1": F.array_min(ys), "y2": F.array_max(ys)}, k,
    ))
    return _make_wkt(wkt)


def geof_boundary(args: list[Column]) -> Column:
    """geof:boundary(geom): POLYGON → its rings as a MULTILINESTRING;
    POINT → the empty geometry (points have no boundary)."""
    lex = args[0]["lex"]
    rings = _poly_rings(lex)
    poly_boundary = F.concat(
        F.lit("MULTILINESTRING("),
        F.array_join(
            F.transform(rings, lambda r: F.concat(F.lit("("), r, F.lit(")"))),
            ", ",
        ),
        F.lit(")"),
    )
    wkt = (
        F.when(F.size(rings) > 0, poly_boundary)
        .when(_is_point(lex), F.lit("GEOMETRYCOLLECTION EMPTY"))
    )
    return _make_wkt(wkt)


_BUFFER_SEGS = 32


def geof_buffer(args: list[Column]) -> Column:
    """geof:buffer(geom, radius [, unitIRI]) → geo:wktLiteral. POINT
    keeps the JVM 32-gon fast path (radius converted to local degrees
    with the same equirectangular scaling as geof:distance, lon by
    cos(lat)); every other geometry routes through the Arrow-batched
    capsule-union kernel (geo/boolops.buffer_wkt — round 8b closes the
    former point-only stub), which pre-scales x by cos(mean latitude)
    for the same metric roundness."""
    import math as _math

    x, y = _pt_xy(args[0]["lex"])
    radius = args[1]["num"].cast("double")
    meters = radius
    if len(args) >= 3:
        unit = args[2]["lex"]
        meters = (
            F.when(unit == _UOM + "metre", radius)
            .when(unit == _UOM + "kilometre", radius * 1000.0)
            .when(unit == _UOM + "degree",
                  radius * F.lit(_math.pi / 180.0 * _EARTH_RADIUS_M))
            .when(unit == _UOM + "radian", radius * F.lit(_EARTH_RADIUS_M))
        )
    deg_lat = meters / F.lit(_math.pi / 180.0 * _EARTH_RADIUS_M)

    def k(s) -> Column:
        cx, cy, dlat, dlon = s["x"], s["y"], s["dlat"], s["dlon"]
        idx = F.sequence(F.lit(0), F.lit(_BUFFER_SEGS))
        pts = F.transform(idx, lambda i: F.concat_ws(
            " ",
            (cx + dlon * F.cos(
                (i % _BUFFER_SEGS) * (2.0 * _math.pi / _BUFFER_SEGS)
            )).cast("string"),
            (cy + dlat * F.sin(
                (i % _BUFFER_SEGS) * (2.0 * _math.pi / _BUFFER_SEGS)
            )).cast("string"),
        ))
        return F.concat(
            F.lit("POLYGON(("), F.array_join(pts, ", "), F.lit("))")
        )

    # non-point general path (r8b): Arrow-batched capsule-union kernel
    if "buffer" not in _GEO_SETOP_UDFS:
        def bfn(lex: pd.Series, degs: pd.Series) -> pd.Series:
            from dublin_smart_city_graphdb_spark.geo.boolops import (
                buffer_wkt,
            )

            return pd.Series(
                [
                    buffer_wkt(w, d, geographic=True)
                    if w is not None and d is not None else None
                    for w, d in zip(lex, degs)
                ],
                dtype="object",
            )

        _GEO_SETOP_UDFS["buffer"] = F.pandas_udf(bfn, "string")
    general = _GEO_SETOP_UDFS["buffer"](
        args[0]["lex"], deg_lat.cast("double")
    )
    wkt = F.when(x.isNotNull() & meters.isNotNull(), _let(
        {"x": x, "y": y, "dlat": deg_lat,
         "dlon": deg_lat / F.cos(F.radians(y))}, k,
    )).otherwise(general)
    return _make_wkt(wkt)


def geof_get_srid(args: list[Column]) -> Column:
    """geof:getSRID(geom) → xsd:anyURI of the CRS: an embedded
    ``<crs-iri>`` WKT prefix when present, else the CRS84 default."""
    from dublin_smart_city_graphdb_spark.sparql.termcol import (
        _NULL_B, _NULL_N, _NULL_S, _NULL_T, _struct,
    )

    lex = args[0]["lex"]
    embedded = F.regexp_extract(lex, r"^\s*<([^>]+)>", 1)
    crs = F.when(embedded != "", embedded).otherwise(F.lit(_CRS84))
    return _struct(
        F.lit(2), crs, F.lit(XSD + "anyURI"),
        _NULL_S(), _NULL_N(), _NULL_T(), _NULL_B(),
    )


# ---------------------------------------------------------------------------
# Egenhofer + RCC8 relation families (GeoSPARQL topology vocabulary
# requirements 5/6; reference deploys GraphDB 10.7.2 whose GeoSPARQL
# plugin exposes all three families). For area/area pairs every relation
# reduces to combinations of the simple-features kernels this module
# already has: equals/touches/overlaps map 1:1; the four containment
# relations split sf-style containment by BOUNDARY CONTACT (tangential vs
# non-tangential proper part). All map-only — same zero-exchange plan
# contract as the sf predicates.
# ---------------------------------------------------------------------------

def _boundary_contact_flat(s) -> Column:
    """Some vertex of either polygon lies on the other's boundary — the
    tangential-contact witness (same envelope as sfTouches: contact
    through edge-interior-only overlap without a witnessing vertex is
    undetected, documented)."""
    xa, ya, xb, yb = s["xa"], s["ya"], s["xb"], s["yb"]
    return (
        _any_vertex(xb, yb, lambda x, y: _on_any_edge_flat(xa, ya, x, y))
        | _any_vertex(xa, ya, lambda x, y: _on_any_edge_flat(xb, yb, x, y))
    )


def _inside_strict(a_lex: Column, b_lex: Column) -> Column:
    """A in B's interior with NO boundary contact (non-tangential proper
    part). Point-in-polygon strict, or polygon-polygon covers minus
    contact."""
    a_pt, b_poly = _is_point(a_lex), F.size(_poly_rings(b_lex)) > 0
    a_poly = F.size(_poly_rings(a_lex)) > 0
    ax, ay = _pt_xy(a_lex)

    def pt_case() -> Column:
        fxs, fys = _flat_ring_coords(_poly_rings(b_lex))
        return _let(
            {"xs": fxs, "ys": fys, "x": ax, "y": ay},
            lambda s: _strictly_inside_flat(s["xs"], s["ys"], s["x"], s["y"]),
        )

    # _poly_pair_let(b, a): s["xa"] holds B, s["xb"] holds A, so
    # _contains_flat(s) reads "B covers A"
    return (
        F.when(a_pt & b_poly, pt_case())
        .when(
            a_poly & b_poly,
            _poly_pair_let(b_lex, a_lex, lambda s: (
                _contains_flat(s) & ~_boundary_contact_flat(s)
            )),
        )
        .otherwise(F.lit(False))
    )


def _covered_tangential(a_lex: Column, b_lex: Column) -> Column:
    """A covered by B WITH boundary contact and A != B (tangential proper
    part). Area/area only — a point on B's boundary is boundary, not a
    proper part."""
    a_poly = F.size(_poly_rings(a_lex)) > 0
    b_poly = F.size(_poly_rings(b_lex)) > 0
    return (
        F.when(
            a_poly & b_poly,
            _poly_pair_let(b_lex, a_lex, lambda s: (
                _contains_flat(s) & _boundary_contact_flat(s)
            ))
            & ~(_canon_rings(a_lex) == _canon_rings(b_lex)),
        )
        .otherwise(F.lit(False))
    )


def geof_eh_inside(args: list[Column]) -> Column:
    """geof:ehInside ≡ geof:rcc8ntpp: non-tangential proper part."""
    return make_bool(_inside_strict(args[0]["lex"], args[1]["lex"]))


def geof_eh_contains(args: list[Column]) -> Column:
    """geof:ehContains ≡ geof:rcc8ntppi (argument-swapped ehInside)."""
    return make_bool(_inside_strict(args[1]["lex"], args[0]["lex"]))


def geof_eh_covered_by(args: list[Column]) -> Column:
    """geof:ehCoveredBy ≡ geof:rcc8tpp: tangential proper part."""
    return make_bool(_covered_tangential(args[0]["lex"], args[1]["lex"]))


def geof_eh_covers(args: list[Column]) -> Column:
    """geof:ehCovers ≡ geof:rcc8tppi (argument-swapped ehCoveredBy)."""
    return make_bool(_covered_tangential(args[1]["lex"], args[0]["lex"]))


# -- non-topological set functions (GeoSPARQL §8.7-8.8) ----------------------
#
# geof:intersection/union/difference/symDifference/convexHull return
# GEOMETRIES, and geof:relate matches a DE-9IM pattern — set-valued /
# matrix-valued work the flat-ring Column kernels can't express (a
# boolean-combination boundary is a new ring set, not a predicate).
# These run through Arrow-batched pandas UDFs over geo/boolops.py's slab
# clipper: per-row geometry transforms, map-only, no shuffle — linear
# and embarrassingly parallel at cluster scale, the same execution shape
# as GraphDB's per-binding JTS calls. The hot-path PREDICATES above stay
# JVM Column expressions; these functions appear in projections/BINDs,
# where a vectorized Python kernel is the sanctioned fallback (VERDICT
# r7 task 2).

def _boolop_pudf(op: str):
    def fn(a: pd.Series, b: pd.Series) -> pd.Series:
        from dublin_smart_city_graphdb_spark.geo.boolops import boolop_wkt

        return pd.Series(
            [boolop_wkt(x, y, op) for x, y in zip(a, b)], dtype="object"
        )

    return F.pandas_udf(fn, "string")


_GEO_SETOP_UDFS: dict = {}


def _geo_setop(op: str, args: list[Column]) -> Column:
    if op not in _GEO_SETOP_UDFS:
        _GEO_SETOP_UDFS[op] = _boolop_pudf(op)
    return _make_wkt(_GEO_SETOP_UDFS[op](args[0]["lex"], args[1]["lex"]))


def geof_intersection(args: list[Column]) -> Column:
    """geof:intersection(geomA, geomB) → geo:wktLiteral (GeoSPARQL
    §8.7.2). Polygonal/point operands; empty → GEOMETRYCOLLECTION
    EMPTY; linework unsupported (SPARQL error, SURVEY §8)."""
    return _geo_setop("and", args)


def geof_union(args: list[Column]) -> Column:
    """geof:union(geomA, geomB) → geo:wktLiteral (§8.7.4)."""
    return _geo_setop("or", args)


def geof_difference(args: list[Column]) -> Column:
    """geof:difference(geomA, geomB) → geo:wktLiteral (§8.7.3)."""
    return _geo_setop("sub", args)


def geof_sym_difference(args: list[Column]) -> Column:
    """geof:symDifference(geomA, geomB) → geo:wktLiteral (§8.7.5)."""
    return _geo_setop("xor", args)


def geof_convex_hull(args: list[Column]) -> Column:
    """geof:convexHull(geom) → geo:wktLiteral (§8.7.1): monotone-chain
    hull of every coordinate (POINT / LINESTRING / POLYGON degenerate
    forms per dimension, like JTS)."""
    if "hull" not in _GEO_SETOP_UDFS:
        def fn(a: pd.Series) -> pd.Series:
            from dublin_smart_city_graphdb_spark.geo.boolops import (
                convex_hull_wkt,
            )

            return pd.Series(
                [convex_hull_wkt(x) for x in a], dtype="object"
            )

        _GEO_SETOP_UDFS["hull"] = F.pandas_udf(fn, "string")
    return _make_wkt(_GEO_SETOP_UDFS["hull"](args[0]["lex"]))


def geof_relate(args: list[Column]) -> Column:
    """geof:relate(geomA, geomB, de9imPattern) → xsd:boolean (§8.8):
    full T/F/0/1/2/* pattern matching over the DE-9IM matrix computed
    on the kernel's point/polygonal exactness domain."""
    if "relate" not in _GEO_SETOP_UDFS:
        def fn(a: pd.Series, b: pd.Series,
               p: pd.Series) -> pd.Series:
            from dublin_smart_city_graphdb_spark.geo.boolops import (
                relate_wkt,
            )

            return pd.Series(
                [relate_wkt(x, y, z) for x, y, z in zip(a, b, p)],
                dtype="object",
            )

        _GEO_SETOP_UDFS["relate"] = F.pandas_udf(fn, "boolean")
    return make_bool(
        _GEO_SETOP_UDFS["relate"](
            args[0]["lex"], args[1]["lex"], args[2]["lex"]
        )
    )


def _empty_aware(fn, on_empty: bool):
    """Wrap a binary geo predicate with OGC empty-geometry semantics:
    an EMPTY operand (``GEOMETRYCOLLECTION EMPTY`` — e.g. our own
    geof:boundary(point) output — or any ``<TYPE> EMPTY``) is disjoint
    from everything, so sfDisjoint answers true and every other
    predicate false, instead of erroring (VERDICT r7 task 3)."""
    def wrapped(args: list[Column]) -> Column:
        is_empty = (
            args[0]["lex"].rlike(_WKT_EMPTY)
            | args[1]["lex"].rlike(_WKT_EMPTY)
        )
        return F.when(
            is_empty, make_bool(F.lit(on_empty))
        ).otherwise(fn(args))

    return wrapped


# mixed-dimension GEOMETRYCOLLECTION (contains point/line members)
_WKT_MIXED_GC = (
    r"(?si)^\s*(?:<[^>]*>\s*)?GEOMETRYCOLLECTION\s*\("
    r".*\b(?:POINT|LINESTRING)\b"
)
# bare linework operand
_WKT_LINEY = r"(?si)^\s*(?:<[^>]*>\s*)?(?:MULTI)?LINESTRING\b"


def _sf_predicate(fn, name: str, line_escape: str | None = None):
    """Dispatch wrapper for the simple-features predicates: the JVM
    Column kernel serves its exactness envelope (the hot path,
    unchanged — including its documented bbox fallbacks), while shapes
    it CANNOT answer route to the Arrow-batched DE-9IM evaluator
    (geo/boolops.named_predicate — round 8b): mixed-dimension
    GEOMETRYCOLLECTION operands for every predicate, and a linework
    operand on the CONTAINED side of the containment/equality family
    (``line_escape`` = which side: 'a' for within, 'b' for contains,
    'either' for equals), where the JVM kernel previously answered a
    SPARQL error. Empty operands keep the OGC rule (disjoint true,
    everything else false)."""
    if name not in _GEO_SETOP_UDFS:
        def pfn(a: pd.Series, b: pd.Series) -> pd.Series:
            from dublin_smart_city_graphdb_spark.geo.boolops import (
                named_predicate,
            )

            return pd.Series(
                [named_predicate(x, y, name) for x, y in zip(a, b)],
                dtype="object",
            )

        _GEO_SETOP_UDFS[name] = F.pandas_udf(pfn, "boolean")

    def wrapped(args: list[Column]) -> Column:
        a, b = args[0]["lex"], args[1]["lex"]
        is_empty = a.rlike(_WKT_EMPTY) | b.rlike(_WKT_EMPTY)
        escape = a.rlike(_WKT_MIXED_GC) | b.rlike(_WKT_MIXED_GC)
        if line_escape in ("a", "either"):
            escape = escape | a.rlike(_WKT_LINEY)
        if line_escape in ("b", "either"):
            escape = escape | b.rlike(_WKT_LINEY)
        return (
            F.when(is_empty, make_bool(F.lit(name == "disjoint")))
            .when(escape, make_bool(_GEO_SETOP_UDFS[name](a, b)))
            .otherwise(fn(args))
        )

    return wrapped


def default_extensions() -> dict:
    ext = {
        FN + "haversineKm": haversine_km,
        FN + "wktLon": wkt_lon,
        FN + "wktLat": wkt_lat,
        FN + "wktWithinBBox": wkt_within_bbox,
        GEOF + "sfWithin": _sf_predicate(geof_sf_within, "within", "a"),
        GEOF + "sfContains": _sf_predicate(geof_sf_contains, "contains", "b"),
        GEOF + "sfIntersects": _sf_predicate(geof_sf_intersects, "intersects"),
        GEOF + "sfDisjoint": _sf_predicate(geof_sf_disjoint, "disjoint"),
        GEOF + "sfEquals": _sf_predicate(geof_sf_equals, "equals", "either"),
        GEOF + "sfTouches": _sf_predicate(geof_sf_touches, "touches"),
        GEOF + "sfOverlaps": _sf_predicate(geof_sf_overlaps, "overlaps"),
        GEOF + "sfCrosses": _sf_predicate(geof_sf_crosses, "crosses"),
        GEOF + "distance": geof_distance,
        GEOF + "envelope": geof_envelope,
        GEOF + "boundary": geof_boundary,
        GEOF + "buffer": geof_buffer,
        GEOF + "getSRID": geof_get_srid,
        # Egenhofer family: equals/disjoint/meet/overlap are the same
        # DE-9IM classes as their simple-features counterparts for areas
        GEOF + "ehEquals": _empty_aware(geof_sf_equals, False),
        GEOF + "ehDisjoint": _empty_aware(geof_sf_disjoint, True),
        GEOF + "ehMeet": _empty_aware(geof_sf_touches, False),
        GEOF + "ehOverlap": _empty_aware(geof_sf_overlaps, False),
        GEOF + "ehInside": _empty_aware(geof_eh_inside, False),
        GEOF + "ehContains": _empty_aware(geof_eh_contains, False),
        GEOF + "ehCoveredBy": _empty_aware(geof_eh_covered_by, False),
        GEOF + "ehCovers": _empty_aware(geof_eh_covers, False),
        # RCC8 family (region-region; the four containment relations are
        # area-gated inside the kernels)
        GEOF + "rcc8eq": _empty_aware(geof_sf_equals, False),
        GEOF + "rcc8dc": _empty_aware(geof_sf_disjoint, True),
        GEOF + "rcc8ec": _empty_aware(geof_sf_touches, False),
        GEOF + "rcc8po": _empty_aware(geof_sf_overlaps, False),
        GEOF + "rcc8ntpp": _empty_aware(geof_eh_inside, False),
        GEOF + "rcc8ntppi": _empty_aware(geof_eh_contains, False),
        GEOF + "rcc8tpp": _empty_aware(geof_eh_covered_by, False),
        GEOF + "rcc8tppi": _empty_aware(geof_eh_covers, False),
        # non-topological set functions (§8.7-8.8, Arrow-batched)
        GEOF + "intersection": geof_intersection,
        GEOF + "union": geof_union,
        GEOF + "difference": geof_difference,
        GEOF + "symDifference": geof_sym_difference,
        GEOF + "convexHull": geof_convex_hull,
        GEOF + "relate": geof_relate,
    }
    return ext
