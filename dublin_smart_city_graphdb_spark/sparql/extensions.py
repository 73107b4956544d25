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


def geof_sf_within(args: list[Column]) -> Column:
    """geof:sfWithin(geomA, geomB) → xsd:boolean — GeoSPARQL simple-features
    containment for the shapes the reference's data actually uses: geomA a
    POINT, geomB an axis-aligned rectangle POLYGON (or any geometry, tested
    against its bounding box).

    Semantics: point ∈ [min lon, max lon] × [min lat, max lat] of geomB's
    coordinate list — exact for axis-aligned rectangles (the bbox idiom of
    facilities.ttl:211-218); for non-rectangular polygons this is the
    bounding-box approximation, documented as such. Vertex extraction is
    ``regexp_extract_all`` + higher-order ``transform``/``array_min`` — all
    JVM, codegen-friendly, no UDF. Non-POINT geomA → null (SPARQL error)."""
    a_lex, b_lex = args[0]["lex"], args[1]["lex"]
    lon = F.regexp_extract(a_lex, _WKT_POINT, 1)
    lat = F.regexp_extract(a_lex, _WKT_POINT, 2)
    lon_d = F.when(lon != "", lon).cast("double")
    lat_d = F.when(lat != "", lat).cast("double")
    b_lons = _geom_lons(b_lex)
    b_lats = _geom_lats(b_lex)
    nonempty = F.size(b_lons) > 0
    inside = (
        (lon_d >= F.array_min(b_lons))
        & (lon_d <= F.array_max(b_lons))
        & (lat_d >= F.array_min(b_lats))
        & (lat_d <= F.array_max(b_lats))
    )
    return make_bool(F.when(nonempty, inside))


def default_extensions() -> dict:
    return {
        FN + "haversineKm": haversine_km,
        FN + "wktLon": wkt_lon,
        FN + "wktLat": wkt_lat,
        FN + "wktWithinBBox": wkt_within_bbox,
        GEOF + "sfWithin": geof_sf_within,
    }
