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
from dublin_smart_city_graphdb_spark.sparql.termcol import make_numeric

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


def default_extensions() -> dict:
    return {
        FN + "haversineKm": haversine_km,
        FN + "wktLon": wkt_lon,
        FN + "wktLat": wkt_lat,
    }
