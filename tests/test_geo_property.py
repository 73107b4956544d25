"""Property-based checks for the geometry kernel (round 6): random
convex polygons and points, engine results compared against INDEPENDENT
formulations — half-plane containment (not ray casting) and the
separating-axis theorem (not edge-crossing + probes). Near-boundary
cases are discarded with an epsilon guard so float formulation
differences can't manufacture flakes; each hypothesis example evaluates
a whole batch of cases in one Spark job."""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

EPS = 1e-6


def _convex_polygon(rng: random.Random) -> list[tuple[float, float]]:
    """Convex by construction: vertices on ONE circle at sorted angles
    (varying per-vertex radii would give a star-shaped concave polygon
    and break the half-plane oracle — the engine's even-odd cast handles
    those, the oracle doesn't). Rounding to 3 decimals keeps convexity
    because the angular gaps are bounded below."""
    cx, cy = rng.uniform(-5, 5), rng.uniform(-5, 5)
    r = rng.uniform(1.0, 3.0)
    k = rng.randint(3, 8)
    angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(k))
    # reject near-duplicate angles (degenerate or rounding-concave edges)
    if any(b - a < 0.25 for a, b in zip(angles, angles[1:])):
        return _convex_polygon(rng)
    pts = [
        (round(cx + r * math.cos(a), 3), round(cy + r * math.sin(a), 3))
        for a in angles
    ]
    return pts


def _wkt(poly: list[tuple[float, float]]) -> str:
    ring = ", ".join(f"{x} {y}" for x, y in (*poly, poly[0]))
    return f"POLYGON(({ring}))"


def _halfplane_inside(poly, x, y) -> bool | None:
    """Convex containment by edge half-planes (vertices are CCW by
    angular construction). None = too close to an edge line to trust."""
    pts = list(poly) + [poly[0]]
    for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
        cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        if abs(cross) < EPS:
            return None
        if cross < 0:
            return False
    return True


def _sat_intersects(pa, pb) -> bool | None:
    """Separating-axis test for two convex polygons. None = a projection
    gap within epsilon of zero (touching region, untrusted)."""
    for poly in (pa, pb):
        pts = list(poly) + [poly[0]]
        for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
            nx, ny = -(y2 - y1), (x2 - x1)
            a_proj = [nx * x + ny * y for x, y in pa]
            b_proj = [nx * x + ny * y for x, y in pb]
            gap = max(min(a_proj) - max(b_proj), min(b_proj) - max(a_proj))
            if abs(gap) < EPS * max(1.0, abs(max(a_proj)), abs(max(b_proj))):
                return None
            if gap > 0:
                return False
    return True


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 2**32 - 1))
def test_point_in_convex_polygon_matches_halfplanes(spark, seed):
    rng = random.Random(seed)
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        _point_in_geom,
    )

    cases = []
    while len(cases) < 40:
        poly = _convex_polygon(rng)
        x, y = round(rng.uniform(-9, 9), 3), round(rng.uniform(-9, 9), 3)
        want = _halfplane_inside(poly, x, y)
        if want is None:
            continue
        cases.append((f"POINT({x} {y})", _wkt(poly), want))
    df = spark.createDataFrame(cases, "a string, b string, want boolean")
    rows = df.withColumn(
        "got", _point_in_geom(F.col("a"), F.col("b"))
    ).collect()
    bad = [(r["a"], r["b"], r["want"], r["got"])
           for r in rows if r["got"] != r["want"]]
    assert not bad, f"{len(bad)} divergences, first: {bad[0]}"


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 2**32 - 1))
def test_polygon_intersects_matches_sat(spark, seed):
    rng = random.Random(seed)
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        _intersects_col,
    )

    cases = []
    while len(cases) < 30:
        pa, pb = _convex_polygon(rng), _convex_polygon(rng)
        want = _sat_intersects(pa, pb)
        if want is None:
            continue
        cases.append((_wkt(pa), _wkt(pb), want))
    df = spark.createDataFrame(cases, "a string, b string, want boolean")
    rows = df.withColumn(
        "got", _intersects_col(F.col("a"), F.col("b"))
    ).collect()
    bad = [(r["a"][:60], r["b"][:60], r["want"], r["got"])
           for r in rows if r["got"] != r["want"]]
    assert not bad, f"{len(bad)} divergences, first: {bad[0]}"
