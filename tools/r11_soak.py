"""Round-11 geo re-time (VERDICT r10 #5, second part): the r10
cartesian-broadcast win was measured on a 3-geometry toy store; this
re-times the same self-consumption set-op shape on a ~250k-quad store
(20k facilities) so the claim "the broadcast plan's win holds off the
toy store" is measured, not assumed.

Query shape: two constant-predicate patterns with NO shared variable
(8 zone polygons each side — provably small from load-time stats) and a
geof:union BIND that drags the 5+ MiB geometry-kernel task binary into
every task. With stats the compiler broadcasts one side
(BroadcastNestedLoopJoin, output keeps probe partitioning → a handful
of tasks); without stats it falls back to the cap-squared coalesce
(32² = 1024 tiny tasks at the default 32 shuffle partitions, each
paying full task-binary deserialization — the r10 flake class).

Usage: python tools/r11_soak.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_FACILITIES = 20_000
N_ZONES = 8


def _zones_ttl() -> str:
    from dublin_smart_city_graphdb_spark import fixtures

    lines = [fixtures._PROLOGUE]
    for i in range(N_ZONES):
        x = i * 20.0
        wkt = (f"POLYGON(({x} 0.0, {x + 4.0} 0.0, {x + 4.0} 4.0, "
               f"{x} 4.0, {x} 0.0))")
        wkt2 = (f"POLYGON(({x + 2.0} 0.0, {x + 6.0} 0.0, {x + 6.0} 4.0, "
                f"{x + 2.0} 4.0, {x + 2.0} 0.0))")
        lines.append(
            f'ex:zoneA{i} ex:zoneWKT "{wkt}"^^geo:wktLiteral .\n'
            f'ex:zoneB{i} ex:zoneWKT2 "{wkt2}"^^geo:wktLiteral .'
        )
    return "\n".join(lines) + "\n"


QUERY = """
PREFIX ex: <http://example.org/dcc/facilities#>
PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
SELECT ?u WHERE {
  ?a ex:zoneWKT ?wa .
  ?b ex:zoneWKT2 ?wb .
  BIND(geof:union(?wa, ?wb) AS ?u)
}
"""


def _best_of(fn, rounds=3):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    from dublin_smart_city_graphdb_spark import fixtures
    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.session import get_spark
    from dublin_smart_city_graphdb_spark.sparql.compiler import QueryCompiler
    from dublin_smart_city_graphdb_spark.sparql.parser import parse_query

    spark = get_spark(app_name="r11-geo-soak")
    # NO warehouse: an in-memory quads store is a LogicalRDD whose size
    # Catalyst estimates at the default (huge), so its OWN broadcast
    # heuristics never fire — the r10 flake's exact conditions. A
    # parquet-backed store lets Catalyst auto-broadcast from file stats
    # and both paths coincide (measured 0.9-1.0x); the compiler-level
    # stats bound is the mechanism that works on BOTH store kinds.
    eng = Engine(spark)
    repo = eng.create_repository("geo_scale", ruleset="none",
                                 query_timeout=600.0)
    t0 = time.time()
    repo.load_turtle_text(fixtures.full_fixture_ttl(N_FACILITIES))
    repo.load_turtle_text(_zones_ttl())
    load_s = time.time() - t0
    n_quads = repo.count()

    ast = parse_query(QUERY)

    def run_with_stats():
        df = QueryCompiler(
            spark, repo.quads, predicate_stats=repo.predicate_stats()
        ).compile(ast)
        assert df.count() == N_ZONES * N_ZONES
        return df

    def run_without_stats():
        df = QueryCompiler(spark, repo.quads).compile(ast)
        assert df.count() == N_ZONES * N_ZONES
        return df

    # plan sanity: the stats path must broadcast, the bare path must not
    plan_b = (run_with_stats()._jdf.queryExecution().executedPlan()
              .toString())
    assert "BroadcastNestedLoopJoin" in plan_b
    plan_f = (run_without_stats()._jdf.queryExecution().executedPlan()
              .toString())
    assert "CartesianProduct" in plan_f

    bcast = _best_of(lambda: run_with_stats())
    fallback = _best_of(lambda: run_without_stats())
    print(json.dumps({
        "store_quads": n_quads,
        "load_s": round(load_s, 2),
        "broadcast_s": round(bcast, 2),
        "fallback_s": round(fallback, 2),
        "speedup": round(fallback / bcast, 2),
    }))


if __name__ == "__main__":
    main()
