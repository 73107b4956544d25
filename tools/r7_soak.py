"""Round-7 scale-behavior soaks (VERDICT r6 tasks 1 and 7).

Two experiments, each printed as one JSON line for PERFORMANCE.md:

1. **Bound-endpoint property paths**: a store of K disjoint chain
   components (length L). `ex:c0_n0 ex:next+ ?x` must cost O(one
   component) — growing K 10× should leave the bound query ~flat while
   the all-pairs closure grows ~linearly in K.
2. **rdf:type skew salting**: a store dominated by one class; the
   class-variable self-join `?x a ?t . ?y a ?t` with broadcast disabled
   (the 100 TB shape — both sides too big to broadcast) compared salted
   vs unsalted: same row count, wall-clock ratio reported.

Usage: python tools/r7_soak.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _quads(spark, rows):
    from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA

    return spark.createDataFrame(
        [(None, s, p, 0, o, None, None, None, None, None)
         for s, p, o in rows],
        QUAD_SCHEMA,
    ).localCheckpoint(eager=True)


def _compile(spark, quads, q, stats=None):
    from dublin_smart_city_graphdb_spark.sparql.compiler import QueryCompiler
    from dublin_smart_city_graphdb_spark.sparql.parser import parse_query

    return QueryCompiler(
        spark, quads, predicate_stats=stats or {}
    ).compile(parse_query(q))


def chain_store(spark, k: int, length: int):
    rows = [
        (f"urn:c{c}_n{i}", "urn:next", f"urn:c{c}_n{i + 1}")
        for c in range(k)
        for i in range(length)
    ]
    return _quads(spark, rows)


def bound_path_soak(spark) -> dict:
    out = {}
    for k in (200, 2000):
        quads = chain_store(spark, k, 50)
        t0 = time.time()
        n_bound = _compile(
            spark, quads,
            "SELECT ?x WHERE { <urn:c0_n0> <urn:next>+ ?x }",
        ).count()
        t_bound = time.time() - t0
        t0 = time.time()
        n_all = _compile(
            spark, quads, "SELECT ?a ?b WHERE { ?a <urn:next>+ ?b }"
        ).count()
        t_all = time.time() - t0
        out[f"k{k}"] = {
            "bound_rows": n_bound, "bound_s": round(t_bound, 2),
            "allpairs_rows": n_all, "allpairs_s": round(t_all, 2),
        }
    out["bound_ratio_10x_graph"] = round(
        out["k2000"]["bound_s"] / out["k200"]["bound_s"], 2
    )
    out["allpairs_ratio_10x_graph"] = round(
        out["k2000"]["allpairs_s"] / out["k200"]["allpairs_s"], 2
    )
    return out


def skew_salt_soak(spark) -> dict:
    n_hot = 20000
    rows = [(f"urn:i{i}", RDF_TYPE, "urn:Hot") for i in range(n_hot)]
    rows += [(f"urn:j{i}", RDF_TYPE, "urn:Cold") for i in range(20)]
    quads = _quads(spark, rows)
    q = "SELECT ?x ?y WHERE { ?x a ?t . ?y a ?t . }"
    dominant = {RDF_TYPE: len(rows)}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        def best_of(stats, rounds=3):
            best = None
            for _ in range(rounds):
                t0 = time.time()
                n = _compile(spark, quads, q, stats=stats).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return n, best

        n_plain, t_plain = best_of(None)
        n_salted, t_salted = best_of(dominant)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert n_plain == n_salted == n_hot * n_hot + 400, (n_plain, n_salted)
    return {
        "rows": n_plain,
        "unsalted_s": round(t_plain, 2),
        "salted_s": round(t_salted, 2),
        "speedup": round(t_plain / t_salted, 2),
    }


def main() -> None:
    from dublin_smart_city_graphdb_spark.session import get_spark

    spark = get_spark(app_name="r7-soak")
    print(json.dumps({"bound_path": bound_path_soak(spark)}))
    print(json.dumps({"skew_salt": skew_salt_soak(spark)}))


if __name__ == "__main__":
    main()
