"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Timing excludes SparkSession startup (the reference's own envelope separates
its 60s startup budget from the 30s query budget, BASELINE.md); each query is
timed end-to-end including result materialization (count/collect).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: one per operator family — joins, agg, windows, dedup,
# similarity, text, sessionization, closure.
HEADLINE = [
    "bgp_join_chain",
    "q1_pricing_summary",
    "top_k_orders",
    "anti_join_no_orders",
    "optional_left_join",
    "window_rank_orders",
    "graph_transitive_closure",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "sparql_bgp_region_rollup",
    "text_quality",
    "text_fingerprint",
    "events_sessionize",
    "events_tumbling",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from dublin_smart_city_graphdb_spark import harness
    from dublin_smart_city_graphdb_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # JVM/codegen warmup: run every headline query once at the smallest SF so
    # per-query numbers measure the plan, not first-call class loading /
    # whole-stage-codegen compilation (same separation the reference draws
    # between its 60s startup budget and its 30s query budget, BASELINE.md).
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            harness.REGISTRY[name].fn(spark, warm_dir).count()
        except Exception:
            pass
    # The SPARQL quad store is the engine's LOADED state: the reference bulk
    # loads triples at init time (init-graphdb.sh POST), outside its query
    # timeout. Materialize it for the bench SF up front so SPARQL timings
    # measure query execution, not the one-off RDF-ization of the tables.
    from dublin_smart_city_graphdb_spark.harness.sparql_gate import _quads

    _quads(spark, sf_dir).count()

    # Best-of-N across INTERLEAVED passes (VERDICT r3 task 8): a transient
    # load spike on the box hits one pass, not one query's only samples —
    # per-query min over the sweeps is what the plan actually costs.
    # (The driver's r03 file showed 3× phantom regressions on two dedup
    # queries that a back-to-back idle re-run couldn't reproduce.)
    # Round 12 (VERDICT r11 item 8, additions-only): 5 sweeps instead of 3
    # — r11's 32-core run was contaminated by ambient load (13 s first
    # samples on 1.2 s queries); min-of-5 survives one loaded sweep. The
    # min statistic and everything else are unchanged, so round-over-round
    # comparisons stay valid.
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    rows: dict[str, int] = {}
    for _ in range(5):
        for name in HEADLINE:
            fn = harness.REGISTRY[name].fn
            t0 = time.time()
            df = fn(spark, sf_dir)
            rows[name] = df.count()
            samples[name].append(time.time() - t0)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(min(samples[name]), 3)
        print(
            f"# {name}: {timings[name]:.3f}s ({rows[name]} rows, "
            f"samples {['%.3f' % s for s in samples[name]]})",
            file=sys.stderr, flush=True,
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
