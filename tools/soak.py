"""Scale soak (VERDICT r4 task 1): time a set of registry queries at two
sf directories and print per-query scaling ratios.

Usage: python tools/soak.py SMALL_DIR BIG_DIR [name ...]
Defaults to bench.py's headline set plus the heaviest pipeline operators.
Per-query time is best-of-3 (same protocol as bench.py); the JSON line at
the end carries {name: {small, big, ratio, rows_small, rows_big}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EXTRA_HEAVY = [
    "dedup_clusters",
    "shard_by_token_budget",
    "events_resample_hourly",
    "text_bm25_search",
    "q9_product_profit",
    "q21_waiting_suppliers",
]


def _time_queries(spark, names, sf_dir, rounds=3):
    from dublin_smart_city_graphdb_spark import harness

    samples = {n: [] for n in names}
    rows = {}
    for _ in range(rounds):
        for n in names:
            fn = harness.REGISTRY[n].fn
            t0 = time.time()
            rows[n] = fn(spark, sf_dir).count()
            samples[n].append(time.time() - t0)
    return {n: min(s) for n, s in samples.items()}, rows


def main() -> None:
    small, big = sys.argv[1], sys.argv[2]
    from bench import HEADLINE

    from dublin_smart_city_graphdb_spark import harness
    from dublin_smart_city_graphdb_spark.session import get_spark

    names = sys.argv[3:] or [
        *HEADLINE,
        *[n for n in EXTRA_HEAVY if n in harness.REGISTRY],
    ]
    spark = get_spark(app_name="soak")
    # warmup (codegen/classloading) at the smallest sf
    warm = "/root/testdata/sf0.001"
    for n in names:
        try:
            harness.REGISTRY[n].fn(spark, warm).count()
        except Exception:
            pass
    from dublin_smart_city_graphdb_spark.harness.sparql_gate import _quads

    _quads(spark, small).count()
    _quads(spark, big).count()

    t_small, r_small = _time_queries(spark, names, small)
    t_big, r_big = _time_queries(spark, names, big)
    out = {}
    for n in names:
        ratio = t_big[n] / t_small[n] if t_small[n] > 0 else -1.0
        out[n] = {
            "small": round(t_small[n], 3),
            "big": round(t_big[n], 3),
            "ratio": round(ratio, 2),
            "rows_small": r_small[n],
            "rows_big": r_big[n],
        }
        print(
            f"# {n}: {t_small[n]:.3f}s -> {t_big[n]:.3f}s  "
            f"x{ratio:.2f}  rows {r_small[n]} -> {r_big[n]}",
            file=sys.stderr, flush=True,
        )
    print(json.dumps({"small_dir": small, "big_dir": big, "queries": out}),
          flush=True)


if __name__ == "__main__":
    main()
