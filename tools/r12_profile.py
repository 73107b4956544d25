"""Round-11 optimization profiler (guide §1: measure first).

Times registry entries at a given sf dir with the noop sink — which
eagerly computes every column of every row (guide §1.4) — so the number
is the computation, not the count()-pruned subtree or a real sink. Each
entry is timed as build+execute per round (plan construction included:
fixpoint operators do real work at build time), best-of-N across
interleaved sweeps, jobs labelled per guide §1.5.

Optionally dumps `.explain("formatted")` per entry to plans/r12/.

Usage::

    python tools/r12_profile.py SF_DIR OUT_JSON [--rounds N]
        [--plans-suffix before|after] [name ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0)
    out_json = args.pop(0)
    rounds = 3
    plans_suffix = None
    names: list[str] = []
    while args:
        a = args.pop(0)
        if a == "--rounds":
            rounds = int(args.pop(0))
        elif a == "--plans-suffix":
            plans_suffix = args.pop(0)
        else:
            names.append(a)

    from dublin_smart_city_graphdb_spark import harness
    from dublin_smart_city_graphdb_spark.session import get_spark

    spark = get_spark(app_name="r12-profile")
    if not names:
        names = sorted(harness.REGISTRY)

    # The quad store is the engine's LOADED state (same rationale as
    # bench.py): build it once outside the timed region.
    from dublin_smart_city_graphdb_spark.harness.sparql_gate import _quads

    _quads(spark, sf_dir).count()

    plans_dir = ROOT / "plans" / "r12"
    if plans_suffix:
        plans_dir.mkdir(parents=True, exist_ok=True)

    samples: dict[str, list[float]] = {n: [] for n in names}
    errs: dict[str, str] = {}
    for rnd in range(rounds):
        for name in names:
            if name in errs:
                continue
            fn = harness.REGISTRY[name].fn
            sc = spark.sparkContext
            sc.setJobDescription(f"r12-profile:{name}")
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:  # record, keep sweeping
                errs[name] = repr(e)[:300]
                continue
            finally:
                sc.setJobDescription(None)
            samples[name].append(time.time() - t0)
            if rnd == 0 and plans_suffix:
                qe = df._jdf.queryExecution()
                mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
                (plans_dir / f"{name}_{plans_suffix}.txt").write_text(
                    qe.explainString(mode)
                )
        print(f"# sweep {rnd + 1}/{rounds} done", file=sys.stderr, flush=True)

    timings = {
        n: round(min(s), 3) for n, s in samples.items() if s
    }
    result = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "total": round(sum(timings.values()), 3),
        "queries": dict(sorted(timings.items(), key=lambda kv: -kv[1])),
        "errors": errs,
    }
    Path(out_json).write_text(json.dumps(result, indent=1))
    for n, t in list(result["queries"].items())[:30]:
        print(f"{t:8.3f}s  {n}", file=sys.stderr)
    print(json.dumps({"total": result["total"], "n": len(timings)}))


if __name__ == "__main__":
    main()
