"""Round-12 construction/execution split profiler (guide §1).

For each named registry entry, times separately:
  - build: raw_fn(spark, sf_dir) — Python Column-tree construction +
    Catalyst analysis (Py4J-chatty part)
  - exec1: first noop-sink write (optimize + codegen + run)
  - exec2: second noop-sink write of the SAME DataFrame (run again —
    isolates steady-state execution from one-off optimize/codegen)

Usage::

    python tools/r12_split.py SF_DIR [name ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    from dublin_smart_city_graphdb_spark import harness
    from dublin_smart_city_graphdb_spark.session import get_spark

    spark = get_spark(app_name="r12-split")
    from dublin_smart_city_graphdb_spark.harness.sparql_gate import _quads

    _quads(spark, sf_dir).count()

    out = {}
    for name in names:
        q = harness.REGISTRY[name]
        fn = q.raw_fn or q.fn
        sc = spark.sparkContext
        sc.setJobDescription(f"r12-split:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        sc.setJobDescription(None)
        out[name] = {
            "build": round(t1 - t0, 3),
            "exec1": round(t2 - t1, 3),
            "exec2": round(t3 - t2, 3),
        }
        print(f"# {name}: build={out[name]['build']}s "
              f"exec1={out[name]['exec1']}s exec2={out[name]['exec2']}s",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
