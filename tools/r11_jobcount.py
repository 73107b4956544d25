"""Deterministic scheduler-load counter for round-11 optimization work.

Wall-clock on a shared box is noisy; the number of Spark jobs, stages and
tasks a flow schedules is not. This tool runs registry entries (or the
named built-in flows) and reports those counts per entry — the direct
measure of fixed scheduling overhead that dominates iterative/fixpoint
operators at small scale and is pure waste at any scale.

Usage::

    python tools/r11_jobcount.py SF_DIR [name ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def counters(spark):
    st = spark.sparkContext.statusTracker()
    jobs = st.getJobIdsForGroup(None) or []
    stages, tasks = 0, 0
    for j in jobs:
        ji = st.getJobInfo(j)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = st.getStageInfo(sid)
            if si is not None:
                stages += 1
                tasks += si.numTasks
    return len(jobs), stages, tasks


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    from dublin_smart_city_graphdb_spark import harness
    from dublin_smart_city_graphdb_spark.session import get_spark

    spark = get_spark(
        app_name="r11-jobcount",
        extra_conf={
            "spark.ui.retainedJobs": "100000",
            "spark.ui.retainedStages": "100000",
        },
    )
    from dublin_smart_city_graphdb_spark.harness.sparql_gate import _quads

    _quads(spark, sf_dir).count()

    out = {}
    for name in names:
        j0, s0, t0 = counters(spark)
        w0 = time.time()
        df = harness.REGISTRY[name].raw_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - w0
        j1, s1, t1 = counters(spark)
        out[name] = {
            "jobs": j1 - j0,
            "stages": s1 - s0,
            "tasks": t1 - t0,
            "wall": round(wall, 2),
        }
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
