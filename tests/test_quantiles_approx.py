"""The approx-quantile scale path must stay close in RANK to the exact path
(its gate entry is rows-only: sketches have no portable SQL semantics, so
accuracy is asserted here instead).

Spark's approx_percentile (Greenwald-Khanna) returns an OBSERVED value whose
rank is near the target; the exact path (percentile) interpolates between
observations. The faithful assertion is therefore on the empirical rank of
the returned value, not on the interpolated value itself.
"""

from __future__ import annotations

from dublin_smart_city_graphdb_spark import harness
from dublin_smart_city_graphdb_spark.harness.registry import load_events
from tests.conftest import SF_DIR

# GK's formal bound at accuracy=10000 is 1e-4 relative rank error, but Spark's
# post-merge compression is observed a few positions looser on small groups;
# 2% rank slack is tight enough to catch a broken sketch and loose enough not
# to flake (~200 rows/group at sf0.001 → ±4 positions).
RANK_SLACK = 0.02


def test_approx_quantiles_near_exact_rank(spark):
    approx = {
        r["event_type"]: r
        for r in harness.REGISTRY["events_quantiles_approx"].fn(spark, SF_DIR).collect()
    }
    ev = load_events(spark, SF_DIR).select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    assert set(approx) == set(by_type)

    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        for colname, p in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            got = approx[t][colname]
            # empirical rank interval of the returned value (ties widen it)
            lo_rank = sum(1 for v in vals if round(v, 6) < got) / n
            hi_rank = sum(1 for v in vals if round(v, 6) <= got) / n
            assert lo_rank - RANK_SLACK <= p <= hi_rank + RANK_SLACK, (
                t, colname, got, lo_rank, hi_rank,
            )


def test_hll_unique_users_accuracy(spark):
    """The HLL++ sketch estimate must stay within 5x its configured rsd
    (2%) of the exact distinct count on every (hour, event_type) group,
    and the plan must contain exactly ONE exchange (the sketch merges
    map-side — that is its entire point at scale)."""
    from dublin_smart_city_graphdb_spark import harness
    from tests.conftest import SF_DIR

    exact = {
        (r["hour_idx"], r["event_type"]): r["unique_users"]
        for r in harness.REGISTRY["events_unique_users_hourly"]
        .fn(spark, SF_DIR)
        .collect()
    }
    approx_df = harness.REGISTRY["events_unique_users_approx"].fn(spark, SF_DIR)
    approx = {
        (r["hour_idx"], r["event_type"]): r["unique_users"]
        for r in approx_df.collect()
    }
    assert set(exact) == set(approx)
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(1, 0.10 * ex), (k, ex, approx[k])
    plan = (
        approx_df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]  # AQE echoes the pre-adaptive plan
    )
    assert plan.count("Exchange hashpartitioning") == 1
