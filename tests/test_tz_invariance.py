"""Timestamp-reading invariance: results must not depend on HOW a session
surfaces the testdata's naive parquet timestamps.

Driver testdata stores isAdjustedToUTC=false micros. The default session
(inferTimestampNTZ on) reads TIMESTAMP_NTZ; a session with the flag off
reads TIMESTAMP_LTZ, where every rendering/extraction (year, to_date,
window, hour) silently shifts with the session timezone. r3's one driver-red
row (q12_late_lines) was exactly this class of divergence, and a hostile
sweep found 21 queries red under LTZ + America/New_York before
registry._restore_wall_time. This test re-runs that formerly-red set (plus
q12) under the hostile configuration against the DuckDB oracle — pinning
that the loaders' wall-time restoration keeps every query bit-identical to
the naive-timestamp oracle under ANY reading mode.
"""

from __future__ import annotations

import pytest

from tools.check_oracle import compare

# every query the pre-fix hostile sweep flagged, plus q12 (the r3 driver-red
# row) and one representative per date-deriving family
FORMERLY_RED = [
    "q12_late_lines",
    "q6_forecast_revenue",
    "scalar_datetime",
    "q14_promo_revenue",
    "q15_top_supplier",
    "events_tumbling",
    "events_sliding",
    "events_sessionize",
    "events_sessionize_bucketed",
    "events_asof_join",
    "events_asof_join_bucketed",
    "events_rolling_avg",
    "events_top_users_hourly",
    "events_unique_users_hourly",
    "events_funnel",
    "events_retention",
    "events_ohlc_hourly",
    "events_resample_hourly",
    "events_activity_bursts",
    "user_activity_features",
    "events_interarrival",
]

SF_DIR = "/root/testdata/sf0.001"


# Driver-window hygiene (round 12, VERDICT r11 item 6): hostile-session timestamp sweep (extra sessions) —
# slow-gate class, excluded from the default suite so the driver's
# verify completes inside its window; run with `-m slow` (the round
# close does).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def hostile_session(spark):
    """Flip the shared session into the hostile reading mode (LTZ + non-UTC
    tz), restoring afterwards. Runtime SQL confs, so no new JVM needed."""
    saved_tz = spark.conf.get("spark.sql.session.timeZone")
    saved_ntz = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", saved_tz)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", saved_ntz)


@pytest.mark.parametrize("name", FORMERLY_RED)
def test_matches_oracle_under_ltz_reading(hostile_session, duck, name):
    import dublin_smart_city_graphdb_spark.harness as harness

    q = harness.REGISTRY[name]
    assert q.oracle is not None, f"{name} lost its oracle"
    # raw_fn: bypass the plan cache — a plan compiled under the default
    # reading mode must not leak into the hostile-session run
    res = compare(name, hostile_session, duck, SF_DIR, q.raw_fn, q.oracle)
    assert res.ok, f"{name} diverges under LTZ reading: {res.msg}"
