"""Bucketed-layout plan contracts: the write-once / shuffle-never property
that makes repeated fact-fact joins viable at 100 TB (SURVEY §4; the
layout-decision analogue of the reference's predicate lists,
init-graphdb.sh:61-65)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dublin_smart_city_graphdb_spark.operators.bucketing import (
    drop_bucketed,
    write_bucketed,
)
from tests.conftest import SF_DIR


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force the shuffle-join path: at fixture scale the planner would
    broadcast the small side and skip bucketed reads entirely (at real
    scale neither side broadcasts — this pins THAT regime's plan)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    ob = write_bucketed(
        o, "orders_b", ["o_orderkey"], 8, path=str(base / "orders_b")
    )
    lb = write_bucketed(
        li, "lineitem_b", ["l_orderkey"], 8, path=str(base / "lineitem_b")
    )
    yield ob, lb
    drop_bucketed(spark, "orders_b", "lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed, no_broadcast):
    """orders ⋈ lineitem on the bucket key: both scans carry the bucket
    spec, so the sort-merge join runs with ZERO shuffle — the plan a
    100 TB nightly join needs."""
    ob, lb = bucketed
    j = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
        "o_orderkey", "l_quantity"
    )
    plan = plan_of(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # and the result is right
    assert j.count() == spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()


def test_bucketed_aggregation_has_no_exchange(spark, bucketed, no_broadcast):
    """groupBy on the bucket key is satisfied by the write-time hash
    distribution — no exchange before the final aggregate."""
    _, lb = bucketed
    agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = plan_of(agg)
    assert "Exchange" not in plan


def test_bucket_pruning_on_point_lookup(spark, bucketed, no_broadcast):
    """A point filter on the bucket key reads 1 of 8 buckets — the scan
    reports SelectedBucketsCount before any IO happens. (The
    DisableUnnecessaryBucketedScan rule keeps bucketed reads only for
    distribution requirements; turn the auto rule off so filter-only
    pruning — the point-lookup path — stays visible.)"""
    ob, _ = bucketed
    key = ob.select("o_orderkey").head()[0]
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        plan = plan_of(ob.filter(F.col("o_orderkey") == key))
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
    assert "SelectedBucketsCount: 1 out of 8" in plan


def test_unbucketed_join_does_shuffle(spark, no_broadcast):
    """Contrast: the same join over plain parquet shuffles both sides —
    this is what bucketing removes."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    j = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "l_quantity"
    )
    assert "Exchange hashpartitioning" in plan_of(j)
