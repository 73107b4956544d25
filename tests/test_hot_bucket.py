"""Hot-bucket re-spread in the banded-dedup pair scan (round 12, guide
§2.5): past the spread threshold a bucket's quadratic in-task pair scan is
chunked and round-robin repartitioned across tasks; below it, nothing
changes. The chunked path must emit EXACTLY the same pair set."""

from __future__ import annotations

import pyspark.sql.functions as F

from dublin_smart_city_graphdb_spark.harness.pipeline import (
    _PAIR_EXPLODE,
    _bucket_pairs,
)


def _grouped(spark, members_per_bucket):
    rows = [
        (f"b{i}", list(range(i * 10_000, i * 10_000 + n)))
        for i, n in enumerate(members_per_bucket)
    ]
    return spark.createDataFrame(rows, "band string, ds array<bigint>")


def _pairs(df):
    return sorted(
        (r.pr.doc_a, r.pr.doc_b) for r in df.select("pr").collect()
    )


def test_hot_bucket_chunked_pairs_identical(spark):
    """A bucket past the threshold produces the exact same ordered pair
    set through the chunked branch as through the plain scan."""
    g = _grouped(spark, [50, 3])
    plain = _pairs(_bucket_pairs(g, _PAIR_EXPLODE, spread=10_000))
    spread = _pairs(_bucket_pairs(g, _PAIR_EXPLODE, spread=16, chunk=8))
    assert plain == spread
    # 50 members → C(50,2) pairs, 3 members → 3 pairs
    assert len(plain) == 50 * 49 // 2 + 3


def test_hot_bucket_scan_spreads_across_partitions(spark):
    """The chunked branch actually distributes the hot bucket's pair scan:
    its chunk rows land on more than one partition (round-robin), instead
    of the whole O(n²) scan running inside the single bucket task."""
    g = _grouped(spark, [64])
    out = _bucket_pairs(g, _PAIR_EXPLODE, spread=16, chunk=8)
    parts = (
        out.select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert parts >= 2  # 8 chunks round-robined over the cluster


def test_small_buckets_skip_the_spread_branch(spark):
    """Below the threshold the big branch is empty — AQE propagates the
    empty relation and the executed plan degenerates to the unchanged
    single-task scan (no Repartition in the final tree)."""
    g = _grouped(spark, [5, 7])
    df = _bucket_pairs(g, _PAIR_EXPLODE)  # default 4096 threshold
    df.collect()
    final = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "RoundRobinPartitioning" not in final
    assert len(_pairs(df)) == 5 * 4 // 2 + 7 * 6 // 2
