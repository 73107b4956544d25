"""Bucketed time-range (interval) join.

For each probe row, find every build row with the same key whose timestamp
falls in ``[probe.ts + lo, probe.ts + hi]`` — the "context window" join behind
feature windows ("all events in the 10 minutes before each error") and
interval containment analytics. The reference's engine-surface analog is the
theta/range join of SURVEY.md §2.3 J6 (the bounding-box FILTER shape at
``facilities.ttl:211-218`` generalized to two streams).

Spark's built-in answer to a non-equi time predicate is a broadcast
nested-loop or cartesian join — quadratic in the worst case and a
single-stage bottleneck at 100 TB. This module implements the standard
bucketization rewrite (the same trick behind Databricks' range-join hint and
Flink's interval join):

1. Pick a bucket width ``w >= hi - lo``. Probe rows land in bucket
   ``floor(ts / w)``.
2. A build row at time ``t`` can only match probes with ``ts`` in
   ``[t - hi, t - lo]`` — at most TWO consecutive buckets when
   ``w >= hi - lo``. Replicate each build row into exactly the buckets
   ``floor((t - hi) / w) .. floor((t - lo) / w)`` (``F.sequence`` +
   ``explode``; 2 replicas, constant factor).
3. Equi-join on ``(key, bucket)`` — a plain shuffled/broadcast hash join
   Catalyst can plan and AQE can skew-split — then apply the exact range
   predicate as a post-join filter.

Work is |build| × 2 + |matches|, never |probe| × |build|. The join is an
ordinary equi-join, so it shuffles once on ``(key, bucket)`` and co-locates
with any downstream per-key aggregation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _floor_div(c: Column, w: int) -> Column:
    """Exact floor division of an integral column by positive ``w``.

    ``F.floor(c / w)`` routes through DoubleType, which is only exact while
    ``|c| < 2**53`` — ns-epoch timestamps (~1.8e18) would silently mis-bucket.
    Subtracting the (always non-negative) ``pmod`` first makes the numerator an
    exact multiple of ``w``; dividing in decimal(38,0) keeps every long exact.
    """
    exact_multiple = (c - F.pmod(c, F.lit(w))).cast("decimal(38,0)")
    return (exact_multiple / F.lit(w)).cast("long")


def range_join_bucketed(
    probes: DataFrame,
    builds: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    lo: int,
    hi: int,
    bucket_width: int | None = None,
) -> DataFrame:
    """Join rows where ``builds[build_ts]`` ∈ ``[probes[probe_ts]+lo, ...+hi]``
    and the ``key`` columns match. Timestamps are integral (e.g. µs epoch);
    ``lo <= hi``. Returns probe columns + build columns (build ``key`` column
    dropped — it equals the probe's).

    ``bucket_width`` defaults to ``hi - lo`` (minimum width → exactly 2
    replicas per build row). A wider bucket trades replication for coarser
    skew spreading; both are correct.
    """
    if lo > hi:
        raise ValueError(f"empty range: lo={lo} > hi={hi}")
    w = bucket_width if bucket_width is not None else max(hi - lo, 1)
    if w <= 0:
        raise ValueError(f"bucket_width must be positive, got {w}")
    if w < hi - lo:
        raise ValueError(f"bucket_width {w} < window span {hi - lo}")

    p = probes.withColumn("_bkt", _floor_div(F.col(probe_ts), w))
    b = builds.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                _floor_div(F.col(build_ts) - F.lit(hi), w),
                _floor_div(F.col(build_ts) - F.lit(lo), w),
            )
        ),
    ).withColumnRenamed(key, "_bkey")

    joined = p.join(b, (F.col(key) == F.col("_bkey")) & (p["_bkt"] == b["_bkt"])).filter(
        (F.col(build_ts) >= F.col(probe_ts) + F.lit(lo))
        & (F.col(build_ts) <= F.col(probe_ts) + F.lit(hi))
    )
    return joined.drop("_bkt", "_bkey")
