"""As-of (point-in-time) join strategies.

For each left ("taker") row, find the most recent right ("giver") row with
the same key and ``giver.ts <= taker.ts`` — the leak-free feature-lookup join
training pipelines need. Spark has no native ASOF JOIN; two compositions:

``asof_union_window`` — tag both sides, one window partitioned by key,
carry the last giver forward (``last(..., ignorenulls)``). ONE shuffle,
linear work, but a window partition is a single task: one power-law-heavy
key (a user with 10^8 events at 100 TB) serializes on one core.

``asof_bucketed`` — the skew-resilient form. Rows hash by ``(key,
time-bucket)`` so a heavy key spreads across buckets; an in-bucket window
resolves same-bucket matches, and a second, tiny window over per-bucket
giver summaries (|keys × buckets| rows, not |events|) carries the last
giver of any PRIOR bucket into buckets without an in-bucket match. Work
stays linear and the widest partition is one bucket of one key.

Tie-break on equal timestamps (inclusive ``<=``, giver-before-taker) is
"greatest value wins" in both forms — orderBy (ts, side, value) in the
windows, max(struct(ts, value)) in the summaries — so results are
deterministic and partitioning-invariant.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def _tagged_union(
    takers: DataFrame, givers: DataFrame, key: str, ts: str, val: str
) -> DataFrame:
    """Union with a side marker; takers keep their id columns, givers keep
    the value column. Taker rows sort AFTER same-ts giver rows (side 1 > 0)
    so the inclusive `<=` semantics fall out of the window frame."""
    t = takers.select(
        "*",
        F.lit(None).cast("double").alias("_g_val"),
        F.lit(1).alias("_side"),
    )
    id_cols = [c for c in takers.columns if c not in (key, ts)]
    g = givers.select(
        *[F.lit(None).cast(dict(takers.dtypes)[c]).alias(c) for c in id_cols],
        F.col(key),
        F.col(ts),
        F.col(val).cast("double").alias("_g_val"),
        F.lit(0).alias("_side"),
    ).select(*t.columns)
    return t.unionByName(g)


def asof_union_window(
    takers: DataFrame,
    givers: DataFrame,
    key: str,
    ts: str,
    val: str,
    out_ts: str = "matched_ts",
    out_val: str = "matched_value",
) -> DataFrame:
    """Single-window as-of join (one shuffle on ``key``)."""
    u = _tagged_union(takers, givers, key, ts, val)
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side", "_g_val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g_ts = F.when(F.col("_side") == 0, F.col(ts))
    g_val = F.when(F.col("_side") == 0, F.col("_g_val"))
    return (
        u.select(
            *takers.columns,
            "_side",
            F.last(g_ts, ignorenulls=True).over(w).alias(out_ts),
            F.last(g_val, ignorenulls=True).over(w).alias(out_val),
        )
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def asof_bucketed(
    takers: DataFrame,
    givers: DataFrame,
    key: str,
    ts: str,
    val: str,
    bucket_width: int,
    out_ts: str = "matched_ts",
    out_val: str = "matched_value",
) -> DataFrame:
    """Skew-resilient as-of join: partition by ``(key, ts div bucket_width)``.

    1. In-bucket pass: the union-window trick per (key, bucket) — resolves
       every taker whose most recent giver lives in its own bucket.
    2. Carry pass: per-bucket giver summaries (last giver = max (ts, val)
       struct), then a prefix window per key over the DISTINCT buckets
       actually present carries the most recent prior-bucket giver into
       each bucket. This window's input is |key × buckets|, orders of
       magnitude smaller than the event stream.
    3. Resolve: in-bucket match if present, else the bucket's carry-in.
    """
    u = _tagged_union(takers, givers, key, ts, val).withColumn(
        "_bkt", (F.col(ts) / F.lit(bucket_width)).cast("long")
    )
    w_in = (
        Window.partitionBy(key, "_bkt")
        .orderBy(ts, "_side", "_g_val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g_ts = F.when(F.col("_side") == 0, F.col(ts))
    g_val = F.when(F.col("_side") == 0, F.col("_g_val"))
    staged = u.select(
        *takers.columns,
        "_bkt",
        "_side",
        F.last(g_ts, ignorenulls=True).over(w_in).alias("_in_ts"),
        F.last(g_val, ignorenulls=True).over(w_in).alias("_in_val"),
    ).filter(F.col("_side") == 1)

    # Per-(key, bucket) last giver; prefix-carry over STRICTLY PRIOR buckets.
    summaries = (
        u.filter(F.col("_side") == 0)
        .groupBy(key, "_bkt")
        .agg(F.max(F.struct(F.col(ts), F.col("_g_val"))).alias("_last_g"))
    )
    all_buckets = u.select(key, "_bkt").distinct()
    w_carry = (
        Window.partitionBy(key)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        all_buckets.join(summaries, [key, "_bkt"], "left")
        .select(
            key,
            "_bkt",
            F.last("_last_g", ignorenulls=True).over(w_carry).alias("_carry"),
        )
    )
    resolved = staged.join(carry, [key, "_bkt"], "left").select(
        *takers.columns,
        F.coalesce(F.col("_in_ts"), F.col(f"_carry.{ts}")).alias(out_ts),
        F.coalesce(F.col("_in_val"), F.col("_carry._g_val")).alias(out_val),
    )
    return resolved
