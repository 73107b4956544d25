"""Watermarked windowed aggregation over event streams (SURVEY §7 M8).

``readStream`` → event-time windows → ``writeStream``; watermarks bound
state so late data is handled without unbounded memory — the shape that
holds on a real cluster ingesting an unbounded feed. Tests drive these with
``trigger(availableNow=True)`` over the driver's static ``events`` parquet,
which must agree with the equivalent batch aggregation (the harness queries
``events_tumbling`` / ``events_sessionize``).

The driver's ``events.parquet`` has shipped ``ts`` as parquet
TIMESTAMP(NANOS) (Spark reads it only as long-ns via ``nanosAsLong``) and as
plain timestamp[us] — same gotcha and same both-encodings fix as the batch
path (harness/registry.py ``load_events``). The file source needs an explicit
schema, so we probe it with a batch footer read first.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan of an events feed directory (the file source watches
    a directory; files arriving later are picked up incrementally) with a
    proper event-time column (``etime``, µs to match the batch/oracle path).

    The streaming file source requires a fixed schema; we take it from a
    batch footer read of the same directory, which also tells us whether
    ``ts`` arrived as long-ns (legacy TIMESTAMP(NANOS) testdata) or as a
    native timestamp column."""
    from ..session import enable_nanos_compat_if_needed

    enable_nanos_compat_if_needed(spark, path)
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).parquet(path)
    return raw.withColumn("etime", _etime_col(schema))


def _etime_col(schema) -> F.Column:
    kind = {f.name: f.dataType.simpleString() for f in schema.fields}["ts"]
    if kind == "bigint":  # legacy TIMESTAMP(NANOS) surfaced as long ns
        return F.timestamp_micros(F.expr("ts div 1000"))
    # Watermarks demand TIMESTAMP (not NTZ). Go through a tz-free µs diff so
    # the naive value is pinned as a UTC instant whatever the session tz.
    # (If ts were ever TIMESTAMP_LTZ, the NTZ cast below would depend on the
    # session tz — safe only under session.py's timeZone=UTC pin.)
    return F.timestamp_micros(
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            "CAST(ts AS TIMESTAMP_NTZ))"
        )
    )


def batch_events_with_etime(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of the same events feed with the identical ``etime``
    derivation — the oracle side for stream-vs-batch equivalence tests."""
    from ..session import enable_nanos_compat_if_needed

    enable_nanos_compat_if_needed(spark, path)
    df = spark.read.parquet(path)
    return df.withColumn("etime", _etime_col(df.schema))


def tumbling_counts_stream(
    events: DataFrame, width: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time windows: count + deterministic value sum per
    (window, event_type). Watermark bounds the window state store."""
    return (
        events.withWatermark("etime", watermark)
        .groupBy(F.window("etime", width).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding windows (overlapping): each event lands in width/slide
    windows; state is bounded by the watermark."""
    return (
        events.withWatermark("etime", watermark)
        .groupBy(F.window("etime", width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session windows (gap-based, variable length) — the
    streaming twin of the batch sessionization harness query."""
    return (
        events.withWatermark("etime", watermark)
        .groupBy(F.session_window("etime", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def dedup_events_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming deduplication by event id, state bounded by the watermark:
    ``dropDuplicatesWithinWatermark`` keeps a key in the state store only
    until the watermark passes it, so re-delivered events (at-least-once
    sources, replayed files) are suppressed without unbounded state — the
    streaming twin of the batch ``dedup_exact`` harness operator. Unlike
    plain ``dropDuplicates`` on a stream, state does NOT grow with the
    lifetime key count: at 100 TB/day of events the store holds only the
    watermark horizon."""
    return events.withWatermark("etime", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def purchase_attribution_stream(
    events: DataFrame, lookback: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each purchase joins every view by the
    same user within the preceding ``lookback`` window. Both sides carry
    watermarks and the join condition bounds event-time distance, so Spark
    can expire buffered rows — the state-bounded form of the batch as-of /
    attribution join (harness ``events_asof_join``)."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("etime").alias("p_time"),
        )
        .withWatermark("p_time", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("v_id"),
            F.col("user_id").alias("v_user"),
            F.col("etime").alias("v_time"),
        )
        .withWatermark("v_time", watermark)
    )
    cond = (
        (purchases["p_user"] == views["v_user"])
        & (views["v_time"] <= purchases["p_time"])
        & (views["v_time"] >= purchases["p_time"] - F.expr(f"INTERVAL {lookback}"))
    )
    return purchases.join(views, cond, "inner").select(
        "p_id", "p_user", "p_time", "v_id", "v_time"
    )


def run_available_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    name: str,
    checkpoint: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain everything currently available (trigger availableNow) into an
    in-memory table and return it as a batch DataFrame. Complete output mode
    (default) because watermarked streaming aggregations emit finalized
    windows only on watermark advance — a one-shot drain would otherwise
    hold every window back in state. Non-aggregating streams (dedup,
    stream-stream joins) use append mode instead."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def enriched_counts_stream(
    events: DataFrame,
    user_dim: DataFrame,
    width: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment: join the event stream against a static
    dimension (re-read per micro-batch; Catalyst broadcasts the small side)
    BEFORE the windowed aggregation, so the state key is the enriched
    attribute — the canonical enrich-then-aggregate streaming shape."""
    return (
        events.join(F.broadcast(user_dim), "user_id", "left")
        .withWatermark("etime", watermark)
        .groupBy(
            F.window("etime", width).alias("w"),
            F.coalesce(F.col("segment"), F.lit("unknown")).alias("segment"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "segment", "n_events")
    )


def anomaly_flags_stream(
    events: DataFrame, stats: DataFrame, threshold: float = 2.5
) -> DataFrame:
    """Streaming twin of the batch ``events_anomaly_zscore``: per-type
    mean/std come from a STATIC stats table (computed over history by the
    batch op — the deployment split every production detector uses:
    model-fit offline, score online). The stream joins the broadcast
    stats per micro-batch and filags |z| > threshold map-side — no
    streaming state at all, so the operator scales with throughput, not
    key cardinality."""
    # nullif: a zero-variance type yields NULL z (filtered out), never a
    # DIVIDE_BY_ZERO under ANSI — mirrors the batch operator
    z = (F.col("value") - F.col("mean")) / F.expr("nullif(std, 0.0D)")
    return (
        events.join(F.broadcast(stats), "event_type")
        .withColumn("z", F.round(z, 6))
        .filter(F.abs(F.col("z")) > threshold)
        .select("event_id", "event_type", "value", "z")
    )
