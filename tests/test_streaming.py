"""Structured Streaming surface (SURVEY §7 M8): windowed event aggregation
agrees with the batch equivalent; incremental N-Triples ingest is
exactly-once across runs."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dublin_smart_city_graphdb_spark.engine import Engine
from dublin_smart_city_graphdb_spark.streaming.events import (
    batch_events_with_etime,
    run_available_to_memory,
    session_counts_stream,
    stream_events,
    tumbling_counts_stream,
)
from dublin_smart_city_graphdb_spark.streaming.ingest import StreamingTripleIngest
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"


@pytest.fixture()
def events_dir(tmp_path):
    # The streaming file source watches a DIRECTORY (files arrive over
    # time); the driver testdata is a single parquet file, so stage it.
    d = tmp_path / "events_feed"
    d.mkdir()
    (d / "events.parquet").symlink_to(EVENTS)
    return str(d)


def test_tumbling_stream_matches_batch(spark, tmp_path, events_dir):
    ev = stream_events(spark, events_dir)
    out = run_available_to_memory(
        spark,
        tumbling_counts_stream(ev),
        "t_tumbling",
        str(tmp_path / "ckpt"),
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in out.collect()
    }
    # batch equivalent over the same file
    batch = (
        batch_events_with_etime(spark, EVENTS)
        .groupBy(F.window("etime", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sv"),
        )
    )
    want = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["sv"]) for r in batch.collect()
    }
    assert got == want
    assert len(got) > 0


def test_session_stream_matches_batch(spark, tmp_path, events_dir):
    ev = stream_events(spark, events_dir)
    out = run_available_to_memory(
        spark,
        session_counts_stream(ev),
        "t_sessions",
        str(tmp_path / "ckpt"),
    )
    batch = (
        batch_events_with_etime(spark, EVENTS)
        .groupBy(F.session_window("etime", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    got = {(r["session_start"], r["user_id"]): r["n_events"] for r in out.collect()}
    want = {(r["w"]["start"], r["user_id"]): r["n"] for r in batch.collect()}
    assert got == want


def test_streaming_ntriples_ingest_incremental(spark, tmp_path):
    eng = Engine(spark)
    repo = eng.create_repository("stream_ingest", ruleset="none")
    repo._quads = None
    in_dir = tmp_path / "feed"
    in_dir.mkdir()
    (in_dir / "batch1.nt").write_text(
        '<http://s#a> <http://s#p> <http://s#b> .\n'
        '<http://s#a> <http://s#name> "Alpha" .\n'
    )
    ing = StreamingTripleIngest(repo, str(in_dir), str(tmp_path / "ckpt"))
    ing.run_available()
    assert repo.count() == 2

    # second run with no new files: exactly-once, nothing re-ingested
    ing.run_available()
    assert repo.count() == 2

    # drop a new file; only it is picked up
    (in_dir / "batch2.nt").write_text(
        '<http://s#c> <http://s#p> <http://s#d> .\n'
    )
    ing.run_available()
    assert repo.count() == 3
    rows = repo.sparql_collect(
        "SELECT ?o WHERE { <http://s#a> <http://s#name> ?o }"
    )
    assert [r["o"].lex for r in rows] == ["Alpha"]


def test_stateful_budget_alerts_across_restarts(spark, tmp_path):
    """applyInPandasWithState: the per-user accumulator survives micro-batch
    boundaries AND a query restart (same checkpoint), and the emitted alerts
    equal a batch replay of the same logic."""
    import pandas as pd

    from dublin_smart_city_graphdb_spark.streaming.stateful import (
        ALERT_SCHEMA,
        budget_alerts_stream,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # Deterministic per-user event series; file 1 strictly precedes file 2
    # in event time (file-source ordering contract).
    def mk(rows):
        return pd.DataFrame(
            rows, columns=["event_id", "ts_us", "user_id", "value"]
        ).astype({"event_id": "int64", "ts_us": "int64", "user_id": "int64"})

    batch1 = mk([(i, 1_000_000 * i, i % 3, 40.0 + i) for i in range(12)])
    batch2 = mk([(i, 1_000_000 * i, i % 3, 40.0 + i) for i in range(12, 24)])

    schema = "event_id long, ts_us long, user_id long, value double"

    out_dir = str(tmp_path / "alerts_out")

    def drain():
        # File sink (not memory): restart-from-checkpoint requires a
        # fault-tolerant sink, and exercising recovery is the point here.
        stream = spark.readStream.schema(schema).parquet(str(feed))
        q = (
            budget_alerts_stream(stream, threshold=100.0)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(ALERT_SCHEMA).parquet(out_dir).collect()

    batch1.to_parquet(feed / "b1.parquet")
    alerts1 = drain()
    batch2.to_parquet(feed / "b2.parquet")
    both = drain()  # same checkpoint: state + file log resume
    alerts2 = [r for r in both if r not in alerts1]

    got = sorted(
        (r.user_id, r.event_id, r.threshold_multiple) for r in both
    )

    # Batch replay of the same semantics.
    expected = []
    allrows = pd.concat([batch1, batch2]).sort_values(["ts_us", "event_id"])
    totals: dict[int, float] = {}
    for _, r in allrows.iterrows():
        t = totals.get(r.user_id, 0.0)
        before = int(t // 100.0)
        t += r.value
        totals[r.user_id] = t
        after = int(t // 100.0)
        if after > before:
            expected.append((int(r.user_id), int(r.event_id), after))
    assert got == sorted(expected)
    assert len(got) > 0
    # alerts fired in BOTH runs → state genuinely crossed the restart
    assert alerts1 and alerts2


def test_stream_static_enrichment_matches_batch(spark, tmp_path, events_dir):
    """Stream-static join before the windowed agg: results equal the same
    enrichment done in batch."""
    from dublin_smart_city_graphdb_spark.streaming.events import (
        enriched_counts_stream,
    )

    dim = spark.createDataFrame(
        [(i, "high" if i % 3 == 0 else "low") for i in range(40)],
        "user_id long, segment string",
    )
    ev = stream_events(spark, events_dir)
    out = run_available_to_memory(
        spark,
        enriched_counts_stream(ev, dim),
        "t_enriched",
        str(tmp_path / "ckpt_enrich"),
    )
    got = {
        (r.window_start, r.segment): r.n_events for r in out.collect()
    }
    assert got

    batch = (
        batch_events_with_etime(spark, events_dir)
        .join(F.broadcast(dim), "user_id", "left")
        .groupBy(
            F.window("etime", "1 hour").alias("w"),
            F.coalesce(F.col("segment"), F.lit("unknown")).alias("segment"),
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "segment", "n")
    )
    expected = {(r.ws, r.segment): r.n for r in batch.collect()}
    assert got == expected


def test_streaming_dedup_suppresses_redelivery(spark, tmp_path):
    from dublin_smart_city_graphdb_spark.streaming.events import dedup_events_stream

    # A feed where every event is delivered twice (at-least-once source).
    d = tmp_path / "dup_feed"
    d.mkdir()
    (d / "a.parquet").symlink_to(EVENTS)
    (d / "b.parquet").symlink_to(EVENTS)
    ev = stream_events(spark, str(d))
    out = run_available_to_memory(
        spark,
        dedup_events_stream(ev),
        "t_dedup_stream",
        str(tmp_path / "ckpt_dedup"),
        output_mode="append",
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    n_distinct = spark.read.parquet(EVENTS).select("event_id").distinct().count()
    assert out.count() == n_distinct
    assert out.select("event_id").distinct().count() == n_distinct


def test_stream_stream_interval_join_matches_batch(spark, tmp_path, events_dir):
    from dublin_smart_city_graphdb_spark.streaming.events import (
        purchase_attribution_stream,
    )

    ev = stream_events(spark, events_dir)
    out = run_available_to_memory(
        spark,
        purchase_attribution_stream(ev),
        "t_attr_join",
        str(tmp_path / "ckpt_attr"),
        output_mode="append",
    )
    got = {(r["p_id"], r["v_id"]) for r in out.collect()}

    b = batch_events_with_etime(spark, EVENTS)
    p = b.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("etime").alias("p_time"),
    )
    v = b.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("etime").alias("v_time"),
    )
    want_df = p.join(
        v,
        (p["p_user"] == v["v_user"])
        & (v["v_time"] <= p["p_time"])
        & (v["v_time"] >= p["p_time"] - F.expr("INTERVAL 1 hour")),
        "inner",
    )
    want = {(r["p_id"], r["v_id"]) for r in want_df.collect()}
    assert got == want
    assert len(got) > 0


def test_anomaly_flags_stream_matches_batch(spark, tmp_path, events_dir):
    """Streaming anomaly flags (static-stats broadcast join, stateless)
    agree exactly with the batch z-score operator on the same events."""
    import pyspark.sql.functions as F

    from dublin_smart_city_graphdb_spark.streaming.events import (
        anomaly_flags_stream,
        batch_events_with_etime,
        run_available_to_memory,
        stream_events,
    )
    from tests.conftest import SF_DIR

    batch = batch_events_with_etime(spark, events_dir)
    dec = F.col("value").cast("decimal(18,6)")
    stats = (
        batch.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec).cast("double").alias("s"),
            F.sum(dec * dec).cast("double").alias("sq"),
        )
        .select(
            "event_type",
            (F.col("s") / F.col("n")).alias("mean"),
            F.sqrt(
                F.col("sq") / F.col("n")
                - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n"))
            ).alias("std"),
        )
    )
    stream = stream_events(spark, events_dir)
    got = run_available_to_memory(
        spark,
        anomaly_flags_stream(stream, stats),
        "t_anomaly",
        str(tmp_path / "ckpt_anomaly"),
        output_mode="append",
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    want = (
        batch.join(F.broadcast(stats), "event_type")
        .withColumn("z", F.round(z, 6))
        .filter(F.abs(F.col("z")) > 2.5)
        .select("event_id", "event_type", "value", "z")
    )
    got_rows = sorted(map(tuple, got.select("event_id", "z").collect()))
    want_rows = sorted(map(tuple, want.select("event_id", "z").collect()))
    assert got_rows == want_rows and len(got_rows) > 0


def test_quality_filter_stream_matches_batch(spark, tmp_path):
    """The streaming quality filter (stateless, per-micro-batch map-side
    rules) emits column-for-column what the batch corpus_filter_rules
    operator computes over the same documents."""
    from dublin_smart_city_graphdb_spark.harness import REGISTRY
    from dublin_smart_city_graphdb_spark.streaming.documents import (
        quality_filter_stream,
        stream_documents,
    )
    from dublin_smart_city_graphdb_spark.streaming.events import (
        run_available_to_memory,
    )
    from tests.conftest import SF_DIR

    feed = tmp_path / "docs_feed"
    feed.mkdir()
    (feed / "documents.parquet").symlink_to(f"{SF_DIR}/documents.parquet")

    got = run_available_to_memory(
        spark,
        quality_filter_stream(stream_documents(spark, str(feed))),
        "t_qfilter",
        str(tmp_path / "ckpt_qfilter"),
        output_mode="append",
    )
    want = REGISTRY["corpus_filter_rules"].raw_fn(spark, SF_DIR)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.columns == want.columns


def test_funnel_stream_matches_batch_semantics(spark, tmp_path):
    """Streaming funnel: per-user (first_signup, first_conversion-within-24h)
    state across micro-batches; the last emission per user equals the batch
    events_funnel semantics replayed over the full series. Covers: purchase
    BEFORE signup (ignored), purchase past the 24 h window (ignored),
    conversion arriving in a LATER micro-batch than the signup."""
    import pandas as pd

    from dublin_smart_city_graphdb_spark.streaming.stateful import (
        FUNNEL_SCHEMA,
        FUNNEL_WINDOW_US,
        funnel_stream,
    )

    H = 3_600_000_000  # 1h in us
    rows1 = [
        # u1: purchase before signup (must not count), then signup
        (1, 1 * H, 1, "purchase"),
        (2, 2 * H, 1, "signup"),
        # u2: signup only in batch 1
        (3, 3 * H, 2, "signup"),
        # u3: no signup ever → excluded
        (4, 4 * H, 3, "purchase"),
    ]
    rows2 = [
        # u1: converts within 24h of its signup
        (5, 20 * H, 1, "purchase"),
        # u2: first purchase lands PAST the 24h window → no conversion
        (6, (3 + 25) * H, 2, "purchase"),
        # u3: still signup-less
        (7, 30 * H, 3, "view"),
    ]

    def mk(rows):
        return pd.DataFrame(
            rows, columns=["event_id", "ts_us", "user_id", "event_type"]
        ).astype({"event_id": "int64", "ts_us": "int64", "user_id": "int64"})

    feed = tmp_path / "feed"
    feed.mkdir()
    out_dir = str(tmp_path / "funnel_out")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts_us long, user_id long, event_type string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(feed))
        q = (
            funnel_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(FUNNEL_SCHEMA).parquet(out_dir).collect()

    mk(rows1).to_parquet(feed / "b1.parquet")
    first = drain()
    mk(rows2).to_parquet(feed / "b2.parquet")
    both = drain()

    # most-refined emission per user: fs never changes and conv is set at
    # most once, so the row with a conversion (if any) is the final state
    # (collect() order over the file sink is not chronological)
    final = {}
    for r in both:
        cur = final.get(r.user_id)
        if cur is None or (cur[1] is None and r.first_conversion_us is not None):
            final[r.user_id] = (r.first_signup_us, r.first_conversion_us)

    assert final == {
        1: (2 * H, 20 * H),  # converted within window
        2: (3 * H, None),  # purchase too late
        # user 3 absent: never signed up
    }
    # the signup-only state row was emitted in run 1, refined in run 2 —
    # state genuinely crossed the micro-batch/restart boundary
    assert any(r.user_id == 1 and r.first_conversion_us is None for r in first)
    assert (20 * H - 2 * H) <= FUNNEL_WINDOW_US


def test_bursts_stream_matches_batch_range_frame(spark, tmp_path):
    """Streaming burst detector: per-user trailing-1h timestamp list in the
    state store; alerts equal the batch events_activity_bursts RANGE-frame
    count replayed over the full (tie-free) series, including a burst whose
    third event arrives in a LATER micro-batch than the first two."""
    import pandas as pd

    from dublin_smart_city_graphdb_spark.streaming.stateful import (
        BURST_SCHEMA,
        bursts_stream,
    )

    M = 60_000_000  # 1 min in us
    rows1 = [
        (1, 10 * M, 1),
        (2, 30 * M, 1),
        (3, 10 * M, 2),  # u2: lone event, never bursts
    ]
    rows2 = [
        (4, 50 * M, 1),   # u1: [10,30,50] within 1h → burst_n=3
        (5, 75 * M, 1),   # window [15,75] keeps 30,50,75 → burst_n=3
        (6, 200 * M, 1),  # pruned window → just itself, no alert
    ]

    def mk(rows):
        return pd.DataFrame(
            rows, columns=["event_id", "ts_us", "user_id"]
        ).astype("int64")

    feed = tmp_path / "feed"
    feed.mkdir()
    out_dir = str(tmp_path / "bursts_out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(
            "event_id long, ts_us long, user_id long"
        ).parquet(str(feed))
        q = (
            bursts_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(BURST_SCHEMA).parquet(out_dir).collect()

    mk(rows1).to_parquet(feed / "b1.parquet")
    first = drain()
    assert first == []  # only two events in-window, below the threshold
    mk(rows2).to_parquet(feed / "b2.parquet")
    both = drain()

    got = sorted((r.user_id, r.event_id, r.ts_us, r.burst_n) for r in both)
    # replay expectation = batch RANGE-frame count on the full series
    assert got == [(1, 4, 50 * M, 3), (1, 5, 75 * M, 3)]


def test_decontaminate_stream_matches_batch(spark, tmp_path):
    """Streaming decontamination: the stateless (doc_id, gram)-hit feed,
    aggregated per doc, equals the batch corpus_decontaminate counts over
    the same documents."""
    import pyspark.sql.functions as F

    from dublin_smart_city_graphdb_spark.harness import REGISTRY
    from dublin_smart_city_graphdb_spark.streaming.documents import (
        benchmark_grams,
        decontaminate_stream,
        stream_documents,
    )
    from dublin_smart_city_graphdb_spark.streaming.events import (
        run_available_to_memory,
    )
    from tests.conftest import SF_DIR

    feed = tmp_path / "docs_feed_dc"
    feed.mkdir()
    (feed / "documents.parquet").symlink_to(f"{SF_DIR}/documents.parquet")

    bench = benchmark_grams(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    hits = run_available_to_memory(
        spark,
        decontaminate_stream(stream_documents(spark, str(feed)), bench),
        "t_decontam",
        str(tmp_path / "ckpt_decontam"),
        output_mode="append",
    )
    got = sorted(map(tuple, hits.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_shared_grams")
    ).collect()))
    want = sorted(map(tuple, REGISTRY["corpus_decontaminate"]
                      .raw_fn(spark, SF_DIR).collect()))
    assert got == want and len(got) > 0


def test_near_dup_stream_matches_batch_incremental(spark, tmp_path):
    """Streaming near-dup probe: new documents arriving on a feed (odd
    doc_ids, the batch twin's stand-in for today's ingest) probing the
    batch-built historical band index (even doc_ids) produce EXACTLY the
    cross-batch pairs the batch dedup_incremental operator reports —
    stream-computed row-local signatures are bit-identical to the batch
    explode+groupBy index."""
    import pyspark.sql.functions as F

    from dublin_smart_city_graphdb_spark.harness.pipeline import (
        dedup_incremental,
    )
    from dublin_smart_city_graphdb_spark.streaming.documents import (
        minhash_band_rows,
        near_dup_stream,
        stream_documents,
    )
    from dublin_smart_city_graphdb_spark.streaming.events import (
        run_available_to_memory,
    )
    from tests.conftest import SF_DIR

    feed = tmp_path / "docs_feed_nd"
    feed.mkdir()
    (feed / "documents.parquet").symlink_to(f"{SF_DIR}/documents.parquet")

    hist = (
        minhash_band_rows(
            spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
                F.col("doc_id") % 2 == 0
            )
        )
        .withColumnRenamed("doc_id", "hist_doc")
        .localCheckpoint(eager=True)
    )
    new_docs = stream_documents(spark, str(feed)).filter(
        F.col("doc_id") % 2 == 1
    )
    matches = run_available_to_memory(
        spark,
        near_dup_stream(new_docs, hist),
        "t_near_dup",
        str(tmp_path / "ckpt_near_dup"),
        output_mode="append",
    )
    got = {(r["doc_id"], r["hist_doc"]) for r in matches.collect()}
    want = {
        (r["new_doc"], r["hist_doc"])
        for r in dedup_incremental(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(want) > 0


def test_lm_score_stream_matches_batch_bigram_perplexity(spark, tmp_path):
    """Streaming LM scoring: documents streamed against the batch-fitted
    bigram/unigram model produce per-bigram logprob rows whose per-doc
    mean equals the batch text_bigram_perplexity output exactly (after
    the shared round-6) — the stream side re-derives nothing, it only
    probes the static model tables."""
    import pyspark.sql.functions as F

    from dublin_smart_city_graphdb_spark.harness.pipeline import (
        text_bigram_perplexity,
    )
    from dublin_smart_city_graphdb_spark.streaming.documents import (
        lm_bigram_tables,
        lm_score_stream,
        stream_documents,
    )
    from dublin_smart_city_graphdb_spark.streaming.events import (
        run_available_to_memory,
    )
    from tests.conftest import SF_DIR

    feed = tmp_path / "docs_feed_lm"
    feed.mkdir()
    (feed / "documents.parquet").symlink_to(f"{SF_DIR}/documents.parquet")

    hist = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    uni, bgc, tot = lm_bigram_tables(hist)
    uni = uni.localCheckpoint(eager=True)
    bgc = bgc.localCheckpoint(eager=True)
    tot = tot.localCheckpoint(eager=True)

    scored = run_available_to_memory(
        spark,
        lm_score_stream(stream_documents(spark, str(feed)), uni, bgc, tot),
        "t_lm_score",
        str(tmp_path / "ckpt_lm_score"),
        output_mode="append",
    )
    got = {
        (r["doc_id"], r["n_bigrams"], r["mean_logprob"])
        for r in scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("logprob"), 6).alias("mean_logprob"),
        )
        .collect()
    }
    want = {
        (r["doc_id"], r["n_bigrams"], r["mean_logprob"])
        for r in text_bigram_perplexity(spark, SF_DIR)
        .select("doc_id", "n_bigrams", "mean_logprob")
        .collect()
    }
    assert got == want
    assert len(want) > 0


def test_lm_topk_stream_rollup_matches_batch(spark, tmp_path):
    """Bounded-vocabulary streaming LM end-to-end: documents streamed
    against the truncated (top-K + OOV bucket) model through
    lm_score_stream_topk, rolled up per-doc by the SHIPPED sink-side
    stateful aggregation (lm_score_rollup, complete mode), equal the
    batch text_bigram_perplexity_topk output exactly across the
    stream/batch boundary — the rollup convention is runnable package
    code, not a test-local aggregation."""
    from dublin_smart_city_graphdb_spark.harness.pipeline import (
        text_bigram_perplexity_topk,
    )
    from dublin_smart_city_graphdb_spark.streaming.documents import (
        lm_bigram_tables_topk,
        lm_score_rollup,
        lm_score_stream_topk,
        stream_documents,
    )
    from dublin_smart_city_graphdb_spark.streaming.events import (
        run_available_to_memory,
    )
    from tests.conftest import SF_DIR

    feed = tmp_path / "docs_feed_lm_topk"
    feed.mkdir()
    (feed / "documents.parquet").symlink_to(f"{SF_DIR}/documents.parquet")

    hist = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    topk, uni, bgc, tot = lm_bigram_tables_topk(hist)
    topk = topk.localCheckpoint(eager=True)
    uni = uni.localCheckpoint(eager=True)
    bgc = bgc.localCheckpoint(eager=True)
    tot = tot.localCheckpoint(eager=True)
    assert topk.count() <= 16 and uni.count() <= 17  # bounded by construction

    rolled = run_available_to_memory(
        spark,
        lm_score_rollup(
            lm_score_stream_topk(
                stream_documents(spark, str(feed)), topk, uni, bgc, tot
            )
        ),
        "t_lm_topk_rollup",
        str(tmp_path / "ckpt_lm_topk_rollup"),
        output_mode="complete",
    )
    got = {
        (r["doc_id"], r["n_bigrams"], r["mean_logprob"])
        for r in rolled.collect()
    }
    want = {
        (r["doc_id"], r["n_bigrams"], r["mean_logprob"])
        for r in text_bigram_perplexity_topk(spark, SF_DIR)
        .select("doc_id", "n_bigrams", "mean_logprob")
        .collect()
    }
    assert got == want
    assert len(want) > 0


def test_lm_partials_sink_rollup_matches_batch(spark, tmp_path):
    """The stateless foreachBatch rollup path: per-batch per-doc
    (count, sum) partials written to batch_id-keyed directories, folded
    at read time by lm_rollup_from_partials, equal the batch twin —
    exactly-once via batch-directory overwrite, zero streaming state."""
    from dublin_smart_city_graphdb_spark.harness.pipeline import (
        text_bigram_perplexity_topk,
    )
    from dublin_smart_city_graphdb_spark.streaming.documents import (
        lm_bigram_tables_topk,
        lm_rollup_from_partials,
        lm_score_partials_sink,
        lm_score_stream_topk,
        stream_documents,
    )
    from tests.conftest import SF_DIR

    feed = tmp_path / "docs_feed_lm_fb"
    feed.mkdir()
    (feed / "documents.parquet").symlink_to(f"{SF_DIR}/documents.parquet")

    hist = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    topk, uni, bgc, tot = lm_bigram_tables_topk(hist)
    topk = topk.localCheckpoint(eager=True)
    uni = uni.localCheckpoint(eager=True)
    bgc = bgc.localCheckpoint(eager=True)
    tot = tot.localCheckpoint(eager=True)

    store = str(tmp_path / "lm_partials")
    q = (
        lm_score_stream_topk(
            stream_documents(spark, str(feed)), topk, uni, bgc, tot
        )
        .writeStream.foreachBatch(lm_score_partials_sink(store))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_lm_fb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["doc_id"], r["n_bigrams"], r["mean_logprob"])
        for r in lm_rollup_from_partials(spark, store).collect()
    }
    want = {
        (r["doc_id"], r["n_bigrams"], r["mean_logprob"])
        for r in text_bigram_perplexity_topk(spark, SF_DIR)
        .select("doc_id", "n_bigrams", "mean_logprob")
        .collect()
    }
    assert got == want
    assert len(want) > 0
