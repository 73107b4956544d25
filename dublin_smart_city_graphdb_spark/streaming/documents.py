"""Streaming document curation (SURVEY §7/M8 extension surface).

The batch curation operators (``harness/pipeline.py``) have streaming
twins where the semantics are stateless: a document FEED (files landing
in a directory — the usual shape of a crawler or export pipeline) is
quality-filtered as it arrives, so rejects never reach the corpus store.
Rules are pure per-row projections — no watermark, no state store; the
operator scales with throughput, not corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_STOPWORDS = ("the", "a", "of", "and", "to", "in")

# OOV-bucket sentinel for the bounded-vocabulary LM twins; must equal the
# batch side's ``harness.pipeline._LM_OOV`` (pinned by the stream≡batch
# test). chr(1) cannot collide with any whitespace-split token.
_LM_OOV = "\x01"


def _arr_let(arr, body):
    """Single-evaluation let binding for an array Column consumed inside
    a HOF lambda (same rationale and trick as
    ``harness/pipeline.py::_arr_let``: interpreted HOF evaluation
    re-evaluates captured expressions per element)."""
    return F.get(F.transform(F.array(arr), body), 0)


def _bigram_structs():
    """(w1, w2) struct array over ``text``, let-bound so the token array
    evaluates once per document instead of once per bigram (must stay
    formation-identical to the batch twin in harness/pipeline.py — the
    stream≡batch tests pin the outputs)."""
    return _arr_let(
        F.split(F.col("text"), " "),
        lambda ts: F.transform(
            F.sequence(F.lit(0), F.size(ts) - 2),
            lambda i: F.struct(
                F.get(ts, i).alias("w1"),
                F.get(ts, i + 1).alias("w2"),
            ),
        ),
    )


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan of a documents feed directory (schema pinned from a
    batch footer read, as the streaming file source requires)."""
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def quality_filter_stream(docs: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``corpus_filter_rules`` operator: the
    same Gopher-style rule columns (token-count band, mean word length
    band, stopword floor, alphabetic-ratio floor, conjunctive keep),
    evaluated per micro-batch entirely map-side. Column-for-column
    parity with the batch operator is pinned by
    ``tests/test_streaming.py::test_quality_filter_stream_matches_batch``."""
    n_tokens = F.size(F.split(F.col("text"), " "))
    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    feat = docs.select(
        "doc_id",
        "source",
        "n_chars",
        n_tokens.alias("n_tokens"),
        F.length(F.regexp_replace(F.col("text"), "[^a-z]", "")).alias("n_alpha"),
        F.expr(
            f"size(filter(split(text, ' '), t -> t IN ({stop_list})))"
        ).alias("n_stop"),
    )
    mean_wl = (F.col("n_chars") - F.col("n_tokens") + 1).cast("double") / F.col(
        "n_tokens"
    )
    pass_len = (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 1000)
    pass_word_len = (mean_wl >= 2.0) & (mean_wl <= 12.0)
    pass_stopwords = F.col("n_stop") >= 2
    # nullif: empty documents (n_chars = 0) flag NULL instead of throwing
    # under ANSI — mirrors the batch operator exactly
    pass_alpha = (
        F.col("n_alpha").cast("double") / F.expr("nullif(n_chars, 0)") >= 0.55
    )
    return feat.select(
        "doc_id",
        "source",
        "n_tokens",
        pass_len.alias("pass_len"),
        pass_word_len.alias("pass_word_len"),
        pass_stopwords.alias("pass_stopwords"),
        pass_alpha.alias("pass_alpha"),
        (pass_len & pass_word_len & pass_stopwords & pass_alpha).alias("keep"),
    )


def minhash_band_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_val) MinHash-LSH band rows, computed
    ROW-LOCAL: each lane is ``array_min`` over the document's shingle
    array instead of the batch index's explode + groupBy — no shuffle,
    no state, so the same expression runs on a STREAMING frame. Lanes
    (two md5 evaluations sliced into 8×32-bit mins over 5-word
    shingles) and 4×2 banding are bit-identical to the batch index
    (harness/pipeline.py `dedup_minhash_sig`/`dedup_incremental`), so
    stream-computed rows probe a batch-built historical index
    directly."""
    from dublin_smart_city_graphdb_spark.harness.pipeline import (
        _mh_spark,
        _MINHASH_K,
        _N_BANDS,
        _shingle_arr,
    )

    sh = _shingle_arr(5)
    lanes = [
        F.array_min(
            F.expr(
                "transform(__sh, shingle -> "
                + _mh_spark(j)
                + ")"
            )
        ).alias(f"mh{j}")
        for j in range(_MINHASH_K)
    ]
    sig = docs.withColumn("__sh", sh).select("doc_id", *lanes)
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                ":",
                F.col(f"mh{2 * b}").cast("string"),
                F.col(f"mh{2 * b + 1}").cast("string"),
            ).alias("band_val"),
        )
        for b in range(_N_BANDS)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select(
        "doc_id",
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_val").alias("band_val"),
    )


def near_dup_stream(docs: DataFrame, hist_bands: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``dedup_incremental`` operator:
    documents arriving on a feed are near-dup-probed against a STATIC
    historical MinHash-LSH band index through a stream-static equi-join
    on (band_idx, band_val). The stream side is map-only (row-local
    signatures, no watermark, no state store); the static side is the
    stored index a production pipeline maintains — per micro-batch cost
    is O(|batch| × bands) probe rows against the index join, never a
    corpus self-join. Emits (doc_id, hist_doc) match rows in append
    mode; duplicates across bands are expected (the batch twin's
    DISTINCT is an aggregation the caller applies downstream of the
    sink, where global dedup belongs)."""
    return (
        minhash_band_rows(docs)
        .join(hist_bands, ["band_idx", "band_val"])
        .select(
            F.col("doc_id"),
            F.col("hist_doc"),
        )
    )


def benchmark_grams(docs: DataFrame) -> DataFrame:
    """The static side of the streaming decontamination join: distinct
    word-level 4-grams of the benchmark subset (doc_id % 97 — the same
    stand-in eval suite as the batch ``corpus_decontaminate``)."""
    toks = docs.filter(F.col("doc_id") % 97 == 0).select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    ).filter(F.size("t") >= 4)
    idx = F.sequence(F.lit(1), F.size("t") - 3)
    return toks.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, F.lit(4))),
            )
        ).alias("g")
    ).distinct()


def decontaminate_stream(docs: DataFrame, bench: DataFrame) -> DataFrame:
    """Streaming twin of ``corpus_decontaminate``: each arriving
    document's DISTINCT 4-grams probe the static benchmark-gram set with
    a stream-static broadcast semi-join; output is one (doc_id, g) row
    per contaminated gram. STATELESS by construction — within-document
    dedup rides ``array_distinct`` before the explode, so no streaming
    aggregation, watermark, or state store is needed; per-document hit
    counts are a trivial downstream batch aggregation. A 100 TB feed
    scales with throughput: the benchmark set broadcasts once per
    micro-batch and the probe is map-side."""
    toks = docs.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    ).filter(F.size("t") >= 4)
    idx = F.sequence(F.lit(1), F.size("t") - 3)
    grams = toks.select(
        "doc_id",
        F.explode(F.array_distinct(F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, F.lit(4))),
        ))).alias("g"),
    )
    return grams.join(F.broadcast(bench), "g", "left_semi")


def lm_bigram_tables(docs: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Static side of the streaming LM-scoring join: unigram counts,
    bigram counts, and the 1-row token total fitted on the HISTORICAL
    corpus — the quality model a production ingest pipeline maintains
    and periodically refits (the stream side never re-aggregates it).
    Mirrors the batch ``text_bigram_perplexity`` model fit exactly."""
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("t"))
    uni = toks.groupBy("t").agg(F.count("*").alias("c"))
    tot = uni.agg(F.sum("c").alias("n"))
    bg = (
        docs.filter(F.size(F.split(F.col("text"), " ")) >= 2)
        .select(F.explode(_bigram_structs()).alias("b"))
        .select("b.w1", "b.w2")
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    return uni, bgc, tot


def lm_score_stream(
    docs: DataFrame, uni: DataFrame, bgc: DataFrame, tot: DataFrame
) -> DataFrame:
    """Streaming twin of ``text_bigram_perplexity``'s scoring stage:
    documents arriving on a feed are scored against the STATIC fitted
    model through stream-static joins. Bigrams form MAP-SIDE from each
    document's token array (row-local, no watermark, no state store);
    each probes the bigram/unigram count tables and emits one
    (doc_id, w1, w2, logprob) row in append mode under the interpolated
    model P(w2|w1) = 0.75·c(w1w2)/c(w1) + 0.25·c(w2)/N. The per-doc
    mean (the batch twin's groupBy) is a trivial downstream batch
    aggregation at the sink, where global state belongs — same
    convention as ``near_dup_stream``. Inner-join semantics: a bigram
    absent from the fitted model drops (fit the model with an OOV
    bucket upstream if unseen tokens must score). Per micro-batch cost
    is O(|batch| × tokens) probe rows — never a corpus re-aggregation."""
    bg = (
        docs.filter(F.size(F.split(F.col("text"), " ")) >= 2)
        .select("doc_id", F.explode(_bigram_structs()).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )
    u1 = F.broadcast(uni.select(F.col("t").alias("w1"), F.col("c").alias("c1")))
    u2 = F.broadcast(uni.select(F.col("t").alias("w2"), F.col("c").alias("c2")))
    p = (
        F.lit(0.75) * F.col("cb").cast("double") / F.col("c1")
        + F.lit(0.25) * F.col("c2").cast("double") / F.col("n")
    )
    return (
        bg.join(bgc, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "w1", "w2", F.log(p).alias("logprob"))
    )


def lm_bigram_tables_topk(
    docs: DataFrame, k: int = 16
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Bounded-vocabulary static side of the streaming LM join — the
    100 TB form of ``lm_bigram_tables``: the unigram model truncates to
    the top-``k`` tokens by count (tie-break count desc / token asc)
    plus one OOV bucket carrying the tail mass (floored at 1), and the
    bigram table is fitted over the MAPPED token stream, so both
    stream-side broadcast tables are bounded by construction (≤ k+1
    unigram rows, ≤ (k+1)² bigram keys) regardless of the corpus
    vocabulary distribution. Mirrors the batch
    ``text_bigram_perplexity_topk`` model fit exactly. Returns
    (topk, uni, bgc, tot): ``topk`` is the membership table the scoring
    stage needs to map arriving tokens into the bucket."""
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("t"))
    uni_full = toks.groupBy("t").agg(F.count("*").alias("c"))
    tot = uni_full.agg(F.sum("c").alias("n"))
    topk = uni_full.orderBy(F.col("c").desc(), F.col("t").asc()).limit(k)
    kmass = topk.agg(F.sum("c").alias("km"))
    oov_row = tot.crossJoin(kmass).select(
        F.lit(_LM_OOV).alias("t"),
        F.greatest(F.col("n") - F.col("km"), F.lit(1)).alias("c"),
    )
    uni = topk.unionByName(oov_row)
    bg = (
        docs.filter(F.size(F.split(F.col("text"), " ")) >= 2)
        .select(F.explode(_bigram_structs()).alias("b"))
        .select("b.w1", "b.w2")
    )
    m1 = F.broadcast(topk.select(F.col("t").alias("w1"), F.lit(1).alias("in1")))
    m2 = F.broadcast(topk.select(F.col("t").alias("w2"), F.lit(1).alias("in2")))
    bgm = (
        bg.join(m1, "w1", "left")
        .join(m2, "w2", "left")
        .select(
            F.when(F.col("in1").isNotNull(), F.col("w1"))
            .otherwise(F.lit(_LM_OOV))
            .alias("w1"),
            F.when(F.col("in2").isNotNull(), F.col("w2"))
            .otherwise(F.lit(_LM_OOV))
            .alias("w2"),
        )
    )
    bgc = bgm.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    return topk, uni, bgc, tot


def lm_score_stream_topk(
    docs: DataFrame,
    topk: DataFrame,
    uni: DataFrame,
    bgc: DataFrame,
    tot: DataFrame,
) -> DataFrame:
    """Streaming twin of ``text_bigram_perplexity_topk``'s scoring
    stage: arriving documents form bigrams MAP-SIDE, map each endpoint
    through the ≤k-row ``topk`` membership broadcast into the OOV
    bucket, then probe the bounded model tables exactly as
    ``lm_score_stream`` probes the unbounded ones. Because the model's
    key space is closed under the mapping (every mapped token is either
    a top-k token or the bucket), a stream bigram can only miss the
    ``bgc`` inner join when that mapped PAIR never occurred in the fit
    corpus — unseen-vocabulary drops, the failure mode of the exact
    twin, cannot happen. Same sink convention as ``lm_score_stream``:
    per-bigram (doc_id, w1, w2, logprob) rows in append mode; the
    per-doc mean belongs to the sink (see ``lm_score_rollup``)."""
    bg = (
        docs.filter(F.size(F.split(F.col("text"), " ")) >= 2)
        .select("doc_id", F.explode(_bigram_structs()).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )
    m1 = F.broadcast(topk.select(F.col("t").alias("w1"), F.lit(1).alias("in1")))
    m2 = F.broadcast(topk.select(F.col("t").alias("w2"), F.lit(1).alias("in2")))
    bgm = (
        bg.join(m1, "w1", "left")
        .join(m2, "w2", "left")
        .select(
            "doc_id",
            F.when(F.col("in1").isNotNull(), F.col("w1"))
            .otherwise(F.lit(_LM_OOV))
            .alias("w1"),
            F.when(F.col("in2").isNotNull(), F.col("w2"))
            .otherwise(F.lit(_LM_OOV))
            .alias("w2"),
        )
    )
    u1 = F.broadcast(uni.select(F.col("t").alias("w1"), F.col("c").alias("c1")))
    u2 = F.broadcast(uni.select(F.col("t").alias("w2"), F.col("c").alias("c2")))
    p = (
        F.lit(0.75) * F.col("cb").cast("double") / F.col("c1")
        + F.lit(0.25) * F.col("c2").cast("double") / F.col("n")
    )
    return (
        bgm.join(F.broadcast(bgc), ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "w1", "w2", F.log(p).alias("logprob"))
    )


def lm_score_rollup(scored: DataFrame) -> DataFrame:
    """Sink-side per-document rollup for ``lm_score_stream`` /
    ``lm_score_stream_topk`` — the runnable form of the documented
    convention that the per-doc mean belongs to the sink. A streaming
    stateful aggregation keyed by doc_id over the per-bigram logprob
    rows; run it in ``update`` (or ``complete``) output mode and the
    sink receives exactly the batch twin's per-doc output
    (n_bigrams, mean_logprob). State is one (count, sum) pair per
    in-flight document — production bounds retention with a watermark
    on an arrival-time column or ships ``lm_score_partials_sink``
    instead, which keeps NO streaming state at all."""
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("logprob"), 6).alias("mean_logprob"),
    )


def lm_score_partials_sink(store_dir: str):
    """foreachBatch alternative to ``lm_score_rollup`` for unbounded
    feeds: each micro-batch reduces its per-bigram rows to per-doc
    partial aggregates (count, sum) — a batch-local shuffle, bounded by
    the micro-batch — and writes them to ``store_dir/batch_id=N``.
    Overwriting the batch's own directory makes replay after failure
    idempotent (Structured Streaming re-runs a batch with the same
    batch_id), so the store is exactly-once without any streaming
    state; ``lm_rollup_from_partials`` folds the partials into final
    per-doc means at read time. Returns the foreachBatch callable to
    pass to ``DataStreamWriter.foreachBatch``."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("doc_id")
            .agg(F.count("*").alias("pn"), F.sum("logprob").alias("ps"))
            .write.mode("overwrite")
            .parquet(f"{store_dir}/batch_id={batch_id}")
        )

    return _write


def lm_rollup_from_partials(spark, store_dir: str) -> DataFrame:
    """Fold the per-batch partials written by ``lm_score_partials_sink``
    into the batch twin's per-doc output. Documents split across
    micro-batches merge correctly because (count, sum) partials are
    associative; the fold is one groupBy over data that is already
    per-doc-per-batch (≪ the bigram stream it summarizes)."""
    p = spark.read.parquet(store_dir)
    return p.groupBy("doc_id").agg(
        F.sum("pn").alias("n_bigrams"),
        F.round(F.sum("ps") / F.sum("pn"), 6).alias("mean_logprob"),
    )
