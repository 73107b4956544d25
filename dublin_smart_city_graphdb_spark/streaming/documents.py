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
