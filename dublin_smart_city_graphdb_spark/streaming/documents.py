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
