"""Full-text BM25 search over quad-store literals (SPARQL-callable FTS).

The GraphDB image the reference deploys (``Dockerfile:2``) exposes
Lucene-connector full-text search from SPARQL; this is the Spark-native
twin: subjects are the "documents", the bag of tokens of all their literal
objects is the indexed text (the molecule-style default GraphDB's FTS uses
when no field list is configured), and BM25 (k1=1.2, b=0.75) scores them
against a query string.

Same execution shape as the harness ``text_bm25_search`` operator
(harness/pipeline.py): one explode of the literal scan, postings restricted
map-side to the query's terms (the inverted-index probe — candidate set is
bounded by the query terms' postings, never the corpus), corpus scalars
(N, avgdl) broadcast, per-(doc,term) contributions rounded to 6 dp and
summed as exact DECIMAL so distributed fold order can never flip a score.
At 100 TB the literal scan prunes to ``o_kind = literal`` columns and the
two aggregations shuffle on subject — no join ever carries the corpus
against itself.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BM25_K1 = 1.2
BM25_B = 0.75


def tokenize_query(query: str) -> list[str]:
    return [t for t in query.lower().split() if t]


def bm25_subject_scores(
    quads: DataFrame,
    query: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """→ (s, score DECIMAL(18,6)) for every subject with a positive BM25
    score against ``query``; subjects with no matching term are absent."""
    from dublin_smart_city_graphdb_spark.model.schema import KIND_LITERAL

    terms = tokenize_query(query)
    if not terms:
        return quads.select(
            F.col("s"), F.lit(None).cast("decimal(18,6)").alias("score")
        ).limit(0)

    toks = (
        quads.filter(F.col("o_kind") == KIND_LITERAL)
        .select(
            "s",
            F.explode(F.split(F.lower(F.col("o_lex")), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    dl = toks.groupBy("s").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy("s", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    k1c, bc = F.lit(float(k1)), F.lit(float(b))
    contrib = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "s")
        .crossJoin(F.broadcast(stats))
        .select(
            "s",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (k1c + F.lit(1.0)))
                / (
                    F.col("tf")
                    + k1c * (F.lit(1.0) - bc + bc * F.col("dl") / F.col("avgdl"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("c"),
        )
    )
    return contrib.groupBy("s").agg(F.sum("c").alias("score"))
