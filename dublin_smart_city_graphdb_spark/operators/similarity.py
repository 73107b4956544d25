"""Text similarity search over quad-store literals (SPARQL-callable).

The GraphDB similarity plugin builds semantic vectors over each subject's
literal text and answers "which entities are most similar to X"; this is
the Spark-native twin with classic TF-IDF cosine: subjects are documents,
the bag of tokens of all their literal objects the text (the same
molecule-style default as the FTS twin in fts.py), and similarity to a
BOUND anchor subject is scored as cosine over ln(N/df)-weighted term
vectors.

Execution shape — anchor-broadcast, never all-pairs: the corpus is
tokenized and aggregated once per subject+term (one shuffle), document
frequencies once per term (one shuffle), the ANCHOR's sparse vector is
broadcast, and candidates are exactly the subjects sharing ≥1 anchor term
(map-side semi-join against the broadcast). At 100 TB the corpus never
joins itself; the output is |candidates| rows. Contributions fold as
DECIMAL(27,12) with a final round(…, 6) so distributed sum order can
never flip a score (the repo's oracle float-parity rule).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def tfidf_cosine_to_anchor(quads: DataFrame, anchor_iri: str) -> DataFrame:
    """→ (s, score DECIMAL(18,6)) for every OTHER subject sharing at least
    one term with ``anchor_iri``, scored by TF-IDF cosine; the anchor
    itself is excluded."""
    from dublin_smart_city_graphdb_spark.model.schema import KIND_LITERAL

    toks = (
        quads.filter(F.col("o_kind") == KIND_LITERAL)
        .select(
            "s",
            F.explode(F.split(F.lower(F.col("o_lex")), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("s", "term").agg(F.count("*").alias("tf"))
    # N as a broadcast 1-row aggregate, not a driver-side count(): keeps
    # the whole operator lazy (no job at plan-build time) and the corpus
    # tokenization single-pass
    nd = tf.agg(F.countDistinct("s").cast("double").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # ln(N/df) idf; a term in every document contributes 0 and drops out
    w = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "w",
            F.col("tf").cast("double")
            * F.log(F.col("n_docs") / F.col("df").cast("double")),
        )
        .select("s", "term", "w")
    )
    norms = w.groupBy("s").agg(
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast("decimal(27,12)")).cast(
                "double"
            )
        ).alias("norm")
    )
    anchor_w = w.filter(F.col("s") == anchor_iri).select(
        F.col("term").alias("a_term"), F.col("w").alias("a_w")
    )
    anchor_norm = norms.filter(F.col("s") == anchor_iri).select(
        F.col("norm").alias("a_norm")
    )
    dots = (
        w.join(F.broadcast(anchor_w), w.term == F.col("a_term"))
        .filter(F.col("s") != anchor_iri)
        .groupBy("s")
        .agg(
            F.sum((F.col("w") * F.col("a_w")).cast("decimal(27,12)"))
            .cast("double")
            .alias("dot")
        )
    )
    return (
        dots.join(norms, "s")
        .crossJoin(F.broadcast(anchor_norm))
        .select(
            "s",
            F.round(
                F.col("dot") / (F.col("norm") * F.col("a_norm")), 6
            ).cast("decimal(18,6)").alias("score"),
        )
        .filter(F.col("score") > 0)
    )
