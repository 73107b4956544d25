"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The textbook Spark shape: centroids live on the driver (k×d doubles — tiny),
are broadcast into the assignment expression each round, and the new means
come back from one aggregation job. The corpus is never collected; each
iteration is one scan + one (cluster, dim) shuffle of k·d partial sums.

Determinism (for the DuckDB oracle and cross-run stability):
- assignment score is ``dot(e, c) − |c|²/2`` (argmax ≡ nearest centroid by
  L2) computed as a sequential double fold in array order, ties broken by
  the lower cell index;
- means accumulate as DECIMAL(27,12) (exact, order-independent — a plain
  double SUM would vary with partitioning), divide as double, round to 9dp.

Empty clusters drop out; surviving clusters keep their ORIGINAL cell ids so
a SQL oracle can mirror the algorithm round by round.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

_DOT_COLS = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)

Centroids = list[tuple[int, list[float]]]


def assign_clusters(
    spark: SparkSession, embeddings: DataFrame, centroids: Centroids
) -> DataFrame:
    """(vec_id, cluster): nearest centroid per vector — broadcast k×d join,
    per-vector top-1."""
    cdf = F.broadcast(
        spark.createDataFrame(
            [(c, [float(x) for x in v]) for c, v in centroids],
            "cell int, centroid array<double>",
        )
    )
    score = F.expr(_DOT_COLS.format(a="embedding", b="centroid")) - F.expr(
        _DOT_COLS.format(a="centroid", b="centroid")
    ) / F.lit(2.0)
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("cell"))
    return (
        embeddings.crossJoin(cdf)
        .select("vec_id", "cell", score.alias("score"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", F.col("cell").alias("cluster"))
    )


def compute_means(embeddings: DataFrame, assign: DataFrame) -> Centroids:
    """Per-cluster mean vectors, decimal-exact then rounded to 9dp; returns
    driver-side [(cell, centroid)] for the next broadcast. One
    (cluster, dim) aggregation job."""
    dims = embeddings.join(assign, "vec_id").select(
        "cluster", F.posexplode("embedding").alias("dim", "val")
    )
    means = (
        dims.groupBy("cluster", "dim")
        .agg(
            F.round(
                F.sum(F.col("val").cast("decimal(27,12)")).cast("double")
                / F.count("*"),
                9,
            ).alias("m")
        )
        .groupBy("cluster")
        # array_sort on (dim, m) structs orders by dim → dimension-ordered means
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select("cluster", F.col("dm.m").alias("centroid"))
    )
    return sorted((r["cluster"], list(r["centroid"])) for r in means.collect())


def kmeans(
    spark: SparkSession,
    embeddings: DataFrame,
    init: list[list[float]],
    iterations: int = 2,
) -> DataFrame:
    """Lloyd iterations from deterministic ``init``; returns the final
    (vec_id, cluster) assignment (i.e. ``iterations`` assignment steps with
    a mean-update between consecutive ones)."""
    centroids: Centroids = [(i, list(c)) for i, c in enumerate(init)]
    assign = assign_clusters(spark, embeddings, centroids)
    for _ in range(iterations - 1):
        centroids = compute_means(embeddings, assign)
        assign = assign_clusters(spark, embeddings, centroids)
    return assign
