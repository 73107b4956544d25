"""Bucketed table layout: the co-located-join story for 100 TB.

The reference deployment's analogous choice is its per-predicate access
path (predicate lists, ``init-graphdb.sh:61-65``): decide the physical
layout ONCE at write time so the hot access pattern never pays a global
reorganization. In Spark the equivalent for fact-fact joins is bucketing:
``bucketBy(n, key)`` hash-partitions files at write time and records the
spec in the catalog, so

- an equi-join of two tables bucketed by the same key into the same bucket
  count runs with ZERO Exchange on either side (each task zips bucket i
  with bucket i — at 100 TB that's the difference between a full-cluster
  shuffle of both tables and none),
- an aggregation keyed on the bucket column skips its shuffle the same way,
- a point filter on the bucket key prunes to 1/n of the files before any
  IO (``SelectedBucketsCount`` in the scan).

``sortBy`` within buckets additionally pre-orders rows so sort-merge join
can skip its per-task sort when files arrive sorted.

This module is layout tooling, not a query operator: a pipeline that joins
``orders ⋈ lineitem`` (or ``quads ⋈ quads`` on subject) every hour runs
``write_bucketed`` once and every later join is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 8,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Persist ``df`` as a bucketed (and in-bucket sorted) catalog table;
    returns the table-backed DataFrame whose scans carry the bucket spec.

    ``n_buckets`` must match across tables that will join — Spark only
    elides both Exchanges when the specs line up (or divide evenly with
    bucket coalescing on). Rule of thumb at scale: size buckets so one
    bucket of the BIG side fits an executor's memory (~128-512 MB each).
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*(sort_cols or keys))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return df.sparkSession.table(table)


def drop_bucketed(spark: SparkSession, *tables: str) -> None:
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
