"""Parquet-backed quad store (SURVEY.md §1.4/§1.5).

Layout = ``partitionBy("p")``: the Spark-native analogue of the reference's
predicate-lists index (``init-graphdb.sh:61-65``) — per-predicate scans become
partition-pruned directory reads, so every bound-predicate triple pattern
touches only its own files. ``g`` is carried as a data column (context index
analogue); graph-scoped scans get row-group pruning via parquet min/max on a
low-cardinality column. Per-predicate row counts are collected at write time
for the BGP join-order heuristic (SURVEY §4.1).
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA


class QuadStore:
    """``bucket_subjects=N`` additionally buckets (and sorts) by ``s`` via a
    catalog table: subject-grouped operators — the star-compacted BGP
    aggregate, subject-key joins — then read a pre-hashed distribution and
    plan with ZERO exchanges. The 100 TB layout is partitionBy(p) ×
    bucketBy(s): predicate pruning picks the files, bucketing removes the
    shuffle."""

    def __init__(self, spark: SparkSession, path: str, bucket_subjects: int = 0):
        self.spark = spark
        self.path = path
        self.bucket_subjects = bucket_subjects
        # catalog identifier for the bucketed table (bucket metadata lives
        # in the metastore, not the parquet files)
        self._table = "quads_" + "".join(
            c if c.isalnum() else "_" for c in path
        ).strip("_")[-64:]

    @property
    def _stats_path(self) -> str:
        return os.path.join(self.path, "_predicate_stats.json")

    def write(self, quads: DataFrame, mode: str = "append") -> None:
        if self.bucket_subjects:
            (
                quads.write.mode(mode)
                .partitionBy("p")
                .bucketBy(self.bucket_subjects, "s")
                .sortBy("s")
                .option("path", os.path.join(self.path, "data"))
                .format("parquet")
                .saveAsTable(self._table)
            )
        else:
            quads.write.mode(mode).partitionBy("p").parquet(self.path)
        self._refresh_stats()

    def read(self) -> DataFrame:
        if self.bucket_subjects:
            df = self.spark.table(self._table)
        else:
            df = self.spark.read.schema(QUAD_SCHEMA).parquet(self.path)
        # partitionBy moves `p` to the end; restore canonical column order
        return df.select(*[f.name for f in QUAD_SCHEMA.fields])

    def _refresh_stats(self) -> None:
        src = (
            self.spark.table(self._table)
            if self.bucket_subjects
            else self.spark.read.parquet(self.path)
        )
        stats = {
            r["p"]: r["n"]
            for r in src.groupBy("p").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        with open(self._stats_path, "w") as f:
            json.dump(stats, f)

    def predicate_stats(self) -> dict[str, int]:
        try:
            with open(self._stats_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def exists(self) -> bool:
        if self.bucket_subjects:
            return self.spark.catalog.tableExists(self._table)
        return os.path.isdir(self.path) and any(
            e.startswith("p=") or e.endswith(".parquet")
            for e in os.listdir(self.path)
        )
