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
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    @property
    def _stats_path(self) -> str:
        return os.path.join(self.path, "_predicate_stats.json")

    def write(self, quads: DataFrame, mode: str = "append") -> None:
        quads.write.mode(mode).partitionBy("p").parquet(self.path)
        self._refresh_stats()

    def read(self) -> DataFrame:
        df = self.spark.read.schema(QUAD_SCHEMA).parquet(self.path)
        # partitionBy moves `p` to the end; restore canonical column order
        return df.select(*[f.name for f in QUAD_SCHEMA.fields])

    def _refresh_stats(self) -> None:
        stats = {
            r["p"]: r["n"]
            for r in self.spark.read.parquet(self.path)
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
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
        return os.path.isdir(self.path) and any(
            e.startswith("p=") or e.endswith(".parquet")
            for e in os.listdir(self.path)
        )
