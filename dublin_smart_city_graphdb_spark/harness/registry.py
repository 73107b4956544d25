"""Registry mapping query names to (spark_fn, oracle_sql) pairs.

Contract (driver, see repo-root ``__spark_entry__.py``): each spark_fn takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle is ANSI SQL DuckDB
runs over the same parquet tables. Column names/aliases must match exactly —
the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class HarnessQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver records a weaker rows-only check
    doc: str = ""


REGISTRY: dict[str, HarnessQuery] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a harness query to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = HarnessQuery(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table and expose ``ts_us`` (µs since epoch, matching
    DuckDB's ``epoch_us``) as the canonical event-time column.

    Driver testdata has shipped ``ts`` under two physical encodings:
    parquet TIMESTAMP(NANOS) (illegal for Spark's reader without
    ``nanosAsLong``, which surfaces it as long ns-since-epoch) and plain
    timestamp[us] (read as ``timestamp_ntz``). Handle both; the ntz → µs
    conversion uses ``timestampdiff`` against the epoch so it is
    session-timezone-independent, exactly like DuckDB's ``epoch_us`` on a
    naive timestamp. Precondition: if parquet ``ts`` ever arrived
    isAdjustedToUTC (read as TIMESTAMP_LTZ), the CAST to NTZ would be
    session-tz-dependent — correct here only because session.py pins
    spark.sql.session.timeZone=UTC."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import pyspark.sql.functions as F

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    kind = dict(df.dtypes)["ts"]
    if kind == "bigint":  # TIMESTAMP(NANOS) surfaced as long ns
        ts_us = F.expr("ts div 1000")
    else:  # timestamp / timestamp_ntz
        ts_us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            "CAST(ts AS TIMESTAMP_NTZ))"
        )
    return df.withColumn("ts_us", ts_us)
