"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query implementations live in
``dublin_smart_city_graphdb_spark/harness/`` — one entry per operator in
SURVEY.md §2 plus the §7 LLM-pipeline extensions; this module is a thin
re-export.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dublin_smart_city_graphdb_spark import harness


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the BGP join chain —
    the relational twin of the reference's acceptance query
    (README.md:70-78)."""
    return harness.REGISTRY["bgp_join_chain"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7."""
    return harness.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each entry in queries()."""
    return harness.oracle_sql()
