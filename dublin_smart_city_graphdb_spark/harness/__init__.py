"""Driver-harness query registry.

Every operator declared in SURVEY.md §2 (plus the LLM-pipeline extension
surface of SURVEY.md §7/M8) is demonstrated here as a (PySpark query,
DuckDB oracle SQL) pair over the driver's relational testdata
(FIXTURES.md §B). ``__spark_entry__.py`` re-exports this registry.
"""

from dublin_smart_city_graphdb_spark.harness.registry import (
    REGISTRY,
    oracle_sql,
    queries,
    register,
)

# Importing these modules populates REGISTRY via @register decorators.
from dublin_smart_city_graphdb_spark.harness import relational  # noqa: E402,F401
from dublin_smart_city_graphdb_spark.harness import pipeline  # noqa: E402,F401
from dublin_smart_city_graphdb_spark.harness import sparql_gate  # noqa: E402,F401

__all__ = ["REGISTRY", "queries", "oracle_sql", "register"]
