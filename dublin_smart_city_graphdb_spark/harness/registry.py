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
    # Uncached constructor — plan tests use this: a cached DataFrame that
    # some earlier caller already executed prints its FINAL adaptive plan
    # (AQEShuffleRead / materialized query stages), not the compile-time
    # shape the assertions pin.
    raw_fn: QueryFn = None


REGISTRY: dict[str, HarnessQuery] = {}

# Prepared-plan cache (same rationale as Repository.sparql and the SPARQL
# gate's _PLAN_CACHE): constructing a DataFrame plan is Py4J-chatty
# (hundreds of gateway round trips building Column trees) and some
# operators run bounded driver-side stages at build time (ANN query
# collect, k-means centroid rounds, shard prefix offsets). Inputs are
# immutable per (session, sf_dir), so identical calls reuse the compiled
# plan — execution itself still runs fully distributed on every call.
# shuffle.partitions rides in the key so sessions that re-tune it (the
# partition-invariance tests) get fresh plans.
_PLAN_CACHE: dict[tuple, DataFrame] = {}


def register(
    name: str, oracle: str | None, doc: str = "", cache_plan: bool = True
):
    """Decorator: add a harness query to the registry (plan-cached).

    ``cache_plan=False`` for operators whose DOMINANT compute runs at
    plan-build time (iterative fixpoints that localCheckpoint each round,
    Lloyd iterations collecting centroids): caching those would turn a
    repeat call into a re-count of materialized state and overstate any
    benchmark — they rebuild, honestly re-running the work. Declarative
    plans (construction = metadata + at most a bounded scatter-gather)
    cache; their execution still runs fully distributed every call.
    """

    def wrap(fn: QueryFn) -> QueryFn:
        if not cache_plan:
            REGISTRY[name] = HarnessQuery(
                name=name, fn=fn, oracle=oracle, doc=doc, raw_fn=fn
            )
            return fn

        def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
            key = (
                spark.sparkContext.applicationId,
                sf_dir,
                name,
                spark.conf.get("spark.sql.shuffle.partitions", ""),
            )
            if key not in _PLAN_CACHE:
                # plan objects pin JVM-side analyzed trees — keep the
                # cache small enough that a long pytest session's
                # accumulated plans stay a minor heap tenant
                if len(_PLAN_CACHE) >= 192:
                    _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
                _PLAN_CACHE[key] = fn(spark, sf_dir)
            return _PLAN_CACHE[key]

        cached.__name__ = fn.__name__
        cached.__doc__ = fn.__doc__
        REGISTRY[name] = HarnessQuery(
            name=name, fn=cached, oracle=oracle, doc=doc, raw_fn=fn
        )
        return fn

    return wrap


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


def _restore_wall_time(df: DataFrame) -> DataFrame:
    """Undo a session's LTZ reading of naive parquet timestamps.

    Driver testdata stores isAdjustedToUTC=false micros. A session with
    ``inferTimestampNTZ`` disabled surfaces those as TIMESTAMP_LTZ whose
    *stored micros are unchanged* — only rendering/extraction becomes
    session-tz-dependent. Rebuilding an NTZ from ``unix_micros`` recovers
    the file's exact wall time with zero tz involvement, making every
    downstream date/hour/window extraction behave identically to the
    default NTZ reading (and to the DuckDB oracle's naive timestamps).
    Under the default session this is a passthrough: no extra Project, no
    pushdown impact. A hostile-session sweep (21 red under LTZ+non-UTC
    before this, 0 after) is pinned by tests/test_tz_invariance.py."""
    import pyspark.sql.functions as F

    reps = {
        name: F.expr(
            f"timestampadd(MICROSECOND, unix_micros(`{name}`), "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        )
        for name, kind in df.dtypes
        if kind == "timestamp"
    }
    return df.withColumns(reps) if reps else df


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md)."""
    return _restore_wall_time(spark.read.parquet(f"{sf_dir}/{table}.parquet"))


def wall_day(df: DataFrame, col: str):
    """Days-since-epoch of a parquet timestamp column, invariant to HOW the
    session read it (TIMESTAMP_NTZ vs LTZ via inferTimestampNTZ, any session
    timezone).

    Driver testdata stores naive micros (isAdjustedToUTC=false). Read as
    NTZ, the wall value IS those micros; read as LTZ, Spark treats the same
    stored micros as an instant, so ``unix_micros`` recovers the identical
    number without any session-tz rendering. Either way
    ``floor(us / 86_400_000_000)`` is the oracle's ``CAST(x AS DATE)`` day
    number — unlike ``to_date``/``year`` on an LTZ column, which shift at
    session-tz midnight boundaries (r3's q12 driver-red row)."""
    import pyspark.sql.functions as F

    kind = dict(df.dtypes)[col]
    if kind == "date":
        return F.col(col).cast("int").cast("bigint")
    if kind == "timestamp":  # LTZ: stored micros surfaced as an instant
        us = F.unix_micros(F.col(col))
    else:  # timestamp_ntz: tz-free diff against the epoch
        us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            f"CAST({col} AS TIMESTAMP_NTZ))"
        )
    return F.floor(us / F.lit(86_400_000_000))


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
    spark.sql.session.timeZone=UTC.

    Conf hygiene (VERDICT r3 task 3): the ``nanosAsLong`` enable is gated
    on a driver-side footer sniff — with today's timestamp[us] testdata
    this function mutates NO session state, so query results cannot depend
    on whether an events query ran earlier in the same session."""
    import pyspark.sql.functions as F

    from ..session import enable_nanos_compat_if_needed

    enable_nanos_compat_if_needed(spark, f"{sf_dir}/events.parquet")

    df = _restore_wall_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
    kind = dict(df.dtypes)["ts"]
    if kind == "bigint":  # TIMESTAMP(NANOS) surfaced as long ns
        ts_us = F.expr("ts div 1000")
    else:  # timestamp / timestamp_ntz
        ts_us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            "CAST(ts AS TIMESTAMP_NTZ))"
        )
    return df.withColumn("ts_us", ts_us)
