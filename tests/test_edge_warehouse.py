"""Mini adversarial warehouse: EVERY oracle-gated registry query runs over
a complete 10-table star schema with degenerate shapes — single-row
dimensions, a customer with no orders, one-nation regions, tied prices,
zero/negative balances, boundary dates and discounts — so edge behavior
of the whole surface is pinned, not just the text/embedding/events ops.

Tables are tiny but non-empty and foreign-key consistent; documents /
embeddings / events reuse the adversarial shapes from test_edge_corpus.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from dublin_smart_city_graphdb_spark import harness
from tests.test_edge_corpus import EDGE_DOCS
from tools.check_oracle import TABLES, compare

T0 = dt.datetime(1995, 6, 1)


# Driver-window hygiene (round 12, VERDICT r11 item 6): full-registry adversarial-warehouse oracle sweep —
# slow-gate class, excluded from the default suite so the driver's
# verify completes inside its window; run with `-m slow` (the round
# close does).
pytestmark = pytest.mark.slow


def _ts(y, m, d):
    return dt.datetime(y, m, d)


def _write(spark, d, name, rows, cols, schema=None):
    df = (
        spark.createDataFrame(rows, schema)
        if schema is not None
        else spark.createDataFrame(rows, cols)
    )
    df.coalesce(1).write.parquet(str(d / f"{name}.parquet"))


@pytest.fixture(scope="module")
def edge_wh_dir(spark, tmp_path_factory):
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    d = tmp_path_factory.mktemp("edge_wh")

    _write(spark, d, "region", [(0, "EDGE REGION")], None, StructType([
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]))
    _write(spark, d, "nation", [(0, "AAA", 0), (1, "BBB", 0)], None, StructType([
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]))
    # c2 has NO orders (anti-join case); balances at 0 and negative
    _write(spark, d, "customer", [
        (0, "Customer#0", 0, -10.5, "BUILDING"),
        (1, "Customer#1", 1, 0.0, "MACHINERY"),
        (2, "Customer#2", 0, 9999.99, "BUILDING"),
    ], None, StructType([
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]))
    _write(spark, d, "supplier", [(0, "Supplier#0", 0, 1.0)], None, StructType([
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]))
    _write(spark, d, "part", [(0, "edge part", "Brand#1", "EDGE TYPE", 1, 0.01)],
           None, StructType([
               StructField("p_partkey", LongType()),
               StructField("p_name", StringType()),
               StructField("p_brand", StringType()),
               StructField("p_type", StringType()),
               StructField("p_size", IntegerType()),
               StructField("p_retailprice", DoubleType()),
           ]))
    # tied totalprice (top-k tie-break), one order in the Q4 window,
    # priorities covering URGENT/HIGH
    _write(spark, d, "orders", [
        (0, 0, "O", 100.0, _ts(1996, 8, 1), "1-URGENT"),
        (1, 0, "F", 100.0, _ts(1996, 1, 2), "2-HIGH"),
        (2, 1, "O", 0.0, _ts(1997, 6, 1), "5-LOW"),
    ], None, StructType([
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]))
    # boundary discounts (0.02/0.04), quantity at the Q6 cap, a late and
    # an early shipment around each query's date windows
    _write(spark, d, "lineitem", [
        (0, 0, 0, 1, 23.0, 1000.0, 0.02, 0.01, "N", "O", _ts(1996, 8, 15)),
        (0, 0, 0, 2, 24.0, 2000.0, 0.04, 0.02, "R", "F", _ts(1996, 2, 1)),
        (1, 0, 0, 1, 1.0, 50.0, 0.0, 0.0, "A", "F", _ts(1997, 2, 1)),
        (2, 0, 0, 1, 50.0, 0.0, 0.1, 0.08, "N", "O", _ts(1997, 7, 1)),
    ], None, StructType([
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]))
    _write(spark, d, "documents", EDGE_DOCS,
           ["doc_id", "text", "lang", "source", "n_chars"])

    dim = 64

    def vec(seed):
        return [((seed * 31 + i * 7) % 13 - 6) / 7.0 for i in range(dim)]

    _write(spark, d, "embeddings", [
        (0, vec(3), 1),
        (1, vec(3), 1),            # duplicate (cosine 1.0)
        (2, [0.5] * dim, 2),
        (3, vec(9), 0),
        (4, [-x for x in vec(9)], 2),  # antipode
    ], None, StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]))

    def at(sec):
        return T0 + dt.timedelta(seconds=sec)

    _write(spark, d, "events", [
        (0, at(0), 1, "view", 10.0, '{"k": 1}'),
        (1, at(0), 1, "view", 20.0, '{"k": 2}'),
        (2, at(0), 1, "purchase", 5.0, '{"k": 3}'),
        (3, at(1800), 1, "view", 30.0, '{"k": 4}'),
        (4, at(1801), 1, "purchase", 6.0, None),
        (5, at(3600), 2, "constant", 7.0, '{"k": 1.5}'),
        (6, at(3700), 2, "constant", 7.0, '{"k": "x"}'),
        (7, at(3800), 2, "constant", 7.0, "not json"),
        (8, at(7200), 3, "error", 100.0, '{"k": 0}'),
        (9, at(7500), 3, "view", -50.0, "{}"),
    ], None, StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]))
    return str(d)


@pytest.fixture(scope="module")
def edge_wh_duck(edge_wh_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_wh_dir}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "name", sorted(n for n, q in harness.REGISTRY.items() if q.oracle)
)
def test_full_registry_over_edge_warehouse(spark, edge_wh_dir, edge_wh_duck, name):
    q = harness.REGISTRY[name]
    res = compare(name, spark, edge_wh_duck, edge_wh_dir, q.raw_fn, q.oracle)
    assert res.ok, f"{name}: {res.msg}"
