"""Core relational demonstrations of SURVEY.md §2's operator inventory.

Mapping convention (FIXTURES.md §B): SPARQL-shaped operators are demonstrated
relationally — BGP join ≈ ``orders ⋈ customer ⋈ nation ⋈ region``; FILTER NOT
EXISTS ≈ anti-join; the golden bounding-box FILTER (reference
``facilities.ttl:211-218``) ≈ a two-column range predicate; etc. Every
aggregate over ``double`` money columns is computed as
``SUM(CAST(x AS DECIMAL(18,2)))`` then cast back to double: decimal addition
is exact and associative, so Spark's partial-aggregation order and DuckDB's
serial order produce bit-identical results (doubles would not).

Scale notes (100 TB design): every query here is a declarative DataFrame plan
— Catalyst gets filter/projection pushdown into the Parquet scans, AQE picks
broadcast sides for the small dims (region/nation/supplier), and the only
shuffles are the semantically required ones (groupBy/join keys). No
collect()-driven loops; the one iterative operator (transitive closure) joins
a frontier DataFrame per round and unions lazily.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from dublin_smart_city_graphdb_spark.harness.registry import load, register


def _money_sum(col):
    """Deterministic (order-independent) sum of a 2-dp double column."""
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double")


_MONEY_SUM_SQL = "CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# P1/P2/J1 — BGP join chain (reference README.md:70-78 acceptance query shape)
# ---------------------------------------------------------------------------

@register(
    "bgp_join_chain",
    """
    SELECT o.o_orderkey, c.c_name, n.n_name, r.r_name
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'O'
    """,
    doc="SURVEY §2.2 P2 / §2.3 J1: multi-pattern BGP as an equi-join chain "
        "with small-dim broadcast (README.md:73-77).",
)
def bgp_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("o_orderkey", "c_name", "n_name", "r_name")
    )


# ---------------------------------------------------------------------------
# J1×5 + A2 — six-table star join with a correlated equality (TPC-H Q5
# shape): the deepest join chain in the harness; the local-supplier
# predicate (c_nationkey = s_nationkey) joins two big fact-side paths.
# ---------------------------------------------------------------------------

@register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
               AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-table join (two broadcast dims, big sides "
        "shuffle-joined on their keys) + local-supplier correlated equality "
        "+ decimal-exact revenue sum. The per-double product happens in IEEE "
        "double on both engines; only the (associativity-sensitive) SUM runs "
        "in decimal.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# J1×2 + A2 + M5 — TPC-H Q3 shape: selective dim filter → two big joins →
# grouped revenue → top-k (the classic "shipping priority" plan)
# ---------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey AS o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
               AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: the selective BUILDING-segment customer filter "
        "broadcast-semi-joins into orders, lineitem shuffle-joins on the "
        "order key, decimal-exact revenue per order, TakeOrderedAndProject "
        "top-10 (never a global sort). Filters reach both parquet scans "
        "as pushed predicates.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1997-01-01"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1997-01-01"
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# P6/A3 — selective filter + global aggregate (TPC-H Q6 shape): the pure
# predicate-pushdown showcase — every WHERE clause reaches the parquet scan
# ---------------------------------------------------------------------------

@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: scan-only revenue forecast — no join, one partial "
        "+ final aggregate, and every predicate (shipdate range, discount "
        "band, quantity cap) is pushed into the parquet scan where row-group "
        "min/max stats prune IO before rows are ever decoded. Revenue is an "
        "exact decimal product/sum (order-independent), surfaced as double.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(4,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# J4/A2 — EXISTS semi-join feeding a grouped count (TPC-H Q4 shape)
# ---------------------------------------------------------------------------

@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: a quarter's orders semi-joined (EXISTS → "
        "left_semi, each order emitted once however many lineitems "
        "qualify) against late-shipping lineitems, then a tiny "
        "5-priority grouped count. The date window is pushed into the "
        "orders scan; the semi-join's non-equi shipdate predicate rides "
        "the join condition, so lineitem is never materialized past it.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# A2/A3/A7 — grouped aggregation (TPC-H Q1 shape; SPARQL GROUP BY analog,
# reference facilities.ttl:190-193)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_MONEY_SUM_SQL.format(c='l_quantity')} AS sum_qty,
           {_MONEY_SUM_SQL.format(c='l_extendedprice')} AS sum_base_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 0
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="SURVEY §2.4 A2/A3/A7 + §2.5 M2: grouped agg with HAVING and sort "
        "(facilities.ttl:190-193 analog).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum("l_quantity").alias("sum_qty"),
            _money_sum("l_extendedprice").alias("sum_base_price"),
            F.count("*").alias("count_order"),
        )
        .filter(F.col("count_order") > 0)
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# M5 — top-k (ORDER BY + LIMIT → TakeOrderedAndProject)
# ---------------------------------------------------------------------------

@register(
    "top_k_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="SURVEY §2.5 M5: top-k; Catalyst plans TakeOrderedAndProject "
        "(no full sort at scale).",
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# M2/M3 — ORDER BY + OFFSET slice
# ---------------------------------------------------------------------------

@register(
    "order_offset_slice",
    """
    SELECT c_custkey, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 20 OFFSET 10
    """,
    doc="SURVEY §2.5 M2/M3: ORDER BY with OFFSET (Spark 3.4+ native offset).",
)
def order_offset_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .offset(10)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# M4 — DISTINCT
# ---------------------------------------------------------------------------

@register(
    "distinct_segments",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="SURVEY §2.5 M4: DISTINCT projection (map-side partial dedup free "
        "from Catalyst).",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# A1 — global COUNT(*) (the reference's verification query,
# init-graphdb.sh:133)
# ---------------------------------------------------------------------------

@register(
    "count_star",
    "SELECT COUNT(*) AS n FROM lineitem",
    doc="SURVEY §2.4 A1: global count; partial+final agg (init-graphdb.sh:133 "
        "analog).",
)
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# A4 — COUNT(DISTINCT)
# ---------------------------------------------------------------------------

@register(
    "count_distinct_custkeys",
    "SELECT COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders FROM orders",
    doc="SURVEY §2.4 A4: exact distinct count (expand+two-phase agg in Spark).",
)
def count_distinct_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# A5 — GROUP_CONCAT (deterministic via sorted collect)
# ---------------------------------------------------------------------------

@register(
    "group_concat_nations",
    """
    SELECT r.r_name, STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    doc="SURVEY §2.4 A5: GROUP_CONCAT(separator) ≈ concat_ws(collect_list); "
        "sorted for determinism (SPARQL leaves order unspecified).",
)
def group_concat_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"))
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# A6 — SAMPLE (made deterministic with min)
# ---------------------------------------------------------------------------

@register(
    "sample_per_group",
    """
    SELECT c_mktsegment, MIN(c_name) AS sample_name
    FROM customer GROUP BY c_mktsegment
    """,
    doc="SURVEY §2.4 A6: SAMPLE(?v) — SPARQL allows any member; we pick MIN "
        "so the oracle is deterministic.",
)
def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.min("c_name").alias("sample_name"))
    )


# ---------------------------------------------------------------------------
# J3 — anti-join (FILTER NOT EXISTS; golden query facilities.ttl:195-202)
# ---------------------------------------------------------------------------

@register(
    "anti_join_no_orders",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="SURVEY §2.3 J3: FILTER NOT EXISTS → left_anti join "
        "(facilities.ttl:198-201: areas with no parks).",
)
def anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# J4 — semi-join (FILTER EXISTS)
# ---------------------------------------------------------------------------

@register(
    "semi_join_urgent",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    doc="SURVEY §2.3 J4: FILTER EXISTS → left_semi join.",
)
def semi_join_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# J2 — OPTIONAL → left outer join (+ COALESCE over the unbound side)
# ---------------------------------------------------------------------------

@register(
    "optional_left_join",
    f"""
    SELECT c.c_custkey,
           COALESCE(agg.n_orders, 0) AS n_orders,
           COALESCE(agg.total_spent, CAST(0.0 AS DOUBLE)) AS total_spent
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders,
               {_MONEY_SUM_SQL.format(c='o_totalprice')} AS total_spent
        FROM orders GROUP BY o_custkey
    ) agg ON c.c_custkey = agg.o_custkey
    """,
    doc="SURVEY §2.3 J2: OPTIONAL {} → left join; unbound → null → COALESCE "
        "(SPARQL unbound compatibility).",
)
def optional_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    agg = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders_raw"),
            _money_sum("o_totalprice").alias("total_spent_raw"),
        )
    )
    return (
        customer.join(agg, customer.c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("n_orders_raw"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("total_spent_raw"), F.lit(0.0)).alias("total_spent"),
        )
    )


# ---------------------------------------------------------------------------
# J5 — MINUS / EXCEPT
# ---------------------------------------------------------------------------

@register(
    "minus_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="SURVEY §2.3 J5: MINUS over compatible solutions → exceptAll/except "
        "on the shared domain.",
)
def minus_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    have = load(spark, sf_dir, "customer").select("c_custkey")
    done = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return have.exceptAll(done.distinct()).distinct()


# ---------------------------------------------------------------------------
# J8 — UNION of group patterns
# ---------------------------------------------------------------------------

@register(
    "union_priorities",
    """
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    doc="SURVEY §2.3 J8: UNION → unionByName (unbound vars → nulls via "
        "allowMissingColumns).",
)
def union_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    b = orders.filter(F.col("o_orderpriority") == "2-HIGH")
    return a.unionByName(b)


# ---------------------------------------------------------------------------
# J7 — VALUES inline table join
# ---------------------------------------------------------------------------

@register(
    "values_inline_join",
    """
    SELECT n.n_nationkey, n.n_name, v.bloc
    FROM nation n
    JOIN (VALUES ('NATION_0', 'EU'), ('NATION_1', 'EU'), ('NATION_2', 'EU'),
                 ('NATION_3', 'APAC'), ('NATION_4', 'APAC')) v(n_name, bloc)
      ON n.n_name = v.n_name
    ORDER BY n.n_nationkey
    """,
    doc="SURVEY §2.3 J7: VALUES {} → literal DataFrame + broadcast inner join.",
)
def values_inline_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    vals = spark.createDataFrame(
        [("NATION_0", "EU"), ("NATION_1", "EU"), ("NATION_2", "EU"),
         ("NATION_3", "APAC"), ("NATION_4", "APAC")],
        ["v_name", "bloc"],
    )
    return (
        nation.join(F.broadcast(vals), nation.n_name == vals.v_name)
        .select("n_nationkey", "n_name", "bloc")
        .orderBy("n_nationkey")
    )


# ---------------------------------------------------------------------------
# J6 — theta (non-equi) join
# ---------------------------------------------------------------------------

@register(
    "theta_join_nation_pairs",
    """
    SELECT a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    doc="SURVEY §2.3 J6: theta join (equi on region + strict inequality); "
        "Catalyst picks broadcast-hash + post-filter.",
)
def theta_join_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b")
    )


# ---------------------------------------------------------------------------
# P6 — FILTER bounding box (golden query facilities.ttl:211-218 analog)
# ---------------------------------------------------------------------------

@register(
    "filter_bbox",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_extendedprice > 20000 AND l_extendedprice < 30000
      AND l_discount > 0.02 AND l_discount < 0.08
    """,
    doc="SURVEY §2.2 P6: conjunctive range FILTER (the lat/lon bounding box "
        "at facilities.ttl:216-217); pushed to the Parquet scan.",
)
def filter_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_extendedprice") > 20000)
            & (F.col("l_extendedprice") < 30000)
            & (F.col("l_discount") > 0.02)
            & (F.col("l_discount") < 0.08)
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )


# ---------------------------------------------------------------------------
# §2.7 — scalar string functions
# ---------------------------------------------------------------------------

@register(
    "scalar_strings",
    """
    SELECT c_custkey,
           UPPER(c_name) AS uname,
           LOWER(c_mktsegment) AS lseg,
           LENGTH(c_name) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           c_name || '/' || c_mktsegment AS concat_nm,
           REPLACE(c_name, 'Customer', 'Cust') AS replaced,
           CASE WHEN c_name LIKE 'Customer%' THEN 1 ELSE 0 END AS starts_cust,
           CASE WHEN contains(c_name, '1') THEN 1 ELSE 0 END AS has_one
    FROM customer
    """,
    doc="SURVEY §2.7 strings: STRLEN/UCASE/LCASE/SUBSTR/CONCAT/REPLACE/"
        "STRSTARTS/CONTAINS compiled to JVM builtins (no Python UDFs).",
)
def scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("concat_nm"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.when(F.col("c_name").startswith("Customer"), 1).otherwise(0).alias("starts_cust"),
        F.when(F.col("c_name").contains("1"), 1).otherwise(0).alias("has_one"),
    )


# ---------------------------------------------------------------------------
# §2.7 — scalar numeric functions
# ---------------------------------------------------------------------------

@register(
    "scalar_numeric",
    """
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_d,
           ROUND(l_extendedprice, 1) AS round_p,
           CAST(CEIL(l_quantity) AS BIGINT) AS ceil_q,
           CAST(FLOOR(l_quantity) AS BIGINT) AS floor_q
    FROM lineitem
    WHERE l_orderkey < 500
    """,
    doc="SURVEY §2.7 numerics: ABS/ROUND/CEIL/FLOOR (ROUND half-up matches "
        "DuckDB on positive doubles). Spark CEIL/FLOOR return LongType, so "
        "the oracle casts DuckDB's DOUBLE result to BIGINT — values are "
        "bit-identical, only the carrier type differed (r1 hash mismatch).",
)
def scalar_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.round("l_extendedprice", 1).alias("round_p"),
        F.ceil("l_quantity").alias("ceil_q"),
        F.floor("l_quantity").alias("floor_q"),
    )


# ---------------------------------------------------------------------------
# §2.7 — date/time accessors
# ---------------------------------------------------------------------------

@register(
    "scalar_datetime",
    """
    SELECT o_orderkey,
           YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m, DAY(o_orderdate) AS d,
           HOUR(o_orderdate) AS h
    FROM orders WHERE o_orderkey < 1000
    """,
    doc="SURVEY §2.7 date/time: YEAR/MONTH/DAY/HOURS accessors.",
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.hour("o_orderdate").alias("h"),
    )


# ---------------------------------------------------------------------------
# §2.7 — hash functions
# ---------------------------------------------------------------------------

@register(
    "scalar_hash",
    """
    SELECT c_custkey, MD5(c_name) AS md5_name, SHA256(c_name) AS sha256_name
    FROM customer WHERE c_custkey <= 50
    """,
    doc="SURVEY §2.7 hash: MD5/SHA256 → identical hex digests both engines.",
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 50)
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("md5_name"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("sha256_name"),
    )


# ---------------------------------------------------------------------------
# §2.7 — functional forms: IF / COALESCE / IN
# ---------------------------------------------------------------------------

@register(
    "functional_forms",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_class,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_hot,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label
    FROM orders
    """,
    doc="SURVEY §2.7 functional forms: IF→when/otherwise, IN→isin, "
        "COALESCE; SPARQL error→null semantics ride on SQL NULL here.",
)
def functional_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("is_hot"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_label"),
    )


# ---------------------------------------------------------------------------
# §2.7 — REGEX filter
# ---------------------------------------------------------------------------

@register(
    "regex_filter",
    """
    SELECT p_partkey, p_type
    FROM part
    WHERE regexp_matches(p_type, '^S(TANDARD|MALL)$')
    """,
    doc="SURVEY §2.7 REGEX: rlike anchored pattern (Java vs RE2 dialects "
        "agree on this subset; XPath-flavor divergences documented).",
)
def regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(F.col("p_type").rlike("^S(TANDARD|MALL)$")).select(
        "p_partkey", "p_type"
    )


# ---------------------------------------------------------------------------
# F5 — scalar subquery
# ---------------------------------------------------------------------------

@register(
    "subquery_above_avg",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM orders
    )
    """,
    doc="SURVEY §2.6 F5: scalar subquery (nested SELECT); threshold computed "
        "with exact decimal sum so both engines agree bit-for-bit.",
)
def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    thr = o.agg(
        (_money_sum("o_totalprice") / F.count("*")).alias("thr")
    )
    return (
        o.join(F.broadcast(thr))
        .filter(F.col("o_totalprice") > F.col("thr"))
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Geo — Haversine distance (SURVEY §2.7 geof:distance as a SQL expression)
# ---------------------------------------------------------------------------

_HAVERSINE_SQL = """
    SELECT c_custkey, lat, lon,
           ROUND(12742.0 * ASIN(SQRT(
               POW(SIN(RADIANS(lat - 53.3498) / 2), 2)
               + COS(RADIANS(53.3498)) * COS(RADIANS(lat))
                 * POW(SIN(RADIANS(lon - (-6.2603)) / 2), 2)
           )), 3) AS dist_km
    FROM (
        SELECT c_custkey,
               CAST(53.20 + (c_custkey % 100) * 0.002 AS DOUBLE) AS lat,
               CAST(-6.45 + (c_custkey % 80) * 0.005 AS DOUBLE) AS lon
        FROM customer
    )
"""


@register(
    "geo_haversine",
    _HAVERSINE_SQL,
    doc="SURVEY §2.7 geo: geof:distance → Haversine as a pure Spark SQL "
        "expression (reference uses lat/lon FILTERs, facilities.ttl:211-218); "
        "synthetic coords derived from c_custkey.",
)
def geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    lat = (F.lit(53.20) + (F.col("c_custkey") % 100) * 0.002).alias("lat")
    lon = (F.lit(-6.45) + (F.col("c_custkey") % 80) * 0.005).alias("lon")
    base = c.select("c_custkey", lat, lon)
    dlat = F.radians(F.col("lat") - 53.3498) / 2
    dlon = F.radians(F.col("lon") - (-6.2603)) / 2
    h = (
        F.pow(F.sin(dlat), 2)
        + F.cos(F.radians(F.lit(53.3498))) * F.cos(F.radians(F.col("lat"))) * F.pow(F.sin(dlon), 2)
    )
    return base.withColumn("dist_km", F.round(12742.0 * F.asin(F.sqrt(h)), 3))


# ---------------------------------------------------------------------------
# P7 — transitive closure (property path + / *) via iterative frontier joins
# ---------------------------------------------------------------------------

@register(
    "graph_transitive_closure",
    """
    WITH RECURSIVE edges AS (
        SELECT c_custkey AS src, 100000 + c_nationkey AS dst FROM customer
        UNION ALL
        SELECT 100000 + n_nationkey AS src, 200000 + n_regionkey AS dst FROM nation
    ),
    reach AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT DISTINCT src, dst FROM reach
    """,
    doc="SURVEY §2.2 P7 + §4.2(3): property path '+' → driver-side "
        "iterate-to-fixpoint frontier joins (Catalyst has no recursion); "
        "oracle uses DuckDB WITH RECURSIVE.",
    cache_plan=False,
)
def graph_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    e1 = customer.select(
        F.col("c_custkey").cast("long").alias("src"),
        (F.lit(100000) + F.col("c_nationkey")).cast("long").alias("dst"),
    )
    e2 = nation.select(
        (F.lit(100000) + F.col("n_nationkey")).cast("long").alias("src"),
        (F.lit(200000) + F.col("n_regionkey")).cast("long").alias("dst"),
    )
    edges = e1.unionByName(e2)
    from dublin_smart_city_graphdb_spark.graph.closure import transitive_closure

    return transitive_closure(edges, "src", "dst")


# ---------------------------------------------------------------------------
# Graph analytics (BASELINE.json north star "GraphX for analytics queries"):
# PageRank over the who-buys-from-whom graph
# ---------------------------------------------------------------------------

_PR_DAMP_NUM, _PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio
_PR_UNIT = 10**9  # rank 1.0 == 1e9 nano-units (fixed-point)
_PR_BASE_UNITS = (_PR_UNIT * (_PR_DAMP_DEN - _PR_DAMP_NUM)) // _PR_DAMP_DEN


def _pr_round_sql(k: int) -> str:
    # The rank pipeline is pure fixed-point INTEGER arithmetic (nano-units,
    # truncating division) — bit-exact in any engine. Both a 9-dp DOUBLE
    # round and a double→DECIMAL cast proved tie-sensitive across engines
    # (1-ulp oracle drifts at sf1); integer ops cannot drift. DuckDB `//`
    # on BIGINT/HUGEINT truncates toward zero like Spark's `div`; all
    # values here are positive so floor==trunc anyway. SUM(BIGINT) rides
    # in HUGEINT so the damping product can't overflow mid-expression.
    return f"""
    c{k} AS (
        SELECT e.dst AS id, r.rank // d.out_deg AS c
        FROM edges e JOIN r{k - 1} r ON e.src = r.id JOIN deg d ON e.src = d.id
    ),
    s{k} AS (
        SELECT id, SUM(c) AS in_sum FROM c{k} GROUP BY id
    ),
    r{k} AS (
        SELECT n.id,
               CAST({_PR_BASE_UNITS} + ({_PR_DAMP_NUM} *
                    COALESCE(s{k}.in_sum, 0)) // {_PR_DAMP_DEN}
                    AS BIGINT) AS rank
        FROM nodes n LEFT JOIN s{k} ON n.id = s{k}.id
    )"""


_PAGERANK_SQL = f"""
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS src, 1000000 + l.l_suppkey AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    deg AS (SELECT src AS id, COUNT(*) AS out_deg FROM edges GROUP BY src),
    r0 AS (SELECT id, CAST({_PR_UNIT} AS BIGINT) AS rank FROM nodes),
    {_pr_round_sql(1)},
    {_pr_round_sql(2)}
    SELECT id, CAST(rank AS DOUBLE) / {float(_PR_UNIT)} AS rank FROM r2
"""


@register(
    "graph_pagerank",
    _PAGERANK_SQL,
    doc="PageRank (2 power iterations, d=0.85) over the customer→supplier "
        "purchase graph (distinct orders⋈lineitem pairs). Per round one "
        "groupBy(dst) shuffle of rank/out_deg contributions — the GraphX "
        "aggregateMessages shape as pure DataFrame ops; decimal-exact "
        "contribution sums keep distributed partial-sum order out of the "
        "result.",
    cache_plan=False,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(1000000) + F.col("l_suppkey")).cast("long").alias("dst"),
        )
        .distinct()
    )
    from dublin_smart_city_graphdb_spark.graph.closure import pagerank

    return pagerank(
        edges, iterations=2, damping=_PR_DAMP_NUM / _PR_DAMP_DEN
    ).select(
        "id", "rank"
    )


def _ppr_round_sql(k: int) -> str:
    # Same fixed-point integer pipeline as _pr_round_sql, but the teleport
    # base lands ONLY on the personalization sources.
    return f"""
    c{k} AS (
        SELECT e.dst AS id, r.rank // d.out_deg AS c
        FROM edges e JOIN r{k - 1} r ON e.src = r.id JOIN deg d ON e.src = d.id
    ),
    s{k} AS (
        SELECT id, SUM(c) AS in_sum FROM c{k} GROUP BY id
    ),
    r{k} AS (
        SELECT n.id,
               CAST(CASE WHEN n.id IN (SELECT id FROM srcs)
                         THEN {_PR_BASE_UNITS} ELSE 0 END
                    + ({_PR_DAMP_NUM} * COALESCE(s{k}.in_sum, 0))
                      // {_PR_DAMP_DEN} AS BIGINT) AS rank
        FROM nodes n LEFT JOIN s{k} ON n.id = s{k}.id
    )"""


_PPR_SQL = f"""
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS src, 1000000 + l.l_suppkey AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    deg AS (SELECT src AS id, COUNT(*) AS out_deg FROM edges GROUP BY src),
    srcs AS (SELECT DISTINCT src AS id FROM edges WHERE src % 100 = 0),
    r0 AS (
        SELECT id, CAST(CASE WHEN id IN (SELECT id FROM srcs)
                             THEN {_PR_UNIT} ELSE 0 END AS BIGINT) AS rank
        FROM nodes
    ),
    {_ppr_round_sql(1)},
    {_ppr_round_sql(2)}
    SELECT id, CAST(rank AS DOUBLE) / {float(_PR_UNIT)} AS rank FROM r2
"""


@register(
    "graph_pagerank_personalized",
    _PPR_SQL,
    doc="Personalized PageRank (2 rounds, d=0.85, teleport restricted to "
        "every-100th customer) over the purchase graph — GraphX's "
        "personalized variant: ranks seed at 1.0 on the sources, the "
        "(1-d) base lands only on sources each round, so mass "
        "concentrates in the seeds' forward neighborhoods. Same "
        "fixed-point integer arithmetic as graph_pagerank (bit-exact); "
        "the source set is one checkpointed semi-join side (broadcast at "
        "scale). Oracle: the unrolled CTE rounds with the CASE teleport.",
    cache_plan=False,
)
def graph_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.graph.closure import (
        personalized_pagerank,
    )

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(1000000) + F.col("l_suppkey")).cast("long").alias("dst"),
        )
        .distinct()
    )
    sources = edges.filter(F.col("src") % 100 == 0).select(
        F.col("src").alias("id")
    ).distinct()
    return personalized_pagerank(
        edges, sources, iterations=2,
        damping=_PR_DAMP_NUM / _PR_DAMP_DEN,
    ).select("id", "rank")


# Weighted SSSP over the layered warehouse DAG: customer → (1e6+supplier)
# [weight from the pair keys] → (2e6+nation) → (3e6+region); multi-source
# from every 1000th customer. Depth 3 bounds both the engine's relaxation
# rounds and the oracle's recursive CTE.
_SSSP_SQL = """
    WITH RECURSIVE
    e AS (
        SELECT DISTINCT o.o_custkey AS src, 1000000 + l.l_suppkey AS dst,
               (o.o_custkey + l.l_suppkey) % 7 + 1 AS w
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        UNION ALL
        SELECT 1000000 + s_suppkey, 2000000 + s_nationkey,
               s_suppkey % 5 + 1
        FROM supplier
        UNION ALL
        SELECT 2000000 + n_nationkey, 3000000 + n_regionkey,
               n_nationkey % 3 + 1
        FROM nation
    ),
    walk(id, d) AS (
        SELECT c_custkey, CAST(0 AS BIGINT) FROM customer
        WHERE c_custkey % 1000 = 1
        UNION
        SELECT e.dst, w.d + e.w FROM walk w JOIN e ON e.src = w.id
    )
    SELECT id, MIN(d) AS dist FROM walk GROUP BY id
"""


@register(
    "graph_sssp",
    _SSSP_SQL,
    doc="Weighted single-source shortest paths (Bellman-Ford as "
        "semi-naive frontier relaxation — the GraphX Pregel "
        "shortestPaths generalized to integer weights) over the layered "
        "customer→supplier→nation→region DAG, multi-source. Each round "
        "is one frontier⋈edges join + one min-aggregate shuffle; only "
        "strict improvements re-enter the frontier, and the "
        "empty-frontier probe is the only driver traffic. The oracle is "
        "an independent recursive-CTE walk with min-aggregation.",
    cache_plan=False,
)
def graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.graph.closure import sssp

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    e1 = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(1000000) + F.col("l_suppkey")).cast("long").alias("dst"),
            ((F.col("o_custkey") + F.col("l_suppkey")) % 7 + 1)
            .cast("long").alias("w"),
        )
        .distinct()
    )
    e2 = supplier.select(
        (F.lit(1000000) + F.col("s_suppkey")).cast("long").alias("src"),
        (F.lit(2000000) + F.col("s_nationkey")).cast("long").alias("dst"),
        (F.col("s_suppkey") % 5 + 1).cast("long").alias("w"),
    )
    e3 = nation.select(
        (F.lit(2000000) + F.col("n_nationkey")).cast("long").alias("src"),
        (F.lit(3000000) + F.col("n_regionkey")).cast("long").alias("dst"),
        (F.col("n_nationkey") % 3 + 1).cast("long").alias("w"),
    )
    edges = e1.unionByName(e2).unionByName(e3)
    sources = customer.filter(F.col("c_custkey") % 1000 == 1).select(
        F.col("c_custkey").cast("long").alias("id")
    )
    return sssp(edges, sources).select(
        F.col("id").cast("bigint").alias("id"),
        F.col("dist").cast("bigint").alias("dist"),
    )


_HITS_SQL = """
    WITH e AS (
        SELECT DISTINCT o.o_custkey AS src, 1000000 + l.l_suppkey AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        UNION
        SELECT DISTINCT 1000000 + s_suppkey, 2000000 + s_nationkey
        FROM supplier
        UNION
        SELECT DISTINCT 2000000 + n_nationkey, 3000000 + n_regionkey
        FROM nation
    ),
    nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
    a1 AS (
        SELECT n.id, COALESCE(x.a, 0) AS a FROM nodes n LEFT JOIN (
            SELECT dst AS id, CAST(COUNT(*) AS HUGEINT) AS a
            FROM e GROUP BY dst) x ON x.id = n.id
    ),
    h1 AS (
        SELECT n.id, COALESCE(x.h, 0) AS h FROM nodes n LEFT JOIN (
            SELECT e.src AS id, SUM(a1.a) AS h
            FROM e JOIN a1 ON a1.id = e.dst GROUP BY e.src) x ON x.id = n.id
    ),
    a2 AS (
        SELECT n.id, COALESCE(x.a, 0) AS a FROM nodes n LEFT JOIN (
            SELECT e.dst AS id, SUM(h1.h) AS a
            FROM e JOIN h1 ON h1.id = e.src GROUP BY e.dst) x ON x.id = n.id
    ),
    h2 AS (
        SELECT n.id, COALESCE(x.h, 0) AS h FROM nodes n LEFT JOIN (
            SELECT e.src AS id, SUM(a2.a) AS h
            FROM e JOIN a2 ON a2.id = e.dst GROUP BY e.src) x ON x.id = n.id
    )
    SELECT h2.id AS id, CAST(h2.h AS BIGINT) AS hub,
           CAST(a2.a AS BIGINT) AS authority
    FROM h2 JOIN a2 ON a2.id = h2.id
"""


def _lpa_round_sql(k: int) -> str:
    """One unrolled label-propagation round: neighbor-label counts, the
    (count DESC, label ASC) argmax per node, previous label as fallback."""
    p = k - 1
    return f"""
    c{k} AS (
        SELECT u.a AS id, l.label, COUNT(*) AS n
        FROM und u JOIN lab{p} l ON l.id = u.b GROUP BY u.a, l.label
    ),
    b{k} AS (
        SELECT id, label FROM (
            SELECT id, label,
                   ROW_NUMBER() OVER (
                       PARTITION BY id ORDER BY n DESC, label ASC) AS rn
            FROM c{k}) WHERE rn = 1
    ),
    lab{k} AS (
        SELECT p.id, COALESCE(b.label, p.label) AS label
        FROM lab{p} p LEFT JOIN b{k} b ON b.id = p.id
    )"""


_LPA_SQL = f"""
    WITH e0 AS (
        SELECT DISTINCT o.o_custkey AS src, 1000000 + l.l_suppkey AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        UNION
        SELECT DISTINCT 1000000 + s_suppkey, 2000000 + s_nationkey
        FROM supplier
        UNION
        SELECT DISTINCT 2000000 + n_nationkey, 3000000 + n_regionkey
        FROM nation
    ),
    und AS (
        SELECT src AS a, dst AS b FROM e0 WHERE src <> dst
        UNION
        SELECT dst, src FROM e0 WHERE src <> dst
    ),
    nodes AS (SELECT DISTINCT a AS id FROM und),
    lab0 AS (SELECT id, id AS label FROM nodes),
    {_lpa_round_sql(1)},
    {_lpa_round_sql(2)}
    SELECT id, CAST(label AS BIGINT) AS label FROM lab2
"""


@register(
    "graph_label_propagation",
    _LPA_SQL,
    doc="Synchronous label propagation (community detection), 2 rounds, "
        "deterministic (count DESC, label ASC) adoption — GraphX "
        "LabelPropagation with a reproducible tie-break. Per round one "
        "neighbor join + one count aggregation + one per-node argmax, "
        "all on the node key. Oracle: the unrolled window-function CTEs.",
    cache_plan=False,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.graph.closure import (
        label_propagation,
    )

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    e1 = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(1000000) + F.col("l_suppkey")).cast("long").alias("dst"),
        )
        .distinct()
    )
    e2 = supplier.select(
        (F.lit(1000000) + F.col("s_suppkey")).cast("long").alias("src"),
        (F.lit(2000000) + F.col("s_nationkey")).cast("long").alias("dst"),
    )
    e3 = nation.select(
        (F.lit(2000000) + F.col("n_nationkey")).cast("long").alias("src"),
        (F.lit(3000000) + F.col("n_regionkey")).cast("long").alias("dst"),
    )
    return label_propagation(
        e1.unionByName(e2).unionByName(e3), iterations=2
    ).select(
        F.col("id").cast("bigint").alias("id"),
        F.col("label").cast("bigint").alias("label"),
    )


@register(
    "graph_hits",
    _HITS_SQL,
    doc="HITS hubs/authorities (2 iterations, unnormalized integer "
        "arithmetic — bit-exact across engines like graph_pagerank) over "
        "the layered customer→supplier→nation→region warehouse graph. "
        "Each round is two aggregate-message shuffles; the oracle is the "
        "unrolled CTE chain.",
    cache_plan=False,
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.graph.closure import hits_scores

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    e1 = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(1000000) + F.col("l_suppkey")).cast("long").alias("dst"),
        )
        .distinct()
    )
    e2 = supplier.select(
        (F.lit(1000000) + F.col("s_suppkey")).cast("long").alias("src"),
        (F.lit(2000000) + F.col("s_nationkey")).cast("long").alias("dst"),
    )
    e3 = nation.select(
        (F.lit(2000000) + F.col("n_nationkey")).cast("long").alias("src"),
        (F.lit(3000000) + F.col("n_regionkey")).cast("long").alias("dst"),
    )
    return hits_scores(e1.unionByName(e2).unionByName(e3), iterations=2)


def _kcore_round_sql(k: int, r: int) -> str:
    p = r - 1
    return f"""
    deg{r} AS (
        SELECT u.a AS id, COUNT(*) AS n
        FROM und u
        WHERE u.a IN (SELECT id FROM alive{p})
          AND u.b IN (SELECT id FROM alive{p})
        GROUP BY u.a
    ),
    alive{r} AS (SELECT id FROM deg{r} WHERE n >= {k})"""


_KCORE_K = 10
_KCORE_SQL = f"""
    WITH e0 AS (
        SELECT DISTINCT l_partkey AS src, 1000000 + l_suppkey AS dst
        FROM lineitem
    ),
    und AS (
        SELECT src AS a, dst AS b FROM e0 WHERE src <> dst
        UNION
        SELECT dst, src FROM e0 WHERE src <> dst
    ),
    alive0 AS (SELECT DISTINCT a AS id FROM und),
    {_kcore_round_sql(_KCORE_K, 1)},
    {_kcore_round_sql(_KCORE_K, 2)},
    {_kcore_round_sql(_KCORE_K, 3)}
    SELECT CAST(u.a AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS degree
    FROM und u
    WHERE u.a IN (SELECT id FROM alive3)
      AND u.b IN (SELECT id FROM alive3)
    GROUP BY u.a
"""


@register(
    "graph_kcore",
    _KCORE_SQL,
    doc=f"k-core decomposition (k={_KCORE_K}, 3 synchronous peel rounds — "
        "the fixed-round contract that makes iterative graph ops "
        "oracle-reproducible, like graph_pagerank/graph_hits) over the "
        "part<->supplier co-occurrence graph from lineitem. Per round: "
        "two semi-joins restrict edges to alive x alive, one degree "
        "aggregation, one threshold filter; output = surviving nodes with "
        "their degree in the surviving subgraph. Oracle: the unrolled "
        "peel CTEs.",
    cache_plan=False,
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.graph.closure import k_core

    li = load(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").cast("long").alias("src"),
        (F.lit(1000000) + F.col("l_suppkey")).cast("long").alias("dst"),
    ).distinct()
    return k_core(edges, k=_KCORE_K, rounds=3).select(
        F.col("id").cast("bigint").alias("id"), "degree"
    )


# ---------------------------------------------------------------------------
# Window extension (SURVEY §2.9/§7): rank + running sum on property-table view
# ---------------------------------------------------------------------------

@register(
    "window_rank_orders",
    """
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    doc="SURVEY §2.9/§7 window extension: per-customer top-3 orders via "
        "row_number (deterministic tiebreak on o_orderkey).",
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    """,
    doc="SURVEY §2.9/§7 window extension: running sum per customer over order "
        "date (decimal accumulation for cross-engine determinism).",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# Rollup extension (Spark-native; SPARQL 1.1 lacks grouping sets — SURVEY A8)
# ---------------------------------------------------------------------------

@register(
    "rollup_returnflag",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="SURVEY §2.4 A8 (extension beyond SPARQL): ROLLUP grouping sets.",
)
def rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@register(
    "cube_flag_status",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="SURVEY §2.4 A8 (extension beyond SPARQL): CUBE grouping sets with "
        "GROUPING() disambiguators (a NULL-valued group vs the all-group "
        "subtotal). One shuffle: Spark expands the grouping sets map-side "
        "and aggregates partially before exchange, so the cube costs the "
        "same single exchange as a plain groupBy at any scale.",
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").alias("g_flag"),
        F.grouping("l_linestatus").alias("g_status"),
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


@register(
    "intersect_repeat_buyers",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="Set intersection (completes the set-op family next to "
        "union_priorities and minus_except): customers with at least one "
        "urgent order AND at least one finished order. df.intersect — "
        "Catalyst plans it as a distinct + hash semi-join on the full row, "
        "one shuffle per side on the same key.",
)
def intersect_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    done = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersect(done)


# ---------------------------------------------------------------------------
# J1×3 + A2 + M5 — TPC-H Q10 shape: returned-item revenue per customer,
# quarter-scoped, top-20 (the "who should we call" report)
# ---------------------------------------------------------------------------

@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
               AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: one quarter's orders (date range pushed to the "
        "scan) joined to their returned lineitems (returnflag pushed "
        "likewise), revenue re-aggregated per customer, nation broadcast "
        "in for display, top-20 via TakeOrderedAndProject — the global "
        "sort never materializes. Two fact-side shuffle joins on their "
        "natural keys; decimal-exact revenue.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# J1 + A3 — TPC-H Q14 shape: promo revenue share (conditional aggregate
# over a broadcast part join)
# ---------------------------------------------------------------------------

@register(
    "q14_promo_revenue",
    """
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * CAST(1 - l.l_discount AS DECIMAL(4,2))
                         ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
               AS promo_revenue,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
               AS total_revenue,
           ROUND(100.0
                 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                                      * CAST(1 - l.l_discount AS DECIMAL(4,2))
                                 ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE),
                 6) AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
    doc="TPC-H Q14 shape: one month's lineitems (range pushed to the scan) "
        "broadcast-joined to part for the type flag, then a single global "
        "conditional aggregate — promo vs total revenue and their ratio. "
        "Both sums are decimal-exact; the final division runs in double on "
        "two identical operands, so the 6-dp ratio is engine-stable.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(22,4)")
    )
    agg = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum(disc).cast("double").alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_pct"),
    )


# ---------------------------------------------------------------------------
# F5 + J1×2 + A2 + M5 — TPC-H Q18 shape: large-volume orders (HAVING
# subquery over the fact table feeding the display join)
# ---------------------------------------------------------------------------

_Q18_QTY = 250

_Q18_SQL = f"""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
"""


@register(
    "q18_large_volume",
    _Q18_SQL,
    doc=f"TPC-H Q18 shape: orders whose total quantity exceeds {_Q18_QTY} "
        f"(a HAVING aggregate subquery over the fact table) semi-joined "
        f"back in, then customer/order display columns re-aggregated and "
        f"top-100'd by price. The qualifying-key set is tiny, so it "
        f"broadcast-semi-joins into orders; lineitem is scanned twice but "
        f"shuffled on l_orderkey both times (AQE reuses the exchange); "
        f"quantity sums are decimal-exact.",
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("s"))
        .filter(F.col("s") > _Q18_QTY)
        .select("l_orderkey")
    )
    return (
        o.join(
            F.broadcast(big),
            o.o_orderkey == big.l_orderkey,
            "left_semi",
        )
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty).cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H parity completion (adapted to the driver's reduced schema — no
# partsupp / shipmode / commitdate / receiptdate / phone / container
# columns; each query keeps the ORIGINAL's plan shape on the columns that
# exist). All money aggregates are decimal-exact, then cast to double;
# every division happens in IEEE double on already-exact operands so both
# engines execute the identical float op. Reference capability class:
# engine surface (SURVEY §0 S — GraphDB's SQL-comparable analytics
# delegated to the deployed engine), demonstrated relationally per
# FIXTURES.md §B.
# ---------------------------------------------------------------------------

_REV_DEC = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "CAST(1 - l_discount AS DECIMAL(4,2))"
)


@register(
    "q2_min_cost_supplier",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         eligible AS (
           SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, n.n_name
           FROM ps
           JOIN part p ON p.p_partkey = ps.l_partkey
           JOIN supplier s ON s.s_suppkey = ps.l_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE r.r_name = 'EUROPE' AND p.p_type = 'LARGE' AND p.p_size <= 25
         )
    SELECT e.s_acctbal, e.s_name, e.n_name, e.p_partkey, e.p_name
    FROM eligible e
    JOIN (SELECT p_partkey, MAX(s_acctbal) AS m
          FROM eligible GROUP BY p_partkey) mx
      ON mx.p_partkey = e.p_partkey AND e.s_acctbal = mx.m
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, e.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (argmin-per-group correlated subquery): the "
        "part↔supplier relation is emulated from DISTINCT lineitem pairs "
        "(no partsupp table); per-part MAX(s_acctbal) stands in for MIN("
        "ps_supplycost). Spark-side the correlated extremum is a window "
        "MAX over partitionBy(p_partkey) — ONE hash exchange and one pass "
        "over the eligible set, vs the aggregate-then-join decorrelation "
        "that scans it twice (the oracle keeps that two-scan SQL form). "
        "Sort keys are a total order so the LIMIT set is deterministic.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 25)
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .join(s, ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("m", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("m"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             {_REV_DEC} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair trade volume by ship "
        "year. The nation dim joins twice under different roles (supplier "
        "side / customer side) — both broadcast; the disjunctive pair "
        "predicate evaluates after both bindings exist, exactly like the "
        "SPARQL FILTER over two BGP branches it models.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(F.expr(_REV_DEC)).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nat = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             {_REV_DEC} AS volume,
             n2.n_name AS nat
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's share of a region's PROMO-part "
        "revenue by order year — conditional aggregation (CASE inside "
        "SUM) over an 7-table join where nation again plays two roles. "
        "Numerator and denominator are exact decimal sums; the single "
        "share division runs in double on both engines.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_reg")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nat")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.expr(_REV_DEC)
    nat_vol = F.when(F.col("nat") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(4,2)")
    )
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_reg") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(nat_vol).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(4,2))
             - CAST(p.p_retailprice AS DECIMAL(18,2))
               * CAST(l.l_quantity AS DECIMAL(6,2))
               * CAST(0.05 AS DECIMAL(3,2)) AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and order year over "
        "name-LIKE-filtered parts; 5% of retail price stands in for "
        "ps_supplycost (no partsupp table). The profit expression is pure "
        "decimal arithmetic (scales chosen to stay under precision 38 in "
        "both engines), so partial-aggregation order cannot perturb the "
        "sum; LIKE pushes into the part scan.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    amount = F.expr(
        "CAST(l_extendedprice AS DECIMAL(18,2))"
        " * CAST(1 - l_discount AS DECIMAL(4,2))"
        " - CAST(p_retailprice AS DECIMAL(18,2))"
        " * CAST(l_quantity AS DECIMAL(6,2))"
        " * CAST(0.05 AS DECIMAL(3,2))"
    )
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_parts",
    """
    WITH pv AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_quantity AS DECIMAL(6,2))
                 * CAST(p.p_retailprice AS DECIMAL(18,2))) AS value
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(value AS DOUBLE) AS value
    FROM pv
    WHERE CAST(value AS DOUBLE) >
          (SELECT CAST(SUM(value) AS DOUBLE) * 0.001 FROM pv)
    """,
    doc="TPC-H Q11 shape: parts whose inventory value (quantity x retail "
        "price through the lineitem link — no partsupp) exceeds a fraction "
        "of the GLOBAL total: a scalar aggregate subquery in the "
        "predicate. Spark compiles the scalar as a 1-row broadcast "
        "cross-join; both per-part and global sums are exact decimal, the "
        "threshold comparison runs in double on both engines.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2")
    )
    val = F.expr(
        "CAST(l_quantity AS DECIMAL(6,2)) * CAST(p_retailprice AS DECIMAL(18,2))"
    )
    pv = (
        li.join(p, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("value"))
    )
    total = pv.agg(
        (F.sum("value").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


@register(
    "q12_late_lines",
    """
    SELECT CAST(year(CAST(l.l_shipdate AS DATE)) AS INTEGER) AS ship_year,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE date_diff('day', CAST(o.o_orderdate AS DATE),
                    CAST(l.l_shipdate AS DATE)) > 90
    GROUP BY ship_year
    """,
    doc="TPC-H Q12 shape: ship-lag audit — lines shipped >90 days after "
        "the order date, bucketed by ship year with priority-class "
        "conditional counts (ship year replaces the missing l_shipmode "
        "dim). The lag predicate is a theta condition between the two "
        "join sides, evaluated post-join. Hardened for cross-engine "
        "determinism (VERDICT r3 task 1): the lag is a pure DATE "
        "difference (no '+ INTERVAL 90 DAY' on a timestamp, whose LTZ "
        "reading shifts wall-clock across DST boundaries depending on "
        "the session reading the NTZ parquet column), ship_year is "
        "extracted from the DATE, and both counts carry explicit BIGINT "
        "casts so the oracle can never differ in type or tz handling. "
        "Day numbers come from registry.wall_day (epoch-µs floor-div), "
        "which is bit-identical whether the session read the column as "
        "TIMESTAMP_NTZ or LTZ and under any session timezone.",
)
def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import wall_day

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = o.join(li, o.o_orderkey == li.l_orderkey)
    ship_day = wall_day(joined, "l_shipdate")
    order_day = wall_day(joined, "o_orderdate")
    ship_year = F.year(
        F.date_add(F.to_date(F.lit("1970-01-01")), ship_day.cast("int"))
    ).cast("int")
    return (
        joined.filter(ship_day - order_day > 90)
        .groupBy(ship_year.alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: distribution of order counts per customer — a "
        "left join whose EXTRA non-equi condition lives in the join clause "
        "(not a post-filter: customers with only 5-LOW orders must count "
        "as 0, exactly the OPTIONAL-with-FILTER semantics of SURVEY §2.3 "
        "J2), then a second aggregation over the first's result.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_REV_DEC}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15 shape: the supplier(s) achieving MAX quarterly revenue "
        "— a scalar MAX subquery over a derived aggregate (the original's "
        "revenue view). The equality compares doubles that were both "
        "derived from exact decimal sums, so both engines hold identical "
        "bit patterns; the 1-row max broadcasts.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.expr(_REV_DEC)).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_size IN (5, 11, 17, 23, 29, 35, 41, 47)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape: distinct supplier counts per part (brand, type, "
        "size) bucket, excluding a NOT-IN supplier set (negative balances "
        "standing in for the complaints LIKE filter; the part↔supplier "
        "relation rides lineitem — no partsupp). s_suppkey is non-null so "
        "NOT IN compiles to a broadcast anti-join, and the size IN-list "
        "pushes into the part scan.",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_size").isin(5, 11, 17, 23, 29, 35, 41, 47))
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE)
                 / COUNT(*) AS avg_qty
          FROM lineitem GROUP BY l_partkey) a
      ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#5' AND l.l_quantity < 0.2 * a.avg_qty
    """,
    doc="TPC-H Q17 shape: revenue loss from small-quantity orders — the "
        "correlated per-part AVG subquery decorrelated into an aggregate-"
        "then-join (what Catalyst does to the correlated form). The "
        "average is computed as exact-decimal-sum / count in double, so "
        "the 0.2x threshold is bit-identical across engines; the final "
        "division by 7.0 is one double op.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    avg_q = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(6,2)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_q, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_discounted_revenue",
    f"""
    SELECT CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    doc="TPC-H Q19 shape: OR-of-ANDs across both join sides (brand/size "
        "from part, quantity from lineitem). Catalyst extracts the "
        "common-prefix predicates per side and pushes brand/size "
        "disjunctions into the part scan while the cross-side residual "
        "evaluates post-join; revenue is decimal-exact.",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (q >= 1) & (q <= 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (q >= 10) & (q <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & (q >= 20) & (q <= 40)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(F.expr(_REV_DEC)).cast("double").alias("revenue"))
    )


@register(
    "q20_promotable_suppliers",
    """
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_0', 'NATION_1', 'NATION_2',
                       'NATION_3', 'NATION_4')
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'small%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l.l_suppkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(6,2))) > 300
      )
    """,
    doc="TPC-H Q20 shape: suppliers in a nation set who moved >300 units "
        "of 'small%' parts in 1997 — an IN subquery whose body is itself "
        "a grouped aggregate with HAVING (the original's nested "
        "availability check, minus partsupp). The qualifying-supplier set "
        "is tiny → broadcast left-semi join; quantity sum decimal-exact.",
)
def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4"
        )
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qualifying = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(6,2)")).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(
            F.broadcast(qualifying),
            s.s_suppkey == qualifying.l_suppkey,
            "left_semi",
        )
        .select("s_name", "s_acctbal")
    )


@register(
    "q21_waiting_suppliers",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape: suppliers who were the SOLE late shipper "
        "(>60 days after order date, replacing receipt/commit dates) on "
        "completed multi-supplier orders — a correlated EXISTS (another "
        "supplier participated) plus a correlated NOT EXISTS (no other "
        "supplier was late), compiled to a semi- then anti-join of "
        "lineitem against itself on (orderkey, suppkey<>) with the "
        "lateness theta carried from the outer orders row.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    cand = (
        l1.join(o, F.col("l_orderkey") == o.o_orderkey)
        .filter(F.expr("l_shipdate > o_orderdate + INTERVAL 60 DAY"))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    cand = cand.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    )
    cand = cand.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey"))
        & F.expr("x_shipdate > o_orderdate + INTERVAL 60 DAY"),
        "left_anti",
    )
    return (
        cand.join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q22_global_sales_opportunity",
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS totacctbal
    FROM (
      SELECT SUBSTRING(c.c_name, 17, 2) AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE SUBSTRING(c.c_name, 17, 2) IN ('01', '13', '21', '29', '30',
                                           '31', '47')
        AND c.c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
          FROM customer
          WHERE c_acctbal > 0.0
            AND SUBSTRING(c_name, 17, 2) IN ('01', '13', '21', '29', '30',
                                             '31', '47')
        )
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    )
    GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape: dormant above-average customers by 'country "
        "code' (digits 17-18 of c_name replacing the missing phone "
        "column): a scalar AVG subquery gating the balance filter plus a "
        "NOT EXISTS anti-join against recent orders (every customer has "
        "SOME order in this corpus, so dormancy is 'none since 1999'), "
        "then grouped totals. The average is exact-decimal-sum / count "
        "in one double division.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = ["01", "13", "21", "29", "30", "31", "47"]
    c = load(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", 17, 2)
    )
    in_codes = c.filter(F.col("cntrycode").isin(codes))
    avg_bal = in_codes.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    return (
        in_codes.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )
