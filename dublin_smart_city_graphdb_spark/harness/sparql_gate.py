"""SPARQL engine under the driver's DuckDB-oracle gate.

The reference is a SPARQL endpoint (``README.md:63-65``); these entries prove
the full parse → algebra → DataFrame pipeline (sparql/) produces the same
answers as plain SQL. The driver's relational tables are RDF-ized into the
canonical quads DataFrame (distributed ``select``/``union`` — no driver-side
row building), real SPARQL text runs through the engine, and the resulting
term-struct columns are projected back to relational columns that a DuckDB
SQL oracle can reproduce.

RDF mapping (FIXTURES.md §B analog):
  region   → ``urn:region:{r_regionkey}``  a ``urn:rel:Region``; name
  nation   → ``urn:nation:{n_nationkey}``  a ``urn:rel:Nation``; name; inRegion
  supplier → ``urn:supplier:{s_suppkey}``  a ``urn:rel:Supplier``; name; inNation
  customer → ``urn:customer:{c_custkey}``  a ``urn:rel:Customer``; name;
             acctbal (xsd:decimal, 2 dp); inNation

Scale note: triples are generated executor-side from the Parquet scans and
unioned lazily; the quads DataFrame is cached per (session, sf_dir) because
every SPARQL query scans it several times (one filtered scan per triple
pattern — the predicate-partitioned layout of SURVEY §1.5 at cluster scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from dublin_smart_city_graphdb_spark.harness.registry import load, register
from dublin_smart_city_graphdb_spark.model.terms import RDF_TYPE, XSD
from dublin_smart_city_graphdb_spark.sparql.compiler import QueryCompiler
from dublin_smart_city_graphdb_spark.sparql.parser import parse_query

R = "urn:rel:"
GEO_ASWKT = "http://www.opengis.net/ont/geosparql#asWKT"
GEO_WKT_LITERAL = "http://www.opengis.net/ont/geosparql#wktLiteral"

_NULL_QUAD_TAIL = None  # placeholder for readability


def _null(t: str) -> Column:
    return F.lit(None).cast(t)


def _quad(s: Column, p: str, o_kind: int, o_lex: Column,
          o_dtype: Column | None = None, o_num: Column | None = None) -> list[Column]:
    return [
        _null("string").alias("g"),
        s.alias("s"),
        F.lit(p).alias("p"),
        F.lit(o_kind).cast("tinyint").alias("o_kind"),
        o_lex.cast("string").alias("o_lex"),
        (o_dtype if o_dtype is not None else _null("string")).alias("o_dtype"),
        _null("string").alias("o_lang"),
        (o_num if o_num is not None else _null("decimal(38,10)")).alias("o_num"),
        _null("timestamp").alias("o_ts"),
        _null("boolean").alias("o_bool"),
    ]


def _iri(prefix: str, keycol: str) -> Column:
    return F.concat(F.lit(f"urn:{prefix}:"), F.col(keycol).cast("string"))


def _rdfize(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")

    parts: list[DataFrame] = []

    def add(df: DataFrame, cols: list[Column]) -> None:
        parts.append(df.select(*cols))

    # region
    rs = _iri("region", "r_regionkey")
    add(region, _quad(rs, RDF_TYPE, 0, F.lit(R + "Region")))
    add(region, _quad(rs, R + "name", 2, F.col("r_name")))
    # nation
    ns = _iri("nation", "n_nationkey")
    add(nation, _quad(ns, RDF_TYPE, 0, F.lit(R + "Nation")))
    add(nation, _quad(ns, R + "name", 2, F.col("n_name")))
    add(nation, _quad(ns, R + "inRegion", 0, _iri("region", "n_regionkey")))
    # supplier
    ss = _iri("supplier", "s_suppkey")
    add(supplier, _quad(ss, RDF_TYPE, 0, F.lit(R + "Supplier")))
    add(supplier, _quad(ss, R + "name", 2, F.col("s_name")))
    add(supplier, _quad(ss, R + "inNation", 0, _iri("nation", "s_nationkey")))
    # customer
    cs = _iri("customer", "c_custkey")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    add(customer, _quad(cs, RDF_TYPE, 0, F.lit(R + "Customer")))
    add(customer, _quad(cs, R + "name", 2, F.col("c_name")))
    add(customer, _quad(cs, R + "inNation", 0, _iri("nation", "c_nationkey")))
    add(customer, _quad(
        cs, R + "acctbal", 2, bal,
        o_dtype=F.lit(XSD + "decimal"), o_num=bal.cast("decimal(38,10)"),
    ))
    # geo:asWKT POINT literal per customer — the reference's geometry
    # encoding (facilities.ttl:161-171), with the same synthetic coords as
    # geo_haversine. DECIMAL(8,3) lexical forms so Spark and DuckDB print
    # bit-identical WKT strings.
    lat_d = (F.lit(53.20) + (F.col("c_custkey") % 100) * 0.002).cast(
        "decimal(8,3)"
    )
    lon_d = (F.lit(-6.45) + (F.col("c_custkey") % 80) * 0.005).cast(
        "decimal(8,3)"
    )
    wkt = F.concat(
        F.lit("POINT("), lon_d.cast("string"), F.lit(" "),
        lat_d.cast("string"), F.lit(")"),
    )
    add(customer, _quad(
        cs, GEO_ASWKT, 2, wkt, o_dtype=F.lit(GEO_WKT_LITERAL),
    ))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_CACHE: dict[tuple[str, str], DataFrame] = {}


def _quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CACHE:
        _CACHE[key] = _rdfize(spark, sf_dir).cache()
    return _CACHE[key]


_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _sparql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    """Compile with a prepared-plan cache (same rationale as
    Repository.sparql: compilation is Py4J-chatty; the RDF-ized quads for a
    (session, sf_dir) never mutate)."""
    key = (spark.sparkContext.applicationId, sf_dir, text)
    if key not in _PLAN_CACHE:
        _PLAN_CACHE[key] = QueryCompiler(spark, _quads(spark, sf_dir)).compile(
            parse_query(text)
        )
    return _PLAN_CACHE[key]


def _lex(var: str) -> Column:
    return F.col(var)["lex"]


def _long(var: str) -> Column:
    return F.col(var)["num"].cast("long")


def _money(var: str) -> Column:
    return F.col(var)["num"].cast("decimal(18,2)").cast("double")


# ---------------------------------------------------------------------------

@register(
    "sparql_bgp_region_rollup",
    """
    SELECT r.r_name AS region,
           COUNT(*) AS num_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region
    """,
    doc="SPARQL BGP join chain + GROUP BY through the real engine "
        "(README.md:70-78 shape): 4-pattern BGP, shared-var equi-joins, "
        "grouped SUM/COUNT.",
)
def sparql_bgp_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT ?region (COUNT(?cust) AS ?nc) (SUM(?bal) AS ?tb)
        WHERE {{
          ?cust a rel:Customer ; rel:inNation ?n ; rel:acctbal ?bal .
          ?n rel:inRegion ?r .
          ?r rel:name ?region .
        }}
        GROUP BY ?region
        ORDER BY ?region
    """)
    return df.select(
        _lex("region").alias("region"),
        _long("nc").alias("num_customers"),
        _money("tb").alias("total_bal"),
    )


@register(
    "inference_transitive_within",
    """
    SELECT r.r_name AS region, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="RDFS-Plus materializer under the oracle gate (SURVEY §2.8): an "
        "ontology declares inNation/inRegion ⊑ within and within "
        "owl:TransitiveProperty; forward chaining derives customer-within-"
        "region 2-hop facts (rdfs7 + transitive closure), which the query "
        "reads back ONLY from the inferred graph. Oracle reproduces the "
        "closure relationally.",
    cache_plan=False,
)
def inference_transitive_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.inference.rdfsplus import materialize
    from dublin_smart_city_graphdb_spark.model.terms import RDFS, OWL

    quads = _quads(spark, sf_dir)
    ontology = spark.createDataFrame(
        [
            (R + "inNation", RDFS + "subPropertyOf", R + "within"),
            (R + "inRegion", RDFS + "subPropertyOf", R + "within"),
            (R + "within", RDF_TYPE, OWL + "TransitiveProperty"),
        ],
        "s string, p string, o_lex string",
    ).select(
        _null("string").alias("g"), "s", "p",
        F.lit(0).cast("tinyint").alias("o_kind"), "o_lex",
        _null("string").alias("o_dtype"), _null("string").alias("o_lang"),
        _null("decimal(38,10)").alias("o_num"),
        _null("timestamp").alias("o_ts"), _null("boolean").alias("o_bool"),
    )
    inferred = materialize(quads.unionByName(ontology))
    within_region = inferred.filter(
        (F.col("p") == R + "within")
        & F.col("s").startswith("urn:customer:")
        & F.col("o_lex").startswith("urn:region:")
    ).select("s", F.col("o_lex").alias("region_iri"))
    names = quads.filter(
        (F.col("p") == R + "name") & F.col("s").startswith("urn:region:")
    ).select(F.col("s").alias("region_iri"), F.col("o_lex").alias("region"))
    return (
        within_region.join(F.broadcast(names), "region_iri")
        .groupBy("region")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "inference_retract_dred",
    """
    SELECT s, class FROM (VALUES
      ('urn:ex:i', 'urn:ex:Super'),
      ('urn:ex:m', 'urn:ex:Super')
    ) AS t(s, class)
    """,
    doc="DRed delete maintenance under the oracle gate (SURVEY §2.8, "
        "round 8d): a repository with alternative-support instances and "
        "a transitive chain takes ONE mixed DELETE DATA batch (kills a "
        "chain edge, one of two supports of i, and k's only support) "
        "then ONE INSERT DATA (new instance m). The maintained inferred "
        "set must equal the constant a full rebuild yields: i keeps "
        "Super via its surviving support (rederive round), k and the "
        "chain conclusions retract (Δ-seeded overdeletion), m gains "
        "Super (Δ-seeded insert path). Constant-valued oracle — the "
        "flow is sf-independent by construction.",
    cache_plan=False,
)
def inference_retract_dred(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    name = f"gate_retract_dred_{abs(hash(sf_dir)) % 10_000}"
    if name in eng.list_repositories():
        repo = eng._repos[name]
    else:
        repo = eng.create_repository(name, ruleset="rdfsplus")
        repo.load_turtle("""
            @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
            @prefix owl: <http://www.w3.org/2002/07/owl#> .
            @prefix ex: <urn:ex:> .
            ex:Sub1 rdfs:subClassOf ex:Super .
            ex:Sub2 rdfs:subClassOf ex:Super .
            ex:next a owl:TransitiveProperty .
            ex:i a ex:Sub1 . ex:i a ex:Sub2 . ex:k a ex:Sub1 .
            ex:a ex:next ex:b . ex:b ex:next ex:c . ex:c ex:next ex:d .
        """)
        repo.update(
            "PREFIX ex: <urn:ex:> "
            "DELETE DATA { ex:i a ex:Sub1 . ex:k a ex:Sub1 . "
            "ex:b ex:next ex:c }"
        )
        repo.update("PREFIX ex: <urn:ex:> INSERT DATA { ex:m a ex:Sub2 }")
    q = repo.quads
    from dublin_smart_city_graphdb_spark.model.schema import INFERRED_GRAPH

    return (
        q.filter(q.g == INFERRED_GRAPH)
        .select("s", F.col("o_lex").alias("class"))
    )


@register(
    "shacl_enforce_commit",
    """
    SELECT step, outcome FROM (VALUES
      ('violating_commit', 'rejected'),
      ('violation_focus', 'urn:ex:carol'),
      ('violation_constraint', 'MinCountConstraintComponent'),
      ('store_after_reject', 'unchanged'),
      ('conforming_commit', 'accepted')
    ) AS t(step, outcome)
    ORDER BY step
    """,
    doc="SHACL validation-on-commit under the oracle gate (SURVEY §2.8, "
        "round 9 — RDF4J ShaclSail parity): a shacl_enforce repository "
        "holds shapes in the RDF4J shapes graph; a commit whose "
        "post-state violates minCount is REJECTED with the store "
        "unchanged and a report naming the focus/constraint, then a "
        "conforming commit lands. Constant-valued oracle — the contract "
        "is sf-independent by construction.",
    cache_plan=False,
)
def shacl_enforce_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.shacl import (
        SHACL_SHAPES_GRAPH,
        ShaclViolationError,
    )

    eng = Engine(spark)
    name = f"gate_shacl_enforce_{abs(hash(sf_dir)) % 10_000}"
    repo = eng.create_repository(name, ruleset="none", shacl_enforce=True)
    if not repo.count():
        repo.load_turtle_text("""
            @prefix sh: <http://www.w3.org/ns/shacl#> .
            @prefix ex: <urn:ex:> .
            ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
              sh:property [ sh:path ex:name ; sh:minCount 1 ] .
        """, graph=SHACL_SHAPES_GRAPH)
        repo.load_turtle_text(
            '@prefix ex: <urn:ex:> . ex:alice a ex:Person ; ex:name "A" .'
        )
    before = repo.count()
    rows = []
    try:
        repo.update("PREFIX ex: <urn:ex:> INSERT DATA { ex:carol a ex:Person }")
        rows.append(("violating_commit", "accepted"))
    except ShaclViolationError as ex:
        rows.append(("violating_commit", "rejected"))
        rows.append(("violation_focus", ex.report_rows[0]["focus"]))
        rows.append(
            ("violation_constraint", ex.report_rows[0]["constraint"])
        )
    rows.append((
        "store_after_reject",
        "unchanged" if repo.count() == before else "mutated",
    ))
    try:
        repo.update(
            "PREFIX ex: <urn:ex:> "
            'INSERT DATA { ex:carol a ex:Person ; ex:name "C" }'
        )
        outcome = "accepted" if repo.count() == before + 2 else "lost"
    except ShaclViolationError:
        outcome = "rejected"
    rows.append(("conforming_commit", outcome))
    eng.drop_repository(name)
    return spark.createDataFrame(rows, "step string, outcome string").orderBy(
        "step"
    )


@register(
    "sparql_optional_suppliers",
    """
    SELECT n.n_name AS nation, COUNT(s.s_suppkey) AS num_suppliers
    FROM nation n
    LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="SPARQL OPTIONAL (left join, SURVEY §2.3 J2) through the engine: "
        "COUNT over a maybe-unbound variable ≡ SQL COUNT(col) over LEFT JOIN.",
)
def sparql_optional_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT ?nation (COUNT(?sup) AS ?ns)
        WHERE {{
          ?n a rel:Nation ; rel:name ?nation .
          OPTIONAL {{ ?sup a rel:Supplier ; rel:inNation ?n }}
        }}
        GROUP BY ?nation
    """)
    return df.select(
        _lex("nation").alias("nation"),
        _long("ns").alias("num_suppliers"),
    )


@register(
    "sparql_filter_topk",
    """
    SELECT c_name AS name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
    FROM customer
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 9000
    ORDER BY bal DESC, name
    LIMIT 25
    """,
    doc="SPARQL FILTER + ORDER BY DESC + LIMIT (the bounding-box golden-query "
        "shape, facilities.ttl:211-218) → TakeOrderedAndProject.",
)
def sparql_filter_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT ?name ?bal
        WHERE {{
          ?c a rel:Customer ; rel:name ?name ; rel:acctbal ?bal .
          FILTER(?bal > 9000)
        }}
        ORDER BY DESC(?bal) ?name
        LIMIT 25
    """)
    return df.select(_lex("name").alias("name"), _money("bal").alias("bal"))


@register(
    "sparql_path_europe_customers",
    """
    SELECT COUNT(*) AS n
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
    """,
    doc="SPARQL property path (sequence, SURVEY §2.2 P7): "
        "inNation/inRegion compiled to a join chain.",
)
def sparql_path_europe_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT (COUNT(?c) AS ?cnt)
        WHERE {{
          ?c a rel:Customer ; rel:inNation/rel:inRegion ?r .
          ?r rel:name "EUROPE" .
        }}
    """)
    return df.select(_long("cnt").alias("n"))


@register(
    "sparql_path_bound_endpoint",
    """
    WITH RECURSIVE edges AS (
        SELECT 'urn:customer:' || c_custkey AS src,
               'urn:nation:' || c_nationkey AS dst
        FROM customer
        UNION ALL
        SELECT 'urn:supplier:' || s_suppkey,
               'urn:nation:' || s_nationkey
        FROM supplier
        UNION ALL
        SELECT 'urn:nation:' || n_nationkey,
               'urn:region:' || n_regionkey
        FROM nation
    ),
    reach AS (
        SELECT src FROM edges WHERE dst = 'urn:region:1'
        UNION
        SELECT e.src FROM edges e JOIN reach r ON e.dst = r.src
    )
    SELECT DISTINCT src AS x FROM reach
    """,
    doc="SPARQL `+` path with a BOUND endpoint (VERDICT r6 task 1): "
        "?x (inNation|inRegion)+ <urn:region:1> must run the frontier-"
        "seeded closure from the constant (reversed edges), never the "
        "all-pairs closure post-filtered — O(reachable set), not "
        "O(all pairs), at 100 TB. Oracle: backward recursive CTE.",
    cache_plan=False,
)
def sparql_path_bound_endpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT ?x
        WHERE {{ ?x (rel:inNation|rel:inRegion)+ <urn:region:1> }}
    """)
    return df.select(_lex("x").alias("x"))


@register(
    "sparql_path_var_seeded",
    """
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS x,
           'urn:nation:' || CAST(c_nationkey AS VARCHAR) AS n
    FROM customer
    UNION ALL
    SELECT 'urn:supplier:' || CAST(s_suppkey AS VARCHAR),
           'urn:nation:' || CAST(s_nationkey AS VARCHAR)
    FROM supplier
    """,
    doc="SPARQL `+` path whose endpoint VARIABLE is bound by an earlier "
        "pattern (round 7): `?n a rel:Nation . ?x (inNation|inRegion)+ "
        "?n` seeds the reversed frontier closure from the 25 nation "
        "bindings as a DataFrame — no collect, rounds bounded by the "
        "binding set's reachable neighborhood, never the all-pairs "
        "closure. Oracle: the one-hop membership union (no multi-hop "
        "path ends at a Nation).",
    cache_plan=False,
)
def sparql_path_var_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT ?x ?n
        WHERE {{ ?n a rel:Nation . ?x (rel:inNation|rel:inRegion)+ ?n }}
    """)
    return df.select(_lex("x").alias("x"), _lex("n").alias("n"))


@register(
    "sparql_not_exists_nations",
    """
    SELECT n.n_name AS nation, COUNT(*) AS num_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_nationkey NOT IN (SELECT DISTINCT s_nationkey FROM supplier)
    GROUP BY n.n_name
    """,
    doc="SPARQL FILTER NOT EXISTS (anti-join, SURVEY §2.3 J3 — the "
        "areas-with-no-parks golden query, facilities.ttl:195-202).",
)
def sparql_not_exists_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT ?nation (COUNT(?c) AS ?nc)
        WHERE {{
          ?c a rel:Customer ; rel:inNation ?n .
          ?n rel:name ?nation .
          FILTER NOT EXISTS {{ ?s a rel:Supplier ; rel:inNation ?n }}
        }}
        GROUP BY ?nation
    """)
    return df.select(
        _lex("nation").alias("nation"),
        _long("nc").alias("num_customers"),
    )


@register(
    "property_table_roundtrip",
    """
    SELECT c_name AS name,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
           n.n_name AS nation
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    doc="Property-table view (SURVEY §1.5 columnar fast path): quads pivoted "
        "back to a wide customer table with natively-typed columns; the "
        "nation IRI column joins the nation name like any relational dim.",
)
def property_table_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.model.property_table import property_table

    quads = _quads(spark, sf_dir)
    cust = property_table(
        quads,
        columns={
            R + "name": ("name", "string"),
            R + "acctbal": ("acctbal", "decimal"),
            R + "inNation": ("nation_iri", "iri"),
        },
        class_iri=R + "Customer",
    )
    nations = property_table(
        quads, columns={R + "name": ("nation", "string")}, class_iri=R + "Nation"
    ).select(F.col("s").alias("n_iri"), "nation")
    return (
        cust.join(F.broadcast(nations), cust.nation_iri == nations.n_iri)
        .select(
            "name",
            F.col("acctbal").cast("decimal(18,2)").cast("double").alias("acctbal"),
            "nation",
        )
    )


@register(
    "sparql_values_bind",
    """
    SELECT n.n_name AS name,
           CASE WHEN r.r_name = 'EUROPE' THEN 'EU' ELSE 'AS' END AS zone
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('EUROPE', 'ASIA')
    """,
    doc="SPARQL VALUES inline table (J7) + BIND/IF (P3 expressions) through "
        "the engine.",
)
def sparql_values_bind(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT ?name ?zone
        WHERE {{
          ?n a rel:Nation ; rel:name ?name ; rel:inRegion ?r .
          ?r rel:name ?rname .
          VALUES ?rname {{ "EUROPE" "ASIA" }}
          BIND(IF(?rname = "EUROPE", "EU", "AS") AS ?zone)
        }}
    """)
    return df.select(_lex("name").alias("name"), _lex("zone").alias("zone"))


@register(
    "sparql_minus_non_europe",
    """
    SELECT n_name AS name FROM nation
    WHERE n_regionkey NOT IN
          (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE')
    """,
    doc="SPARQL MINUS (SURVEY §2.3 J5) through the engine: solutions sharing "
        "?n with a Europe binding are removed via the shared-domain-guarded "
        "anti-join — the algebra path distinct from FILTER NOT EXISTS.",
)
def sparql_minus_non_europe(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT ?name
        WHERE {{
          ?n a rel:Nation ; rel:name ?name .
          MINUS {{ ?n rel:inRegion ?r . ?r rel:name "EUROPE" }}
        }}
    """)
    return df.select(_lex("name").alias("name"))


@register(
    "sparql_subquery_above_avg",
    """
    SELECT COUNT(*) AS nc,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS tb
    FROM customer
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) >
          (SELECT AVG(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer)
    """,
    doc="SPARQL nested SELECT (SURVEY §2.6 F5): a scalar AVG subquery joined "
        "into the outer group, FILTER against the subquery's binding — the "
        "decorrelated-subquery path through the engine.",
)
def sparql_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT (COUNT(?c) AS ?nc) (SUM(?bal) AS ?tb)
        WHERE {{
          ?c a rel:Customer ; rel:acctbal ?bal .
          {{ SELECT (AVG(?b) AS ?avgbal)
             WHERE {{ ?x a rel:Customer ; rel:acctbal ?b }} }}
          FILTER(?bal > ?avgbal)
        }}
    """)
    return df.select(_long("nc").alias("nc"), _money("tb").alias("tb"))


@register(
    "sparql_union_names",
    """
    SELECT s_name AS name, 'supplier' AS kind FROM supplier
    UNION ALL
    SELECT n_name AS name, 'nation' AS kind FROM nation
    """,
    doc="SPARQL UNION (SURVEY §2.3 J8) through the engine: bag-semantics "
        "union of two group patterns with a BIND-ed discriminator column.",
)
def sparql_union_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT ?name ?kind
        WHERE {{
          {{ ?s a rel:Supplier ; rel:name ?name . BIND("supplier" AS ?kind) }}
          UNION
          {{ ?n a rel:Nation ; rel:name ?name . BIND("nation" AS ?kind) }}
        }}
    """)
    return df.select(_lex("name").alias("name"), _lex("kind").alias("kind"))


@register(
    "sparql_construct_region_names",
    """
    SELECT 'urn:nation:' || CAST(n.n_nationkey AS VARCHAR) AS s,
           'urn:rel:regionName' AS p,
           r.r_name AS o
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="SPARQL CONSTRUCT (SURVEY §2.6 F3) through the engine: solution "
        "mappings instantiated into a template triple, set-deduplicated, "
        "projected back to (s, p, o) lexical columns for the oracle.",
)
def sparql_construct_region_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        CONSTRUCT {{ ?n rel:regionName ?rname }}
        WHERE {{ ?n a rel:Nation ; rel:inRegion ?r . ?r rel:name ?rname }}
    """)
    return df.select(
        F.col("s")["lex"].alias("s"),
        F.col("p")["lex"].alias("p"),
        F.col("o")["lex"].alias("o"),
    )


@register(
    "sparql_group_concat_regions",
    """
    SELECT r.r_name AS region,
           STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="SPARQL GROUP_CONCAT(?v; separator=',') (SURVEY §2.4 A5) through "
        "the engine: collect_list → array_sort → concat_ws. Sorting is a "
        "valid instance of SPARQL's unspecified concatenation order and "
        "makes the result deterministic/oracle-comparable.",
)
def sparql_group_concat_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT ?region (GROUP_CONCAT(?nname; separator=",") AS ?nations)
        WHERE {{
          ?n a rel:Nation ; rel:name ?nname ; rel:inRegion ?r .
          ?r rel:name ?region .
        }}
        GROUP BY ?region
    """)
    return df.select(_lex("region").alias("region"), _lex("nations").alias("nations"))


@register(
    "sparql_ask_high_balance",
    """
    SELECT COUNT(*) > 0 AS ask FROM customer
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 9999
    """,
    doc="SPARQL ASK (SURVEY §2.6 F2) through the engine: existence check "
        "compiled to limit(1) + count > 0 — the scan stops at the first "
        "matching row instead of counting them all.",
)
def sparql_ask_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        ASK {{ ?c a rel:Customer ; rel:acctbal ?b . FILTER(?b > 9999) }}
    """)


@register(
    "sparql_count_distinct_nations",
    "SELECT COUNT(DISTINCT c_nationkey) AS n FROM customer",
    doc="SPARQL COUNT(DISTINCT ?v) (SURVEY §2.4 A4) through the engine — "
        "the exact form; approx_count_distinct is the documented opt-in at "
        "scale.",
)
def sparql_count_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT (COUNT(DISTINCT ?n) AS ?cnt)
        WHERE {{ ?c a rel:Customer ; rel:inNation ?n }}
    """)
    return df.select(_long("cnt").alias("n"))


@register(
    "sparql_describe_nation",
    """
    SELECT s, p, o FROM (
        SELECT 'urn:nation:' || CAST(n_nationkey AS VARCHAR) AS s,
               'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
               'urn:rel:Nation' AS o
        FROM nation WHERE n_nationkey = 3
        UNION ALL
        SELECT 'urn:nation:' || CAST(n_nationkey AS VARCHAR),
               'urn:rel:name', n_name
        FROM nation WHERE n_nationkey = 3
        UNION ALL
        SELECT 'urn:nation:' || CAST(n_nationkey AS VARCHAR),
               'urn:rel:inRegion', 'urn:region:' || CAST(n_regionkey AS VARCHAR)
        FROM nation WHERE n_nationkey = 3
        UNION ALL
        SELECT 'urn:supplier:' || CAST(s_suppkey AS VARCHAR),
               'urn:rel:inNation', 'urn:nation:3'
        FROM supplier WHERE s_nationkey = 3
        UNION ALL
        SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR),
               'urn:rel:inNation', 'urn:nation:3'
        FROM customer WHERE c_nationkey = 3
    )
    """,
    doc="SPARQL DESCRIBE (SURVEY §2.6 F4) through the engine: description "
        "of one IRI — every triple where the node is the subject (type/"
        "name/inRegion) plus every triple pointing AT it (suppliers and "
        "customers with inNation → the node). Compiles to two semi-joins "
        "of the quad store against a broadcast single-row target list; the "
        "oracle reconstructs the same triple set relationally.",
)
def sparql_describe_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, "DESCRIBE <urn:nation:3>")
    return df.select("s", "p", F.col("o_lex").alias("o"))


@register(
    "sparql_bind_if_bands",
    """
    SELECT c_name AS name,
           CASE WHEN CAST(c_acctbal AS DECIMAL(18,2)) > 5000 THEN 'high'
                WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 0 THEN 'debt'
                ELSE 'mid' END AS band
    FROM customer
    """,
    doc="SPARQL BIND + nested IF (functional forms, SURVEY §2.7) through "
        "the engine: account-balance banding compiled to a JVM CASE WHEN "
        "chain over the typed shadow column — exercises the 3-valued IF "
        "semantics the W3C slice pins (an erroring condition would yield "
        "unbound, never a wrong branch).",
)
def sparql_bind_if_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        SELECT ?name ?band
        WHERE {{
          ?c a rel:Customer ; rel:name ?name ; rel:acctbal ?bal .
          BIND(IF(?bal > 5000, "high", IF(?bal < 0, "debt", "mid")) AS ?band)
        }}
    """)
    return df.select(_lex("name").alias("name"), _lex("band").alias("band"))


@register(
    "sparql_star_view_customers",
    """
    SELECT c_name AS name,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
    FROM customer
    """,
    doc="Property-table star routing (SURVEY §1.5) under the driver gate: "
        "the customer star BGP compiles against a materialized star view "
        "(one columnar scan of the term-struct wide table) instead of "
        "per-predicate quad scans — results must be indistinguishable "
        "from the quad-scan plan, which the shared oracle enforces.",
)
def sparql_star_view_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.model.property_table import star_view

    quads = _quads(spark, sf_dir)
    preds = [R + "name", R + "acctbal"]
    view = star_view(quads, preds, class_iri=R + "Customer").localCheckpoint(
        eager=True
    )
    compiler = QueryCompiler(
        spark, quads, star_views=[(set(preds), R + "Customer", view)]
    )
    df = compiler.compile(parse_query(f"""
        PREFIX rel: <{R}>
        SELECT ?name ?bal
        WHERE {{ ?c a rel:Customer ; rel:name ?name ; rel:acctbal ?bal . }}
    """))
    return df.select(_lex("name").alias("name"), _money("bal").alias("bal"))


@register(
    "sparql_xsd_casts",
    """
    SELECT c_name AS name,
           CAST(trunc(CAST(c_acctbal AS DECIMAL(18,2))) AS BIGINT) AS balint,
           upper(substr(c_name, 1, 8)) AS prefix
    FROM customer
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) < 0
       OR CAST(c_acctbal AS DECIMAL(18,2)) > 1000
    """,
    doc="XSD constructor casts (§17.5) + string functions through the "
        "engine: xsd:integer truncates the decimal balance toward zero "
        "(negative balances exercise the ceil leg), UCASE/SUBSTR carry "
        "the name through — all JVM Column expressions over the term "
        "structs, verified against the SQL trunc/upper/substr oracle.",
)
def sparql_xsd_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?name ?balint ?prefix
        WHERE {{
          ?c a rel:Customer ; rel:name ?name ; rel:acctbal ?bal .
          FILTER(?bal < 0 || ?bal > 1000)
          BIND(xsd:integer(?bal) AS ?balint)
          BIND(UCASE(SUBSTR(?name, 1, 8)) AS ?prefix)
        }}
    """)
    return df.select(
        _lex("name").alias("name"),
        _long("balint").alias("balint"),
        _lex("prefix").alias("prefix"),
    )


@register(
    "sparql_geo_bbox",
    """
    WITH pts AS (
        SELECT c_custkey, c_name,
               CAST(CAST(-6.45 + (c_custkey % 80) * 0.005 AS DOUBLE)
                    AS DECIMAL(8,3)) AS lon,
               CAST(CAST(53.20 + (c_custkey % 100) * 0.002 AS DOUBLE)
                    AS DECIMAL(8,3)) AS lat
        FROM customer
    )
    SELECT c_name AS name,
           'POINT(' || CAST(lon AS VARCHAR) || ' ' || CAST(lat AS VARCHAR)
               || ')' AS wkt
    FROM pts
    WHERE CAST(lon AS DOUBLE) >= -6.30 AND CAST(lon AS DOUBLE) <= -6.20
      AND CAST(lat AS DOUBLE) >= 53.30 AND CAST(lat AS DOUBLE) <= 53.40
    ORDER BY name
    """,
    doc="GeoSPARQL bbox over WKT (VERDICT r3 task 5): the reference's "
        "golden bounding-box query (facilities.ttl:211-218) evaluated "
        "from geo:asWKT POINT literals (facilities.ttl:161-171) via "
        "geof:sfWithin against a rectangle POLYGON — instead of the "
        "lat/lon-column FILTER form (filter_bbox). The predicate "
        "compiles to JVM regexp extraction + array_min/max compares; "
        "pushdown-friendly, no UDF.",
)
def sparql_geo_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    geof = "http://www.opengis.net/def/function/geosparql/"
    rect = "POLYGON((-6.30 53.30, -6.20 53.30, -6.20 53.40, -6.30 53.40, -6.30 53.30))"
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        PREFIX geo: <http://www.opengis.net/ont/geosparql#>
        PREFIX geof: <{geof}>
        SELECT ?name ?wkt
        WHERE {{
          ?cust a rel:Customer ; rel:name ?name ; geo:asWKT ?wkt .
          FILTER(geof:sfWithin(?wkt, "{rect}"^^geo:wktLiteral))
        }}
        ORDER BY ?name
    """)
    return df.select(_lex("name").alias("name"), _lex("wkt").alias("wkt"))


@register(
    "sparql_fts_bm25",
    """
    WITH pts AS (
        SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
               CAST(CAST(-6.45 + (c_custkey % 80) * 0.005 AS DOUBLE)
                    AS DECIMAL(8,3)) AS lon,
               CAST(CAST(53.20 + (c_custkey % 100) * 0.002 AS DOUBLE)
                    AS DECIMAL(8,3)) AS lat
        FROM customer
    ),
    docs AS (
        SELECT 'urn:region:' || r_regionkey AS s, LOWER(r_name) AS text
        FROM region
        UNION ALL
        SELECT 'urn:nation:' || n_nationkey, LOWER(n_name) FROM nation
        UNION ALL
        SELECT 'urn:supplier:' || s_suppkey, LOWER(s_name) FROM supplier
        UNION ALL
        SELECT 'urn:customer:' || c_custkey,
               LOWER(c_name || ' ' || CAST(bal AS VARCHAR) || ' ' ||
                     'POINT(' || CAST(lon AS VARCHAR) || ' ' ||
                     CAST(lat AS VARCHAR) || ')')
        FROM pts
    ),
    toks AS (
        SELECT s, t.term FROM docs, UNNEST(string_split(text, ' ')) t(term)
        WHERE t.term <> ''
    ),
    dl AS (SELECT s, COUNT(*) AS dl FROM toks GROUP BY 1),
    stats AS (
        SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
    ),
    tf AS (
        SELECT s, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('europe', 'asia', 'east', 'nation_7') GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    contrib AS (
        SELECT tf.s,
               CAST(ROUND(
                   LN(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                   * (tf.tf * (1.2 + 1.0))
                   / (tf.tf + 1.2 * (1.0 - 0.75
                      + 0.75 * dl.dl / stats.avgdl)),
                   6) AS DECIMAL(18,6)) AS c
        FROM tf
        JOIN dfreq ON tf.term = dfreq.term
        JOIN dl ON tf.s = dl.s
        CROSS JOIN stats
    )
    SELECT s, CAST(SUM(c) AS DOUBLE) AS score
    FROM contrib GROUP BY s ORDER BY s
    """,
    doc="SPARQL-callable BM25 full-text search (VERDICT r3 task 6): the "
        "GraphDB Lucene-connector surface as magic predicates — "
        "?s fts:match \"query\" restricts to matching subjects, "
        "?s fts:score ?score binds the BM25 relevance (k1=1.2, b=0.75) "
        "over the bag of tokens of each subject's literal objects "
        "(molecule-style default index). Compiles to the inverted-index-"
        "probe aggregation of operators/fts.py: postings filtered "
        "map-side to query terms, corpus scalars broadcast, decimal-"
        "rounded contributions so fold order can't flip a score.",
)
def sparql_fts_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, """
        PREFIX fts: <urn:spark-graft:fts:>
        SELECT ?s ?score WHERE {
          ?s fts:match "EUROPE ASIA EAST NATION_7" .
          ?s fts:score ?score .
        } ORDER BY ?s
    """)
    return df.select(
        _lex("s").alias("s"),
        F.col("score")["num"].cast("double").alias("score"),
    )


@register(
    "sparql_service_http_federation",
    """
    SELECT n.n_name AS nation, r.r_name AS region
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('EUROPE', 'ASIA')
    """,
    doc="HTTP SERVICE federation under the driver gate: the nation "
        "patterns evaluate locally while the region patterns run via "
        "SERVICE <http://...> against a live SPARQL-protocol endpoint "
        "(our own server wrapping a second repository built from the "
        "same testdata). The remote fetch happens once at plan-build "
        "time (results-JSON bindings land as a broadcastable term-struct "
        "DataFrame); execution is then a plain local join — the endpoint "
        "is only needed during compilation, mirroring how dimension-"
        "sized federated lookups behave at 100 TB.",
)
def sparql_service_http_federation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.protocol_http import SparqlHttpServer

    # serve ONLY the region triples remotely; nations evaluate locally
    eng = Engine(spark)
    name = f"gate_fed_regions_{abs(hash(sf_dir)) % 10_000}"
    if name not in eng.list_repositories():
        repo = eng.create_repository(name, ruleset="none")
        region = load(spark, sf_dir, "region")
        rows = _quad(
            _iri("region", "r_regionkey"), R + "name", 2, F.col("r_name")
        )
        repo.add_quads(
            region.select(*rows)
        )
    srv = SparqlHttpServer(eng).start()
    try:
        endpoint = f"http://{srv.host}:{srv.port}/repositories/{name}"
        df = QueryCompiler(spark, _quads(spark, sf_dir)).compile(parse_query(f"""
            PREFIX rel: <{R}>
            SELECT ?nation ?region
            WHERE {{
              ?n a rel:Nation ; rel:name ?nation ; rel:inRegion ?r .
              SERVICE <{endpoint}> {{ ?r rel:name ?region }}
              FILTER(?region = "EUROPE" || ?region = "ASIA")
            }}
        """))
    finally:
        srv.stop()
    return df.select(
        _lex("nation").alias("nation"), _lex("region").alias("region")
    )


# ---------------------------------------------------------------------------
# Workbench catalog queries: the class-hierarchy and predicate-list panels
# every GraphDB workbench session opens with (reference exposes them through
# the same SPARQL endpoint; README.md:63-65)
# ---------------------------------------------------------------------------

@register(
    "sparql_class_counts",
    """
    SELECT cls, n FROM (
        SELECT 'urn:rel:Region'   AS cls, COUNT(*) AS n FROM region
        UNION ALL
        SELECT 'urn:rel:Nation'   AS cls, COUNT(*) AS n FROM nation
        UNION ALL
        SELECT 'urn:rel:Supplier' AS cls, COUNT(*) AS n FROM supplier
        UNION ALL
        SELECT 'urn:rel:Customer' AS cls, COUNT(*) AS n FROM customer
    )
    """,
    doc="Workbench class-hierarchy panel: instance count per rdf:type — "
        "`SELECT ?cls (COUNT(?s) AS ?n) { ?s a ?cls } GROUP BY ?cls` through "
        "the engine. One predicate-pruned scan of the type partition, one "
        "low-cardinality groupBy; at 100 TB this is a metadata-sized "
        "aggregate over a single predicate partition (SURVEY §1.5 layout).",
)
def sparql_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, f"""
        SELECT ?cls (COUNT(?s) AS ?n)
        WHERE {{ ?s a ?cls }}
        GROUP BY ?cls
    """)
    return df.select(_lex("cls").alias("cls"), _long("n").alias("n"))


@register(
    "sparql_predicate_stats",
    """
    WITH c AS (
        SELECT (SELECT COUNT(*) FROM region)   AS r,
               (SELECT COUNT(*) FROM nation)   AS n,
               (SELECT COUNT(*) FROM supplier) AS s,
               (SELECT COUNT(*) FROM customer) AS cu
    )
    SELECT p, n_stmts FROM (
        SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
               r + n + s + cu AS n_stmts FROM c
        UNION ALL
        SELECT 'urn:rel:name', r + n + s + cu FROM c
        UNION ALL
        SELECT 'urn:rel:inRegion', n FROM c
        UNION ALL
        SELECT 'urn:rel:inNation', s + cu FROM c
        UNION ALL
        SELECT 'urn:rel:acctbal', cu FROM c
        UNION ALL
        SELECT 'http://www.opengis.net/ont/geosparql#asWKT', cu FROM c
    )
    """,
    doc="Workbench predicate-list panel: statement count per predicate — a "
        "fully variable triple pattern `?s ?p ?o` grouped by ?p. The one "
        "query shape that cannot predicate-prune (it must see every "
        "partition), but the aggregate is map-side partial over the "
        "predicate column so the shuffle carries |predicates| rows.",
)
def sparql_predicate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, """
        SELECT ?p (COUNT(*) AS ?n)
        WHERE { ?s ?p ?o }
        GROUP BY ?p
    """)
    return df.select(_lex("p").alias("p"), _long("n").alias("n_stmts"))


# ---------------------------------------------------------------------------
# GraphDB plugin surfaces: RDF Rank and Autocomplete as magic predicates
# ---------------------------------------------------------------------------

def _rdf_edges_sql() -> str:
    """The IRI-object statements of the RDF-ized store (_rdfize) as a SQL
    edge list — every quad with o_kind = IRI: the rdf:type statements plus
    inRegion / inNation links."""
    return """
        SELECT 'urn:region:' || r_regionkey AS src, 'urn:rel:Region' AS dst
        FROM region
        UNION ALL
        SELECT 'urn:nation:' || n_nationkey, 'urn:rel:Nation' FROM nation
        UNION ALL
        SELECT 'urn:nation:' || n_nationkey, 'urn:region:' || n_regionkey
        FROM nation
        UNION ALL
        SELECT 'urn:supplier:' || s_suppkey, 'urn:rel:Supplier' FROM supplier
        UNION ALL
        SELECT 'urn:supplier:' || s_suppkey, 'urn:nation:' || s_nationkey
        FROM supplier
        UNION ALL
        SELECT 'urn:customer:' || c_custkey, 'urn:rel:Customer' FROM customer
        UNION ALL
        SELECT 'urn:customer:' || c_custkey, 'urn:nation:' || c_nationkey
        FROM customer
    """


def _rank_oracle_sql() -> str:
    from dublin_smart_city_graphdb_spark.harness.relational import (
        _PR_UNIT,
        _pr_round_sql,
    )

    return f"""
    WITH edges AS ({_rdf_edges_sql()}),
    nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    deg AS (SELECT src AS id, COUNT(*) AS out_deg FROM edges GROUP BY src),
    r0 AS (SELECT id, CAST({_PR_UNIT} AS BIGINT) AS rank FROM nodes),
    {_pr_round_sql(1)},
    {_pr_round_sql(2)}
    SELECT r2.id AS s, nat.n_name AS name,
           CAST(r2.rank AS DOUBLE) / {float(_PR_UNIT)} AS r
    FROM r2 JOIN nation nat ON r2.id = 'urn:nation:' || nat.n_nationkey
    ORDER BY s
    """


@register(
    "sparql_rdf_rank",
    _rank_oracle_sql(),
    doc="GraphDB RDF Rank plugin surface: ?node rank:hasRDFRank ?rank "
        "binds every node's PageRank over the store's IRI-object graph "
        "(subjects and IRI objects as nodes, every s→o IRI statement an "
        "edge; literals are attributes, not structure). Fixed 2 power "
        "iterations at d=0.85 (GraphDB's epsilon-converged variant "
        "differs only in iteration count) keep the value deterministic "
        "and SQL-expressible; execution is the engine's pagerank — one "
        "groupBy(dst) shuffle per round, decimal-exact contribution "
        "sums, localCheckpoint'd generations freed as superseded.",
)
def sparql_rdf_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, """
        PREFIX rel: <urn:rel:>
        PREFIX rank: <urn:spark-graft:rank:>
        SELECT ?s ?name ?r WHERE {
          ?s a rel:Nation ; rel:name ?name .
          ?s rank:hasRDFRank ?r .
        } ORDER BY ?s
    """)
    return df.select(
        _lex("s").alias("s"),
        _lex("name").alias("name"),
        F.col("r")["num"].cast("double").alias("r"),
    )


@register(
    "sparql_autocomplete",
    """
    SELECT 'urn:customer:' || c_custkey AS s, c_name AS name
    FROM customer
    WHERE LOWER(c_name) LIKE 'customer#00000001%'
    ORDER BY s
    """,
    doc="GraphDB Autocomplete plugin surface: ?s auto:query \"prefix\" "
        "suggests subjects whose IRI local name or any literal object "
        "starts with the prefix, case-insensitively (the plugin indexes "
        "IRI local names and label-ish literals). Compiles to map-side "
        "startswith filters over the quad scan + one distinct — the "
        "predicate pushes to the store scan; the TPC-H 9-digit name "
        "padding makes the match set (customers 10-19) identical at "
        "every scale factor.",
)
def sparql_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, """
        PREFIX rel: <urn:rel:>
        PREFIX auto: <urn:spark-graft:auto:>
        SELECT ?s ?name WHERE {
          ?s auto:query "customer#00000001" .
          ?s a rel:Customer ; rel:name ?name .
        } ORDER BY ?s
    """)
    return df.select(_lex("s").alias("s"), _lex("name").alias("name"))


@register(
    "sparql_custom_ruleset",
    """
    WITH loc AS (
        SELECT n_nationkey AS ent, n_regionkey AS rk FROM nation
        UNION ALL
        SELECT c_custkey, n_regionkey
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        UNION ALL
        SELECT s_suppkey, n_regionkey
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
    )
    SELECT 'urn:region:' || rk AS r, COUNT(*) AS n
    FROM loc GROUP BY rk ORDER BY r
    """,
    doc="Custom ruleset (GraphDB custom-.pie analog): a repository created "
        "with ruleset=custom and three CONSTRUCT rules — locatedIn from "
        "inNation, locatedIn from inRegion, and transitive locatedIn — "
        "materializes the closure at load time through the same fixpoint "
        "scaffolding as RDFS-Plus; the query then counts entities located "
        "in each region (customers + suppliers transitively, nations "
        "directly). The SQL oracle reproduces the 2-level closure with "
        "plain joins.",
    cache_plan=False,
)
def sparql_custom_ruleset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    name = f"gate_custom_rules_{abs(hash(sf_dir)) % 10_000}"
    if name in eng.list_repositories():
        repo = eng._repos[name]
    else:
        rules = [
            f"PREFIX rel: <{R}> PREFIX ex: <urn:ex:> "
            "CONSTRUCT { ?a ex:locatedIn ?b } WHERE { ?a rel:inNation ?b }",
            f"PREFIX rel: <{R}> PREFIX ex: <urn:ex:> "
            "CONSTRUCT { ?a ex:locatedIn ?b } WHERE { ?a rel:inRegion ?b }",
            "PREFIX ex: <urn:ex:> CONSTRUCT { ?a ex:locatedIn ?c } WHERE "
            "{ ?a ex:locatedIn ?b . ?b ex:locatedIn ?c }",
        ]
        repo = eng.create_repository(name, ruleset="custom", rules=rules)
        repo.add_quads(_quads(spark, sf_dir))
        repo.materialize_inference()
    df = repo.sparql(f"""
        PREFIX rel: <{R}>
        PREFIX ex: <urn:ex:>
        SELECT ?r (COUNT(*) AS ?n) WHERE {{
          ?x ex:locatedIn ?r . ?r a rel:Region .
        }} GROUP BY ?r ORDER BY ?r
    """)
    return df.select(_lex("r").alias("r"), _long("n").alias("n"))


_SIM_DOCS_SQL = """
    pts AS (
        SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
               CAST(CAST(-6.45 + (c_custkey % 80) * 0.005 AS DOUBLE)
                    AS DECIMAL(8,3)) AS lon,
               CAST(CAST(53.20 + (c_custkey % 100) * 0.002 AS DOUBLE)
                    AS DECIMAL(8,3)) AS lat
        FROM customer
    ),
    docs AS (
        SELECT 'urn:region:' || r_regionkey AS s, LOWER(r_name) AS text
        FROM region
        UNION ALL
        SELECT 'urn:nation:' || n_nationkey, LOWER(n_name) FROM nation
        UNION ALL
        SELECT 'urn:supplier:' || s_suppkey, LOWER(s_name) FROM supplier
        UNION ALL
        SELECT 'urn:customer:' || c_custkey,
               LOWER(c_name || ' ' || CAST(bal AS VARCHAR) || ' ' ||
                     'POINT(' || CAST(lon AS VARCHAR) || ' ' ||
                     CAST(lat AS VARCHAR) || ')')
        FROM pts
    )
"""


@register(
    "sparql_similarity",
    f"""
    WITH {_SIM_DOCS_SQL},
    toks AS (
        SELECT s, t.term FROM docs, UNNEST(string_split(text, ' ')) t(term)
        WHERE t.term <> ''
    ),
    tf AS (SELECT s, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    nd AS (SELECT COUNT(DISTINCT s) AS n FROM tf),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    w AS (
        SELECT tf.s, tf.term,
               CAST(tf.tf AS DOUBLE)
               * LN(CAST(nd.n AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS w
        FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN nd
    ),
    norms AS (
        SELECT s,
               SQRT(CAST(SUM(CAST(w * w AS DECIMAL(27,12))) AS DOUBLE)) AS norm
        FROM w GROUP BY 1
    ),
    aw AS (SELECT term, w FROM w WHERE s = 'urn:customer:5'),
    an AS (SELECT norm AS a_norm FROM norms WHERE s = 'urn:customer:5'),
    dots AS (
        SELECT w.s,
               CAST(SUM(CAST(w.w * aw.w AS DECIMAL(27,12))) AS DOUBLE) AS dot
        FROM w JOIN aw ON w.term = aw.term
        WHERE w.s <> 'urn:customer:5' GROUP BY 1
    ),
    scored AS (
        SELECT d.s,
               CAST(ROUND(d.dot / (n.norm * an.a_norm), 6)
                    AS DECIMAL(18,6)) AS sc
        FROM dots d JOIN norms n ON d.s = n.s CROSS JOIN an
    )
    SELECT s, CAST(sc AS DOUBLE) AS score FROM scored
    WHERE sc > 0 ORDER BY s
    """,
    doc="GraphDB similarity-plugin surface: ?x sim:similarTo <anchor> "
        "ranks subjects by TF-IDF cosine of their literal-token bags "
        "against a bound anchor subject; ?x sim:score ?s binds the score. "
        "Anchor-broadcast execution (operators/similarity.py): the corpus "
        "tokenizes once, the anchor's sparse vector broadcasts, candidates "
        "are exactly the subjects sharing ≥1 anchor term — never "
        "all-pairs; decimal partial sums + round(6) keep fold order out "
        "of the score. Customers share WKT-coordinate tokens on the "
        "custkey %80 / %100 lattices, so the similar set is structured "
        "and scale-stable.",
)
def sparql_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, """
        PREFIX sim: <urn:spark-graft:sim:>
        SELECT ?x ?sc WHERE {
          ?x sim:similarTo <urn:customer:5> .
          ?x sim:score ?sc .
        } ORDER BY ?x
    """)
    return df.select(
        _lex("x").alias("s"),
        F.col("sc")["num"].cast("double").alias("score"),
    )


@register(
    "sparql_owl_horst",
    """
    SELECT 'urn:customer:' || c_custkey AS c, c_name AS name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    ORDER BY c
    """,
    doc="owl-horst ruleset under the driver gate: a someValuesFrom "
        "restriction (ex:EuropeanCustomer ≡ ∃rel:inNation.ex:"
        "EuropeanNation) materializes at load over the RDF-ized store — "
        "nations typed ex:EuropeanNation via their rel:inRegion link to "
        "EUROPE feed rule rdfp15, so European customers acquire the "
        "restriction class without it appearing in any explicit "
        "statement. The SQL oracle is the plain 3-way join the "
        "entailment encodes.",
    cache_plan=False,
)
def sparql_owl_horst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.model.terms import OWL, RDF_TYPE

    EX = "urn:ex:"
    eng = Engine(spark)
    name = f"gate_owl_horst_{abs(hash(sf_dir)) % 10_000}"
    if name in eng.list_repositories():
        repo = eng._repos[name]
    else:
        repo = eng.create_repository(name, ruleset="owl-horst")
        base = _quads(spark, sf_dir)
        # restriction schema: EuropeanCustomer ≡ ∃inNation.EuropeanNation
        schema_rows = [
            (EX + "EuropeanCustomer", OWL + "onProperty", 0, R + "inNation"),
            (EX + "EuropeanCustomer", OWL + "someValuesFrom", 0,
             EX + "EuropeanNation"),
        ]
        schema = spark.createDataFrame(
            [(None, s, p, k, o, None, None, None, None, None)
             for s, p, k, o in schema_rows],
            base.schema,
        )
        # type the European nations from the data itself (region EUROPE)
        nation = load(spark, sf_dir, "nation")
        region = load(spark, sf_dir, "region")
        euro = (
            nation.join(region, nation.n_regionkey == region.r_regionkey)
            .filter(F.col("r_name") == "EUROPE")
            .select(*_quad(
                _iri("nation", "n_nationkey"), RDF_TYPE, 0,
                F.lit(EX + "EuropeanNation"),
            ))
        )
        repo.add_quads(base.unionByName(schema).unionByName(euro))
        repo.materialize_inference()
    df = repo.sparql(f"""
        PREFIX rel: <{R}>
        PREFIX ex: <{EX}>
        SELECT ?c ?name WHERE {{
          ?c a ex:EuropeanCustomer ; a rel:Customer ; rel:name ?name .
        }} ORDER BY ?c
    """)
    return df.select(_lex("c").alias("c"), _lex("name").alias("name"))


@register(
    "sparql_owl2_property_chain",
    """
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS c,
           'urn:region:' || CAST(n_regionkey AS VARCHAR) AS r
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    ORDER BY c, r
    """,
    doc="OWL 2 RL ruleset (GraphDB owl2-rl twin): an "
        "owl:propertyChainAxiom (rel:inNation rel:inRegion) materializes "
        "ex:custRegion at load via rule prp-spo2 — the customer-to-region "
        "hop exists in NO explicit statement; the chain's RDF-list walk "
        "is a fixed-length BGP, the instance side two pruned scans joined "
        "on the hop node. Oracle: the 2-way join the chain encodes.",
    cache_plan=False,
)
def sparql_owl2_property_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.model.terms import OWL, RDF

    EX = "urn:ex:"
    eng = Engine(spark)
    name = f"gate_owl2_chain_{abs(hash(sf_dir)) % 10_000}"
    if name in eng.list_repositories():
        repo = eng._repos[name]
    else:
        repo = eng.create_repository(name, ruleset="owl2-rl")
        base = _quads(spark, sf_dir)
        schema_rows = [
            (EX + "custRegion", OWL + "propertyChainAxiom", 0, EX + "l1"),
            (EX + "l1", RDF + "first", 0, R + "inNation"),
            (EX + "l1", RDF + "rest", 0, EX + "l2"),
            (EX + "l2", RDF + "first", 0, R + "inRegion"),
            (EX + "l2", RDF + "rest", 0, RDF + "nil"),
        ]
        schema = spark.createDataFrame(
            [(None, s, p, k, o, None, None, None, None, None)
             for s, p, k, o in schema_rows],
            base.schema,
        )
        repo.add_quads(base.unionByName(schema))
        repo.materialize_inference()
    df = repo.sparql(f"""
        PREFIX rel: <{R}>
        PREFIX ex: <{EX}>
        SELECT ?c ?r WHERE {{
          ?c a rel:Customer ; ex:custRegion ?r .
        }} ORDER BY ?c ?r
    """)
    return df.select(_lex("c").alias("c"), _lex("r").alias("r"))


@register(
    "sparql_owl2_chain4",
    """
    SELECT r.r_name AS region, COUNT(*) AS n
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region
    """,
    doc="OWL 2 RL prp-spo2 at chain length 4 (VERDICT r6 task 2): "
        "ex:orderRegionName ≡ byCustomer∘inNation∘inRegion∘name — the "
        "axiom table is collected driver-side (schema-static lists) and "
        "expands to an exact-length rule, 3 hop equi-joins fully "
        "distributed; no explicit statement links an order to a region "
        "name. Oracle: the 4-way join the chain encodes.",
    cache_plan=False,
)
def sparql_owl2_chain4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.model.terms import OWL, RDF

    EX = "urn:ex:"
    eng = Engine(spark)
    name = f"gate_owl2_chain4_{abs(hash(sf_dir)) % 10_000}"
    if name in eng.list_repositories():
        repo = eng._repos[name]
    else:
        repo = eng.create_repository(name, ruleset="owl2-rl")
        base = _quads(spark, sf_dir)
        orders = load(spark, sf_dir, "orders")
        order_edges = orders.select(*_quad(
            _iri("order", "o_orderkey"), EX + "byCustomer", 0,
            _iri("customer", "o_custkey"),
        ))
        chain = [EX + "byCustomer", R + "inNation", R + "inRegion",
                 R + "name"]
        schema_rows = [
            (EX + "orderRegionName", OWL + "propertyChainAxiom",
             0, EX + "n0"),
        ]
        for i, p in enumerate(chain):
            schema_rows.append((EX + f"n{i}", RDF + "first", 0, p))
            schema_rows.append((
                EX + f"n{i}", RDF + "rest", 0,
                EX + f"n{i + 1}" if i < len(chain) - 1 else RDF + "nil",
            ))
        schema = spark.createDataFrame(
            [(None, s, p, k, o, None, None, None, None, None)
             for s, p, k, o in schema_rows],
            base.schema,
        )
        repo.add_quads(base.unionByName(order_edges).unionByName(schema))
        repo.materialize_inference()
    df = repo.sparql(f"""
        PREFIX ex: <{EX}>
        SELECT ?region (COUNT(?o) AS ?n)
        WHERE {{ ?o ex:orderRegionName ?region }}
        GROUP BY ?region ORDER BY ?region
    """)
    return df.select(_lex("region").alias("region"), _long("n").alias("n"))


@register(
    "sparql_owl2_consistency",
    """
    SELECT 'cax-dw' AS rule,
           'urn:customer:' || CAST(c_custkey AS VARCHAR) AS focus,
           'urn:ex:LowBal' AS detail
    FROM customer
    WHERE c_acctbal >= 3000 AND c_acctbal < 5000
    ORDER BY focus
    """,
    doc="OWL 2 RL inconsistency detection as a validation report "
        "(VERDICT r6 task 2): ex:LowBal owl:disjointWith ex:MidBal over "
        "overlapping balance bands — every customer typed both lands in "
        "the cax-dw report (Repository.check_consistency), one row per "
        "violation, SHACL-report style. Oracle: the band overlap.",
    cache_plan=False,
)
def sparql_owl2_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.model.terms import OWL

    EX = "urn:ex:"
    eng = Engine(spark)
    name = f"gate_owl2_cons_{abs(hash(sf_dir)) % 10_000}"
    if name in eng.list_repositories():
        repo = eng._repos[name]
    else:
        repo = eng.create_repository(name, ruleset="none")
        customer = load(spark, sf_dir, "customer")
        cs = _iri("customer", "c_custkey")
        low = customer.filter(F.col("c_acctbal") < 5000).select(
            *_quad(cs, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                   0, F.lit(EX + "LowBal"))
        )
        mid = customer.filter(
            (F.col("c_acctbal") >= 3000) & (F.col("c_acctbal") < 7000)
        ).select(
            *_quad(cs, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                   0, F.lit(EX + "MidBal"))
        )
        axiom = spark.createDataFrame(
            [(None, EX + "LowBal", OWL + "disjointWith", 0, EX + "MidBal",
              None, None, None, None, None)],
            low.schema,
        )
        repo.add_quads(low.unionByName(mid).unionByName(axiom))
    return repo.check_consistency().orderBy("focus")


# ---------------------------------------------------------------------------
# SHACL validation report (VERDICT r4 task 2: the GraphDB/RDF4J SHACL
# engine surface, batch-validated as DataFrame checks — shacl.py)
# ---------------------------------------------------------------------------

_SHACL_SHAPES = f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix rel: <{R}> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
rel:CustomerShape a sh:NodeShape ; sh:targetClass rel:Customer ;
  sh:property [ sh:path rel:acctbal ; sh:minInclusive 0 ] ;
  sh:property [ sh:path rel:acctbal ; sh:maxInclusive 9000 ] ;
  sh:property [ sh:path rel:name ; sh:minCount 1 ;
                sh:pattern "^Customer#" ] ;
  sh:property [ sh:path rel:inNation ; sh:class rel:Nation ] .
"""

_SHACL_ORACLE = """
    WITH bal AS (
        SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS focus,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS value,
               CAST(c_acctbal AS DECIMAL(18,2)) AS b
        FROM customer
    )
    SELECT focus, 'urn:rel:acctbal' AS path, value,
           'MinInclusiveConstraintComponent' AS component
    FROM bal WHERE b < 0
    UNION ALL
    SELECT focus, 'urn:rel:acctbal' AS path, value,
           'MaxInclusiveConstraintComponent' AS component
    FROM bal WHERE b > 9000
"""


@register(
    "sparql_shacl_report",
    _SHACL_ORACLE,
    doc="SHACL core validation of the RDF-ized store: targetClass Customer; "
        "numeric-range violations on acctbal (minInclusive/maxInclusive), "
        "plus passing minCount/pattern/class checks exercising the "
        "cardinality join and instance anti-join. Every constraint is a "
        "JVM-side DataFrame check; the report is the relational face of "
        "sh:ValidationReport.",
)
def sparql_shacl_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.shacl import parse_shapes, validate

    report = validate(_quads(spark, sf_dir), parse_shapes(_SHACL_SHAPES))
    return report.select(
        "focus", "path", "value", F.col("constraint").alias("component")
    )


# ---------------------------------------------------------------------------
# Polygon containment (VERDICT r4 task 6: geof:sfWithin beyond rectangles)
# ---------------------------------------------------------------------------

# CCW triangle over the customer coordinate grid; vertices offset off the
# grid (lon step 0.005, lat step 0.002) so no point lies exactly on an
# edge — the engine ray-casts, the oracle half-plane-tests, and the two
# agree everywhere except exact-boundary ties, which this rules out.
_TRI = ((-6.4007, 53.2103), (-6.1003, 53.2501), (-6.3001, 53.3899))


def _tri_halfplanes_sql(tri=_TRI) -> str:
    (xa, ya), (xb, yb), (xc, yc) = tri
    def edge(x1, y1, x2, y2):
        return (f"(({x2} - {x1}) * (y - {y1}) - "
                f"({y2} - {y1}) * (x - {x1})) > 0")
    return " AND ".join([
        edge(xa, ya, xb, yb), edge(xb, yb, xc, yc), edge(xc, yc, xa, ya),
    ])


@register(
    "sparql_geo_polygon",
    f"""
    WITH pts AS (
        SELECT c_custkey,
               CAST(CAST(CAST(-6.45 + (c_custkey % 80) * 0.005 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS x,
               CAST(CAST(CAST(53.20 + (c_custkey % 100) * 0.002 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS y
        FROM customer
    )
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS c
    FROM pts WHERE {_tri_halfplanes_sql()}
    """,
    doc="geof:sfWithin with a NON-rectangular polygon: even-odd ray "
        "casting over the outer ring (JVM higher-order functions, no "
        "UDF). The oracle proves the ray-cast against an independent "
        "half-plane formulation of the same CCW triangle.",
)
def sparql_geo_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    geof = "http://www.opengis.net/def/function/geosparql/"
    ring = ", ".join(f"{x} {y}" for x, y in (*_TRI, _TRI[0]))
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        PREFIX geo: <http://www.opengis.net/ont/geosparql#>
        PREFIX geof: <{geof}>
        SELECT ?cust
        WHERE {{
          ?cust a rel:Customer ; geo:asWKT ?wkt .
          FILTER(geof:sfWithin(?wkt, "POLYGON(({ring}))"^^geo:wktLiteral))
        }}
    """)
    return df.select(_lex("cust").alias("c"))


@register(
    "sparql_geo_multipolygon",
    """
    WITH pts AS (
        SELECT c_custkey,
               CAST(CAST(CAST(-6.45 + (c_custkey % 80) * 0.005 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS x,
               CAST(CAST(CAST(53.20 + (c_custkey % 100) * 0.002 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS y
        FROM customer
    )
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS c
    FROM pts
    WHERE (x > -6.4025 AND x < -6.3025 AND y > 53.2205 AND y < 53.2805)
       OR (x > -6.2025 AND x < -6.1025 AND y > 53.3205 AND y < 53.3805)
    """,
    doc="geof:sfWithin with a MULTIPOLYGON (round 7): two disjoint "
        "member boxes flatten into one ring set and the even-odd "
        "crossing count gives union containment — box bounds sit at "
        "4 decimals, off the 3-decimal point grid, so open/closed "
        "agree. Oracle: the bbox disjunction.",
)
def sparql_geo_multipolygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    geof = "http://www.opengis.net/def/function/geosparql/"
    mp = ("MULTIPOLYGON("
          "((-6.4025 53.2205, -6.3025 53.2205, -6.3025 53.2805, "
          "-6.4025 53.2805, -6.4025 53.2205)), "
          "((-6.2025 53.3205, -6.1025 53.3205, -6.1025 53.3805, "
          "-6.2025 53.3805, -6.2025 53.3205)))")
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        PREFIX geo: <http://www.opengis.net/ont/geosparql#>
        PREFIX geof: <{geof}>
        SELECT ?cust
        WHERE {{
          ?cust a rel:Customer ; geo:asWKT ?wkt .
          FILTER(geof:sfWithin(?wkt, "{mp}"^^geo:wktLiteral))
        }}
    """)
    return df.select(_lex("cust").alias("c"))


# CCW triangle strictly inside _TRI, vertices 4-decimal (off the 3-decimal
# customer grid) so no point lies exactly on a hole edge either — verified
# min |edge cross product| over the grid ≈ 2.4e-7.
_HOLE = ((-6.3204, 53.2496), (-6.2206, 53.2604), (-6.2702, 53.3304))

def _tri_edge_dist_sql() -> str:
    """Point-to-triangle distance in SQL, replicating geof:distance's
    local equirectangular projection: per edge, clamp the projection
    parameter and take the hypotenuse, then LEAST over the three edges
    and convert degrees → meters."""
    pts = list(_TRI) + [_TRI[0]]
    edges = []
    for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
        ax = f"(({x1}) - x) * c"
        ay = f"(({y1}) - y)"
        bx = f"(({x2}) - x) * c"
        by = f"(({y2}) - y)"
        dx, dy = f"({bx} - {ax})", f"({by} - {ay})"
        l2 = f"({dx}*{dx} + {dy}*{dy})"
        t = (f"GREATEST(0.0, LEAST(1.0, "
             f"-(({ax})*{dx} + ({ay})*{dy}) / {l2}))")
        cx = f"(({ax}) + {t} * {dx})"
        cy = f"(({ay}) + {t} * {dy})"
        edges.append(f"SQRT({cx}*{cx} + {cy}*{cy})")
    import math
    scale = math.pi / 180.0 * 6371.0088e3
    return f"LEAST({', '.join(edges)}) * {scale!r}"


@register(
    "sparql_geo_distance_polygon",
    f"""
    WITH pts AS (
        SELECT c_custkey,
               CAST(CAST(CAST(-6.45 + (c_custkey % 80) * 0.005 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS x,
               CAST(CAST(CAST(53.20 + (c_custkey % 100) * 0.002 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS y
        FROM customer
    ), proj AS (
        SELECT c_custkey, x, y, COS(RADIANS(y)) AS c FROM pts
    )
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS c
    FROM proj
    WHERE ({_tri_halfplanes_sql()})
       OR ({_tri_edge_dist_sql()}) < 5000.0
    """,
    doc="geof:distance POINT→POLYGON (round 6): customers within 5 km of "
        "the triangle (0 inside; nearest-edge distance via the same "
        "local equirectangular projection outside — min |d-5000| over "
        "the grid is 19 m, no float ties). The oracle replicates the "
        "clamp projection per edge in SQL.",
    cache_plan=False,
)
def sparql_geo_distance_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    geof = "http://www.opengis.net/def/function/geosparql/"
    ring = ", ".join(f"{x} {y}" for x, y in (*_TRI, _TRI[0]))
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        PREFIX geo: <http://www.opengis.net/ont/geosparql#>
        PREFIX geof: <{geof}>
        SELECT ?cust
        WHERE {{
          ?cust a rel:Customer ; geo:asWKT ?wkt .
          FILTER(geof:distance(?wkt,
            "POLYGON(({ring}))"^^geo:wktLiteral) < 5000.0)
        }}
    """)
    return df.select(_lex("cust").alias("c"))


# diamond (45°-rotated square) for the polygon-polygon intersection gate:
# center off the customer grid, half-diagonals chosen so the clamp-formula
# margin over every grid square is ≥ 0.037 (no boundary ties)
_DIA_CX, _DIA_CY, _DIA_A, _DIA_B = -6.2504, 53.3003, 0.0503, 0.0211
_SQ_DX, _SQ_DY = 0.002, 0.0008


@register(
    "sparql_geo_poly_intersects",
    f"""
    WITH pts AS (
        SELECT c_custkey,
               CAST(CAST(CAST(-6.45 + (c_custkey % 80) * 0.005 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS x,
               CAST(CAST(CAST(53.20 + (c_custkey % 100) * 0.002 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS y
        FROM customer
    ), boxes AS (
        SELECT c_custkey,
               CAST(CAST(x - {_SQ_DX} AS DECIMAL(9,4)) AS DOUBLE) AS x1,
               CAST(CAST(x + {_SQ_DX} AS DECIMAL(9,4)) AS DOUBLE) AS x2,
               CAST(CAST(y - {_SQ_DY} AS DECIMAL(9,4)) AS DOUBLE) AS y1,
               CAST(CAST(y + {_SQ_DY} AS DECIMAL(9,4)) AS DOUBLE) AS y2
        FROM pts
    )
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS c
    FROM boxes
    WHERE ABS(LEAST(GREATEST({_DIA_CX}, x1), x2) - {_DIA_CX}) / {_DIA_A}
        + ABS(LEAST(GREATEST({_DIA_CY}, y1), y2) - {_DIA_CY}) / {_DIA_B}
       <= 1
    """,
    doc="Exact polygon-polygon geof:sfIntersects (round 6): a small "
        "axis-aligned square around each customer point vs a fixed "
        "diamond. The engine decides by edge-pair orientation crossing "
        "plus mutual containment probes (pure JVM higher-order "
        "functions); the oracle is the independent convex formulation — "
        "a box meets the L1-ball diamond iff the box point nearest the "
        "center has weighted L1 norm <= 1 (separable clamp).",
    cache_plan=False,
)
def sparql_geo_poly_intersects(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        _intersects_col,
    )

    customer = load(spark, sf_dir, "customer")
    x = (
        (F.lit(-6.45) + (F.col("c_custkey") % 80) * 0.005)
        .cast("decimal(8,3)").cast("double")
    )
    y = (
        (F.lit(53.20) + (F.col("c_custkey") % 100) * 0.002)
        .cast("decimal(8,3)").cast("double")
    )

    def d4(col: Column) -> Column:
        return col.cast("decimal(9,4)").cast("string")

    x1, x2 = d4(x - _SQ_DX), d4(x + _SQ_DX)
    y1, y2 = d4(y - _SQ_DY), d4(y + _SQ_DY)
    square = F.concat(
        F.lit("POLYGON(("),
        x1, F.lit(" "), y1, F.lit(", "),
        x2, F.lit(" "), y1, F.lit(", "),
        x2, F.lit(" "), y2, F.lit(", "),
        x1, F.lit(" "), y2, F.lit(", "),
        x1, F.lit(" "), y1, F.lit("))"),
    )
    diamond = (
        f"POLYGON(({_DIA_CX - _DIA_A} {_DIA_CY}, "
        f"{_DIA_CX} {_DIA_CY - _DIA_B}, "
        f"{_DIA_CX + _DIA_A} {_DIA_CY}, "
        f"{_DIA_CX} {_DIA_CY + _DIA_B}, "
        f"{_DIA_CX - _DIA_A} {_DIA_CY}))"
    )
    return customer.filter(
        _intersects_col(square, F.lit(diamond))
    ).select(
        F.concat(F.lit("urn:customer:"),
                 F.col("c_custkey").cast("string")).alias("c")
    )


@register(
    "sparql_geo_polygon_hole",
    f"""
    WITH pts AS (
        SELECT c_custkey,
               CAST(CAST(CAST(-6.45 + (c_custkey % 80) * 0.005 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS x,
               CAST(CAST(CAST(53.20 + (c_custkey % 100) * 0.002 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS y
        FROM customer
    )
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS c
    FROM pts WHERE ({_tri_halfplanes_sql()})
              AND NOT ({_tri_halfplanes_sql(_HOLE)})
    """,
    doc="geof:sfWithin with a polygon HOLE (round 6, VERDICT r5 task 5): "
        "the outer triangle minus an inner-ring triangle. The engine "
        "walks every ring's edges independently and sums even-odd "
        "crossings (a point in the hole crosses shell + hole = even = "
        "outside); the oracle is the independent half-plane formulation "
        "of shell AND NOT hole.",
)
def sparql_geo_polygon_hole(spark: SparkSession, sf_dir: str) -> DataFrame:
    geof = "http://www.opengis.net/def/function/geosparql/"
    shell = ", ".join(f"{x} {y}" for x, y in (*_TRI, _TRI[0]))
    hole = ", ".join(f"{x} {y}" for x, y in (*_HOLE, _HOLE[0]))
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        PREFIX geo: <http://www.opengis.net/ont/geosparql#>
        PREFIX geof: <{geof}>
        SELECT ?cust
        WHERE {{
          ?cust a rel:Customer ; geo:asWKT ?wkt .
          FILTER(geof:sfWithin(?wkt,
            "POLYGON(({shell}), ({hole}))"^^geo:wktLiteral))
        }}
    """)
    return df.select(_lex("cust").alias("c"))


# simple-features completion gates (round 6): per-customer axis-aligned
# squares on the same decimal(9,4) lattice as the intersects gate vs a
# fixed box whose edges sit exactly ON the square-edge lattice, so true
# boundary-touch cases exist and compare exactly in both engines.
_SF_BX1, _SF_BX2 = -6.308, -6.292   # on the x2 / x1 edge lattices
_SF_BY1, _SF_BY2 = 53.2408, 53.2592  # on the y2 / y1 edge lattices

_SF_PTS_SQL = f"""
    WITH pts AS (
        SELECT c_custkey,
               CAST(CAST(CAST(-6.45 + (c_custkey % 80) * 0.005 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS x,
               CAST(CAST(CAST(53.20 + (c_custkey % 100) * 0.002 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS y
        FROM customer
    ), boxes AS (
        SELECT c_custkey,
               CAST(CAST(x - {_SQ_DX} AS DECIMAL(9,4)) AS DOUBLE) AS x1,
               CAST(CAST(x + {_SQ_DX} AS DECIMAL(9,4)) AS DOUBLE) AS x2,
               CAST(CAST(y - {_SQ_DY} AS DECIMAL(9,4)) AS DOUBLE) AS y1,
               CAST(CAST(y + {_SQ_DY} AS DECIMAL(9,4)) AS DOUBLE) AS y2
        FROM pts
    )
"""


def _geo_term(lex) -> Column:
    """WKT lex Column/str → term struct accepted by the geof_* functions.
    A plain-string lex is a plan-time constant: tag it (``__geo_const__``)
    so the geo kernels parse it ONCE in Python and inline literal
    coordinate arrays instead of re-parsing the WKT per row (round 12 —
    higher-order functions never constant-fold)."""
    const = None
    if not isinstance(lex, Column):
        const = lex
        lex = F.lit(lex)
    out = _geo_term_struct(lex)
    if const is not None:
        out.__geo_const__ = const
    return out


def _geo_term_struct(lex: Column) -> Column:
    return F.struct(
        F.lit(2).cast("tinyint").alias("kind"), lex.alias("lex"),
        F.lit(None).cast("string").alias("dtype"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("decimal(38,10)").alias("num"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("boolean").alias("bool"),
    )


def _customer_square(customer: DataFrame, rotated: bool = False):
    """(df, square_wkt_column) on the shared decimal lattice; ``rotated``
    starts the ring at a different vertex AND reverses direction, so
    canonical-form comparisons are actually exercised."""
    x = (
        (F.lit(-6.45) + (F.col("c_custkey") % 80) * 0.005)
        .cast("decimal(8,3)").cast("double")
    )
    y = (
        (F.lit(53.20) + (F.col("c_custkey") % 100) * 0.002)
        .cast("decimal(8,3)").cast("double")
    )

    def d4(col: Column) -> Column:
        return col.cast("decimal(9,4)").cast("string")

    x1, x2 = d4(x - _SQ_DX), d4(x + _SQ_DX)
    y1, y2 = d4(y - _SQ_DY), d4(y + _SQ_DY)
    sp, cm = F.lit(" "), F.lit(", ")
    if rotated:  # start at (x2,y2), wind the other way
        wkt = F.concat(
            F.lit("POLYGON(("),
            x2, sp, y2, cm, x2, sp, y1, cm, x1, sp, y1, cm,
            x1, sp, y2, cm, x2, sp, y2, F.lit("))"),
        )
    else:
        wkt = F.concat(
            F.lit("POLYGON(("),
            x1, sp, y1, cm, x2, sp, y1, cm, x2, sp, y2, cm,
            x1, sp, y2, cm, x1, sp, y1, F.lit("))"),
        )
    return wkt


_SF_BOX_WKT = (
    f"POLYGON(({_SF_BX1} {_SF_BY1}, {_SF_BX2} {_SF_BY1}, "
    f"{_SF_BX2} {_SF_BY2}, {_SF_BX1} {_SF_BY2}, {_SF_BX1} {_SF_BY1}))"
)


@register(
    "sparql_geo_sf_touches",
    _SF_PTS_SQL + f"""
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS c
    FROM boxes
    WHERE (x1 <= {_SF_BX2} AND {_SF_BX1} <= x2
       AND y1 <= {_SF_BY2} AND {_SF_BY1} <= y2)
      AND NOT (x1 < {_SF_BX2} AND {_SF_BX1} < x2
           AND y1 < {_SF_BY2} AND {_SF_BY1} < y2)
    """,
    doc="geof:sfTouches (round 6): customer squares vs a fixed box whose "
        "edges sit exactly on the square-edge lattice. The engine decides "
        "by vertex-on-edge contact minus interior intersection; the "
        "oracle is the independent interval formulation — closed overlap "
        "in both axes without open overlap in both.",
    cache_plan=False,
)
def sparql_geo_sf_touches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        geof_sf_touches,
    )

    customer = load(spark, sf_dir, "customer")
    square = _customer_square(customer)
    res = geof_sf_touches([_geo_term(square), _geo_term(_SF_BOX_WKT)])
    return customer.filter(res["bool"]).select(
        F.concat(F.lit("urn:customer:"),
                 F.col("c_custkey").cast("string")).alias("c")
    )


# the overlaps box sits strictly OFF both square-edge lattices (margins
# >= 0.0005 in x, 0.0003 in y), so squares straddling an edge properly
# overlap and no comparison ever lands on a boundary tie
_OV_BX1, _OV_BX2 = -6.3065, -6.2935
_OV_BY1, _OV_BY2 = 53.2403, 53.2597

_OV_BOX_WKT = (
    f"POLYGON(({_OV_BX1} {_OV_BY1}, {_OV_BX2} {_OV_BY1}, "
    f"{_OV_BX2} {_OV_BY2}, {_OV_BX1} {_OV_BY2}, {_OV_BX1} {_OV_BY1}))"
)


@register(
    "sparql_geo_sf_overlaps",
    _SF_PTS_SQL + f"""
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS c
    FROM boxes
    WHERE (x1 < {_OV_BX2} AND {_OV_BX1} < x2
       AND y1 < {_OV_BY2} AND {_OV_BY1} < y2)
      AND NOT (x1 >= {_OV_BX1} AND x2 <= {_OV_BX2}
           AND y1 >= {_OV_BY1} AND y2 <= {_OV_BY2})
      AND NOT ({_OV_BX1} >= x1 AND {_OV_BX2} <= x2
           AND {_OV_BY1} >= y1 AND {_OV_BY2} <= y2)
    """,
    doc="geof:sfOverlaps (round 6): interiors meet, neither covers the "
        "other. Oracle is the independent interval algebra: open overlap "
        "in both axes minus closed containment either way. The box edges "
        "sit strictly between square-edge lattice points so genuine "
        "edge-straddling overlap cases exist.",
    cache_plan=False,
)
def sparql_geo_sf_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        geof_sf_overlaps,
    )

    customer = load(spark, sf_dir, "customer")
    square = _customer_square(customer)
    res = geof_sf_overlaps([_geo_term(square), _geo_term(_OV_BOX_WKT)])
    return customer.filter(res["bool"]).select(
        F.concat(F.lit("urn:customer:"),
                 F.col("c_custkey").cast("string")).alias("c")
    )


@register(
    "sparql_geo_envelope_within",
    f"""
    WITH pts AS (
        SELECT c_custkey,
               CAST(CAST(CAST(-6.45 + (c_custkey % 80) * 0.005 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS x,
               CAST(CAST(CAST(53.20 + (c_custkey % 100) * 0.002 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS y
        FROM pts_src
    )
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS c
    FROM pts
    WHERE x >= {min(p[0] for p in _TRI)} AND x <= {max(p[0] for p in _TRI)}
      AND y >= {min(p[1] for p in _TRI)} AND y <= {max(p[1] for p in _TRI)}
    """.replace("pts_src", "customer"),
    doc="geof:envelope (round 6): customer points within the COMPUTED "
        "envelope of the gate triangle — exercises the constructor "
        "feeding a predicate. Oracle: the triangle's literal bounding "
        "box (the same min/max the constructor must produce).",
    cache_plan=False,
)
def sparql_geo_envelope_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        geof_envelope, geof_sf_within,
    )

    customer = load(spark, sf_dir, "customer")
    x = (
        (F.lit(-6.45) + (F.col("c_custkey") % 80) * 0.005)
        .cast("decimal(8,3)").cast("string")
    )
    y = (
        (F.lit(53.20) + (F.col("c_custkey") % 100) * 0.002)
        .cast("decimal(8,3)").cast("string")
    )
    pt = F.concat(F.lit("POINT("), x, F.lit(" "), y, F.lit(")"))
    tri = "POLYGON((" + ", ".join(
        f"{px} {py}" for px, py in (*_TRI, _TRI[0])
    ) + "))"
    env = geof_envelope([_geo_term(tri)])
    res = geof_sf_within([_geo_term(pt), env])
    return customer.filter(res["bool"]).select(
        F.concat(F.lit("urn:customer:"),
                 F.col("c_custkey").cast("string")).alias("c")
    )


# the fixed equals-target square: the residue-220 customer square
# (x = -6.45 + 60*0.005 = -6.15, y = 53.20 + 20*0.002 = 53.24)
_SF_EQ_WKT = (
    "POLYGON((-6.1520 53.2392, -6.1480 53.2392, "
    "-6.1480 53.2408, -6.1520 53.2408, -6.1520 53.2392))"
)


@register(
    "sparql_geo_sf_equals",
    _SF_PTS_SQL + """
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS c
    FROM boxes WHERE c_custkey % 400 = 220
    """,
    doc="geof:sfEquals (round 6): each customer square — built ROTATED "
        "and REVERSED — against the residue-220 square written in "
        "standard order, so the canonical ring-set comparison (not "
        "string equality) decides. Oracle: the congruence that generates "
        "exactly those squares.",
    cache_plan=False,
)
def sparql_geo_sf_equals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        geof_sf_equals,
    )

    customer = load(spark, sf_dir, "customer")
    square = _customer_square(customer, rotated=True)
    res = geof_sf_equals([_geo_term(square), _geo_term(_SF_EQ_WKT)])
    return customer.filter(res["bool"]).select(
        F.concat(F.lit("urn:customer:"),
                 F.col("c_custkey").cast("string")).alias("c")
    )


# Egenhofer/RCC8 containment box: every edge sits ON the matching
# square-edge lattice (x1: -6.45+0.005k-0.002, x2: +0.002; y1/y2 the
# 0.002-grid analogues), so squares exist that touch each wall exactly
# from inside — the tangential (tpp) vs non-tangential (ntpp) split has
# genuine witnesses on both sides.
_EH_BX1, _EH_BX2 = -6.402, -6.248
_EH_BY1, _EH_BY2 = 53.2392, 53.3208

_EH_BOX_WKT = (
    f"POLYGON(({_EH_BX1} {_EH_BY1}, {_EH_BX2} {_EH_BY1}, "
    f"{_EH_BX2} {_EH_BY2}, {_EH_BX1} {_EH_BY2}, {_EH_BX1} {_EH_BY1}))"
)


@register(
    "sparql_geo_eh_rcc8",
    _SF_PTS_SQL + f"""
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS c,
           'ntpp' AS rel
    FROM boxes
    WHERE x1 > {_EH_BX1} AND x2 < {_EH_BX2}
      AND y1 > {_EH_BY1} AND y2 < {_EH_BY2}
    UNION ALL
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR), 'tpp'
    FROM boxes
    WHERE x1 >= {_EH_BX1} AND x2 <= {_EH_BX2}
      AND y1 >= {_EH_BY1} AND y2 <= {_EH_BY2}
      AND NOT (x1 > {_EH_BX1} AND x2 < {_EH_BX2}
           AND y1 > {_EH_BY1} AND y2 < {_EH_BY2})
    """,
    doc="Egenhofer/RCC8 containment split (round 6): geof:ehInside "
        "(= rcc8ntpp, strict interior containment, no boundary contact) "
        "vs geof:ehCoveredBy (= rcc8tpp, containment WITH boundary "
        "contact) of each customer square against a box whose walls lie "
        "exactly on the square-edge lattice. Oracle: interval algebra — "
        "open containment for ntpp, closed-minus-open for tpp. The other "
        "family members (ehEquals/ehDisjoint/ehMeet/ehOverlap and the "
        "rcc8 aliases) share the simple-features kernels already gated "
        "by sparql_geo_sf_*.",
    cache_plan=False,
)
def sparql_geo_eh_rcc8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        geof_eh_covered_by, geof_eh_inside,
    )

    customer = load(spark, sf_dir, "customer")
    square = _customer_square(customer)
    inside = geof_eh_inside([_geo_term(square), _geo_term(_EH_BOX_WKT)])
    covered = geof_eh_covered_by(
        [_geo_term(square), _geo_term(_EH_BOX_WKT)]
    )
    key = F.concat(
        F.lit("urn:customer:"), F.col("c_custkey").cast("string")
    ).alias("c")
    return (
        customer.filter(inside["bool"])
        .select(key, F.lit("ntpp").alias("rel"))
        .unionByName(
            customer.filter(covered["bool"])
            .select(key, F.lit("tpp").alias("rel"))
        )
    )


# ---------------------------------------------------------------------------
# Path search plugin (GraphDB graph-path-search twin, round 5)
# ---------------------------------------------------------------------------

def _path_bfs_oracle_sql(src: str, dst: str) -> str:
    """Recursive-CTE BFS + min-predecessor backtrack — an independent
    formulation of graph/paths.py's deterministic shortest path. ``pred``
    picks the MIN in-neighbour one BFS level up, exactly the engine's
    tie-break, so the hop list is unique in both engines."""
    return f"""
    WITH RECURSIVE
    edges AS ({_rdf_edges_sql()}),
    bfs(node, d) AS (
        SELECT '{src}', 0
        UNION
        SELECT e.dst, b.d + 1 FROM bfs b JOIN edges e ON e.src = b.node
        WHERE b.d < 10
    ),
    dist AS (SELECT node, MIN(d) AS dist FROM bfs GROUP BY node),
    pred AS (
        SELECT dd.node AS node, MIN(e.src) AS pred
        FROM edges e
        JOIN dist ds ON ds.node = e.src
        JOIN dist dd ON dd.node = e.dst
        WHERE dd.dist = ds.dist + 1
        GROUP BY dd.node
    ),
    walk(idx, node) AS (
        SELECT (SELECT dist FROM dist WHERE node = '{dst}'), '{dst}'
        UNION ALL
        SELECT w.idx - 1, p.pred FROM walk w JOIN pred p ON p.node = w.node
        WHERE w.idx > 0
    )
    """


@register(
    "sparql_path_shortest",
    _path_bfs_oracle_sql("urn:customer:7", "urn:rel:Region") + """
    SELECT a.node AS s, b.node AS e, CAST(a.idx AS BIGINT) AS i
    FROM walk a JOIN walk b ON b.idx = a.idx + 1
    ORDER BY i
    """,
    doc="GraphDB path plugin twin: path:findPath path:shortestPath over "
        "the store's IRI-object graph (customer -> nation -> region -> "
        "class node). Engine: Pregel-shaped BFS, frontier-only joins, "
        "O(path length) driver traffic, min-predecessor determinism "
        "(graph/paths.py). Oracle: recursive-CTE BFS + the same min-pred "
        "backtrack.",
)
def sparql_path_shortest(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, """
        PREFIX path: <urn:spark-graft:path:>
        SELECT ?s ?e ?i WHERE {
          [] path:findPath path:shortestPath ;
             path:sourceNode <urn:customer:7> ;
             path:destinationNode <urn:rel:Region> ;
             path:startNode ?s ; path:endNode ?e ;
             path:resultBindingIndex ?i .
        } ORDER BY ?i
    """)
    return df.select(
        _lex("s").alias("s"), _lex("e").alias("e"), _long("i").alias("i")
    )


@register(
    "sparql_path_distance",
    _path_bfs_oracle_sql("urn:customer:7", "urn:rel:Region") + """
    SELECT CAST(dist AS BIGINT) AS d FROM dist WHERE node = 'urn:rel:Region'
    """,
    doc="path:findPath path:distance: BFS hop count to the destination "
        "(empty result when unreachable, matching the plugin).",
)
def sparql_path_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, """
        PREFIX path: <urn:spark-graft:path:>
        SELECT ?d WHERE {
          [] path:findPath path:distance ;
             path:sourceNode <urn:customer:7> ;
             path:destinationNode <urn:rel:Region> ;
             path:distanceBinding ?d .
        }
    """)
    return df.select(_long("d").alias("d"))


@register(
    "sparql_path_allpaths",
    f"""
    WITH RECURSIVE
    edges AS ({_rdf_edges_sql()}),
    p(path, last, len) AS (
        SELECT ['urn:customer:3']::VARCHAR[], 'urn:customer:3', 0
        UNION ALL
        SELECT list_append(p.path, e.dst), e.dst, p.len + 1
        FROM p JOIN edges e ON e.src = p.last
        WHERE p.len < 4 AND p.last <> 'urn:rel:Region'
          AND NOT list_contains(p.path, e.dst)
    ),
    hits AS (SELECT path, len FROM p WHERE last = 'urn:rel:Region'),
    hops AS (
        SELECT array_to_string(path, '->') AS ps,
               unnest(generate_series(1, len)) AS k, path
        FROM hits
    )
    SELECT ps, path[k] AS s, path[k+1] AS e, CAST(k - 1 AS BIGINT) AS i
    FROM hops ORDER BY ps, i
    """,
    doc="path:findPath path:allPaths with path:maxPathLength and "
        "path:pathString: bounded simple-path enumeration (array-carried "
        "path, cycle filter; graph/paths.py all_simple_paths). Oracle: "
        "recursive CTE carrying the path as a list with the same bound "
        "and cycle check.",
)
def sparql_path_allpaths(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparql(spark, sf_dir, """
        PREFIX path: <urn:spark-graft:path:>
        SELECT ?ps ?s ?e ?i WHERE {
          [] path:findPath path:allPaths ;
             path:sourceNode <urn:customer:3> ;
             path:destinationNode <urn:rel:Region> ;
             path:maxPathLength 4 ;
             path:startNode ?s ; path:endNode ?e ;
             path:resultBindingIndex ?i ; path:pathString ?ps .
        } ORDER BY ?ps ?i
    """)
    return df.select(
        _lex("ps").alias("ps"), _lex("s").alias("s"),
        _lex("e").alias("e"), _long("i").alias("i"),
    )


# ---------------------------------------------------------------------------
# SHACL round-5 breadth: logical constraints and sh:closed under the gate
# ---------------------------------------------------------------------------

_SHACL_LOGIC_SHAPES = f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix rel: <{R}> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
rel:CustLogicShape a sh:NodeShape ; sh:targetClass rel:Customer ;
  sh:property [ sh:path rel:acctbal ; sh:or (
      [ sh:maxInclusive 1000 ] [ sh:minInclusive 5000 ] ) ] ;
  sh:property [ sh:path rel:name ;
      sh:not [ sh:pattern "^Customer#0*1[0-9]$" ] ] .
"""


@register(
    "sparql_shacl_logic",
    """
    WITH bal AS (
        SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS focus,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS value,
               CAST(c_acctbal AS DECIMAL(18,2)) AS b
        FROM customer
    )
    SELECT focus, 'urn:rel:acctbal' AS path, value,
           'OrConstraintComponent' AS component
    FROM bal WHERE b > 1000 AND b < 5000
    UNION ALL
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR), 'urn:rel:name',
           c_name, 'NotConstraintComponent'
    FROM customer WHERE regexp_matches(c_name, '^Customer#0*1[0-9]$')
    """,
    doc="SHACL logical constraints (round 5): sh:or of numeric-range "
        "alternatives (value conforms to neither branch -> violation) and "
        "sh:not of a pattern bundle (value matches the negated shape -> "
        "violation). Branch conditions are pure column expressions "
        "composed from the same _row_conditions the direct checks use.",
)
def sparql_shacl_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.shacl import parse_shapes, validate

    report = validate(_quads(spark, sf_dir), parse_shapes(_SHACL_LOGIC_SHAPES))
    return report.select(
        "focus", "path", "value", F.col("constraint").alias("component")
    )


_SHACL_CLOSED_SHAPES = f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix rel: <{R}> .
rel:ClosedCustomer a sh:NodeShape ; sh:targetClass rel:Customer ;
  sh:closed true ;
  sh:ignoredProperties ( <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> ) ;
  sh:property [ sh:path rel:name ] ;
  sh:property [ sh:path rel:inNation ] ;
  sh:property [ sh:path rel:acctbal ] .
"""


@register(
    "sparql_shacl_closed",
    """
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS focus,
           'http://www.opengis.net/ont/geosparql#asWKT' AS path,
           'ClosedConstraintComponent' AS component
    FROM customer
    """,
    doc="sh:closed + sh:ignoredProperties: customers declare name/"
        "inNation/acctbal and ignore rdf:type, so every geo:asWKT "
        "statement is flagged. One semi-join of the store against the "
        "focus set with a map-side predicate NOT-IN filter.",
)
def sparql_shacl_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.shacl import parse_shapes, validate

    report = validate(
        _quads(spark, sf_dir), parse_shapes(_SHACL_CLOSED_SHAPES)
    )
    return report.select("focus", "path", F.col("constraint").alias("component"))


# ---------------------------------------------------------------------------
# SHACL round-6: composite sh:path forms (sequence / alternative)
# ---------------------------------------------------------------------------

_SHACL_PATH_SHAPES = f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix rel: <{R}> .
rel:CustPathShape a sh:NodeShape ; sh:targetClass rel:Customer ;
  sh:property [ sh:path (rel:inNation rel:inRegion) ;
                sh:in (<urn:region:1> <urn:region:2>
                       <urn:region:3> <urn:region:4>) ] ;
  sh:property [ sh:path [ sh:alternativePath (rel:acctbal rel:name) ] ;
                sh:pattern "^[^-]" ] .
"""


@register(
    "sparql_shacl_path_composite",
    """
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS focus,
           'urn:rel:inNation/urn:rel:inRegion' AS path,
           'urn:region:' || CAST(n_regionkey AS VARCHAR) AS value,
           'InConstraintComponent' AS component
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_regionkey = 0
    UNION ALL
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR),
           '(urn:rel:acctbal|urn:rel:name)',
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR),
           'PatternConstraintComponent'
    FROM customer WHERE c_acctbal < 0
    """,
    doc="SHACL composite property paths (round 6, full path grammar "
        "SHACL 2.3.1): a SEQUENCE path (rel:inNation rel:inRegion) whose "
        "values are each customer's region - two predicate-pruned scans "
        "chained by one equi-join - constrained by sh:in to regions 1-4 "
        "(region-0 customers violate), and an ALTERNATIVE path "
        "(acctbal | name) - a union of two scans - whose values must not "
        "start with '-' (negative balances violate; every name conforms). "
        "Oracle replays both arms relationally.",
)
def sparql_shacl_path_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.shacl import parse_shapes, validate

    report = validate(
        _quads(spark, sf_dir), parse_shapes(_SHACL_PATH_SHAPES)
    )
    return report.select(
        "focus", "path", "value", F.col("constraint").alias("component")
    )


# ---------------------------------------------------------------------------
# SHACL round-6: join-level logical combinators (VERDICT r5 task 4)
# ---------------------------------------------------------------------------

_SHACL_OR_CLASS_SHAPES = f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix rel: <{R}> .
rel:CustOrClassShape a sh:NodeShape ; sh:targetClass rel:Customer ;
  sh:property [ sh:path rel:inNation ; sh:or (
      [ sh:class rel:Region ]
      [ sh:pattern "^urn:nation:[0-9]*[02468]$" ] ) ] ;
  sh:property [ sh:path rel:inNation ; sh:not [ sh:and (
      [ sh:class rel:Nation ]
      [ sh:pattern "^urn:nation:1?[0-9]$" ] ) ] ] .
"""


@register(
    "sparql_shacl_or_class",
    """
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS focus,
           'urn:rel:inNation' AS path,
           'urn:nation:' || CAST(c_nationkey AS VARCHAR) AS value,
           'OrConstraintComponent' AS component
    FROM customer WHERE c_nationkey % 2 = 1
    UNION ALL
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR),
           'urn:rel:inNation',
           'urn:nation:' || CAST(c_nationkey AS VARCHAR),
           'NotConstraintComponent'
    FROM customer WHERE c_nationkey <= 19
    """,
    doc="SHACL join-level logical combinators (round 6, VERDICT r5 task "
        "4): sh:or with an sh:class branch — the RDF4J idiom the row-level "
        "fast path used to reject — and sh:not over a nested sh:and of "
        "sh:class + pattern. Each branch materializes its violating-VALUE "
        "key set over the DISTINCT values of the path (sh:class = one join "
        "against the class's instance set) and the combinators are set "
        "algebra: intersection for sh:or, union for sh:and, complement "
        "for sh:not. A customer's nation violates the sh:or when it is "
        "no Region (always) AND its key is odd; it violates the sh:not "
        "when it IS a Nation with key <= 19.",
)
def sparql_shacl_or_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.shacl import parse_shapes, validate

    report = validate(
        _quads(spark, sf_dir), parse_shapes(_SHACL_OR_CLASS_SHAPES)
    )
    return report.select(
        "focus", "path", "value", F.col("constraint").alias("component")
    )


_SHACL_SPARQL_SHAPES = f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix rel: <{R}> .
rel:CustSparqlShape a sh:NodeShape ; sh:targetClass rel:Customer ;
  sh:sparql [ sh:message "negative balance in region 0" ; sh:select '''
      PREFIX rel: <{R}>
      SELECT $this ?value WHERE {{
        $this rel:acctbal ?value ; rel:inNation ?n .
        ?n rel:inRegion <urn:region:0> .
        FILTER(?value < 0)
      }}''' ] .
"""


@register(
    "sparql_shacl_sparql_constraint",
    """
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS focus,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS value,
           'SPARQLConstraintComponent' AS component
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_regionkey = 0 AND CAST(c_acctbal AS DECIMAL(18,2)) < 0
    """,
    doc="SHACL SPARQL-based constraint (round 6): sh:sparql + sh:select "
        "flagging customers in region 0 with a negative balance. The "
        "sh:select compiles through the engine's own SPARQL pipeline "
        "(join chain + FILTER), runs once over the data graph, and its "
        "solutions semi-join the targetClass focus set.",
)
def sparql_shacl_sparql_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.shacl import parse_shapes, validate

    report = validate(
        _quads(spark, sf_dir), parse_shapes(_SHACL_SPARQL_SHAPES)
    )
    return report.select(
        "focus", "value", F.col("constraint").alias("component")
    )


_SHACL_XONE_QVS_SHAPES = f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix rel: <{R}> .
rel:CustXoneShape a sh:NodeShape ; sh:targetClass rel:Customer ;
  sh:property [ sh:path rel:acctbal ; sh:xone (
      [ sh:minInclusive 0 ] [ sh:maxInclusive 1000 ] ) ] ;
  sh:property [ sh:path rel:inNation ;
      sh:qualifiedValueShape [ sh:class rel:Nation ;
                               sh:pattern "^urn:nation:[0-9]$" ] ;
      sh:qualifiedMinCount 1 ] .
"""


@register(
    "sparql_shacl_xone_qualified",
    """
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS focus,
           'urn:rel:acctbal' AS path,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS value,
           'XoneConstraintComponent' AS component
    FROM customer
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) >= 0
      AND CAST(c_acctbal AS DECIMAL(18,2)) <= 1000
    UNION ALL
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR),
           'urn:rel:inNation', NULL,
           'QualifiedMinCountConstraintComponent'
    FROM customer WHERE c_nationkey >= 10
    """,
    doc="SHACL sh:xone and sh:qualifiedValueShape (round 6): a balance "
        "in [0, 1000] conforms to BOTH xone branches (violation: exactly "
        "one required); a customer violates the qualified shape when its "
        "nation is not a single-digit-key Nation instance "
        "(qualifiedMinCount 1 over a class+pattern bundle). xone counts "
        "conforming branches with one groupBy over value-key sets; "
        "qualified counts conforming values per focus with one "
        "groupBy(focus).",
)
def sparql_shacl_xone_qualified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.shacl import parse_shapes, validate

    report = validate(
        _quads(spark, sf_dir), parse_shapes(_SHACL_XONE_QVS_SHAPES)
    )
    return report.select(
        "focus", "path", "value", F.col("constraint").alias("component")
    )


# -- round 8: GeoSPARQL §8.7-8.8 non-topological set functions ---------------
#
# Per-nation lattice boxes from n_nationkey (x0 = (k mod 5)*4,
# y0 = (k div 5)*4 — a 5×5 grid of 4×4 squares) feed geof:intersection /
# union / difference / symDifference / convexHull (geo/boolops.py via
# the Arrow-batched pandas UDFs — per-row, map-only). Outputs are
# canonical WKT (min-vertex start, shells CCW, holes CW, shortest-repr
# doubles) that the DuckDB oracle reproduces with interval algebra
# (GREATEST/LEAST) + string assembly — the lattice-box oracle pattern
# the r7 verdict prescribed.

_NB_SQL = """
    WITH b AS (
        SELECT n_nationkey AS k,
               CAST((n_nationkey % 5) * 4 AS DOUBLE) AS x0,
               CAST((n_nationkey // 5) * 4 AS DOUBLE) AS y0
        FROM nation
    )
"""


def _nation_box_cols():
    """(iri, x0, y0) Columns for the per-nation lattice box."""
    k = F.col("n_nationkey")
    x0 = (k % 5) * 4
    y0 = F.floor(k / 5).cast("int") * 4
    iri = F.concat(F.lit("urn:nation:"), k.cast("string"))
    return iri, x0, y0


def _box_wkt_col(x0, y0, w: int, h: int) -> Column:
    s = lambda c: c.cast("int").cast("string")  # noqa: E731
    x1, y1 = x0 + w, y0 + h
    sp, cm = F.lit(" "), F.lit(", ")
    return F.concat(
        F.lit("POLYGON(("),
        s(x0), sp, s(y0), cm, s(x1), sp, s(y0), cm,
        s(x1), sp, s(y1), cm, s(x0), sp, s(y1), cm, s(x0), sp, s(y0),
        F.lit("))"),
    )


def _v(e: str) -> str:
    return f"CAST({e} AS VARCHAR)"


def _sql_ring_ccw(xl, yl, xh, yh) -> str:
    """Canonical CCW box ring text '(xl yl, xh yl, xh yh, xl yh, xl yl)'."""
    return (
        f"'(' || {_v(xl)} || ' ' || {_v(yl)} || ', ' || {_v(xh)} || ' ' || "
        f"{_v(yl)} || ', ' || {_v(xh)} || ' ' || {_v(yh)} || ', ' || "
        f"{_v(xl)} || ' ' || {_v(yh)} || ', ' || {_v(xl)} || ' ' || "
        f"{_v(yl)} || ')'"
    )


def _sql_ring_cw(xl, yl, xh, yh) -> str:
    """Canonical CW (hole) box ring '(xl yl, xl yh, xh yh, xh yl, xl yl)'."""
    return (
        f"'(' || {_v(xl)} || ' ' || {_v(yl)} || ', ' || {_v(xl)} || ' ' || "
        f"{_v(yh)} || ', ' || {_v(xh)} || ' ' || {_v(yh)} || ', ' || "
        f"{_v(xh)} || ' ' || {_v(yl)} || ', ' || {_v(xl)} || ' ' || "
        f"{_v(yl)} || ')'"
    )


@register(
    "sparql_geo_intersection",
    _NB_SQL + f"""
    , i AS (
        SELECT k, GREATEST(x0, 3.0) AS xl, LEAST(x0 + 4.0, 15.0) AS xh,
               GREATEST(y0, 3.0) AS yl, LEAST(y0 + 4.0, 15.0) AS yh
        FROM b
    )
    SELECT 'urn:nation:' || CAST(k AS VARCHAR) AS n,
           CASE WHEN xh > xl AND yh > yl
                THEN 'POLYGON(' || {_sql_ring_ccw('xl', 'yl', 'xh', 'yh')}
                     || ')'
                ELSE 'GEOMETRYCOLLECTION EMPTY' END AS inter
    FROM i
    """,
    doc="geof:intersection (GeoSPARQL §8.7.2, VERDICT r7 task 2): each "
        "nation's 4×4 lattice box clipped by [3,15]² — full boxes, edge "
        "slivers, and empties all occur across the 5×5 grid. Oracle: "
        "interval algebra (GREATEST/LEAST) + canonical-WKT string "
        "assembly.",
)
def sparql_geo_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        geof_intersection,
    )

    nation = load(spark, sf_dir, "nation")
    iri, x0, y0 = _nation_box_cols()
    clip = "POLYGON((3 3, 15 3, 15 15, 3 15, 3 3))"
    res = geof_intersection(
        [_geo_term(_box_wkt_col(x0, y0, 4, 4)), _geo_term(clip)]
    )
    return nation.select(iri.alias("n"), res["lex"].alias("inter"))


@register(
    "sparql_geo_difference",
    _NB_SQL + f"""
    SELECT 'urn:nation:' || CAST(k AS VARCHAR) AS n,
           'POLYGON(' || {_sql_ring_ccw('x0', 'y0', 'x0 + 4.0', 'y0 + 4.0')}
           || ', '
           || {_sql_ring_cw('x0 + 1.0', 'y0 + 1.0', 'x0 + 3.0', 'y0 + 3.0')}
           || ')' AS diff
    FROM b
    """,
    doc="geof:difference (§8.7.3): box minus a centered inner box → a "
        "shell + hole POLYGON for every nation. Oracle: canonical shell "
        "(CCW from min vertex) + hole (CW) string assembly.",
)
def sparql_geo_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        geof_difference,
    )

    nation = load(spark, sf_dir, "nation")
    iri, x0, y0 = _nation_box_cols()
    res = geof_difference([
        _geo_term(_box_wkt_col(x0, y0, 4, 4)),
        _geo_term(_box_wkt_col(x0 + 1, y0 + 1, 2, 2)),
    ])
    return nation.select(iri.alias("n"), res["lex"].alias("diff"))


@register(
    "sparql_geo_union",
    _NB_SQL + f"""
    , m AS (
        SELECT k, x0, y0,
               '(' || {_sql_ring_ccw('x0', 'y0', 'x0 + 4.0', 'y0 + 4.0')}
               || ')' AS ma,
               '(' || {_sql_ring_ccw('x0 + 6.0', 'y0', 'x0 + 10.0',
                                     'y0 + 4.0')} || ')' AS mb
        FROM b
    )
    SELECT 'urn:nation:' || CAST(k AS VARCHAR) AS n,
           CASE WHEN k % 2 = 0
                THEN 'MULTIPOLYGON(' || LEAST(ma, mb) || ', '
                     || GREATEST(ma, mb) || ')'
                ELSE 'POLYGON('
                     || {_sql_ring_ccw('x0', 'y0', 'x0 + 6.0', 'y0 + 4.0')}
                     || ')' END AS un
    FROM m
    """,
    doc="geof:union (§8.7.4): even nations union a DISJOINT box (→ "
        "MULTIPOLYGON, members in canonical string order), odd nations "
        "an overlapping one (→ the boxes weld into one rectangle). "
        "Oracle: CASE over parity with LEAST/GREATEST member ordering.",
)
def sparql_geo_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.sparql.extensions import geof_union

    nation = load(spark, sf_dir, "nation")
    iri, x0, y0 = _nation_box_cols()
    k = F.col("n_nationkey")
    bx = F.when(k % 2 == 0, x0 + 6).otherwise(x0 + 2)
    res = geof_union([
        _geo_term(_box_wkt_col(x0, y0, 4, 4)),
        _geo_term(_box_wkt_col(bx, y0, 4, 4)),
    ])
    return nation.select(iri.alias("n"), res["lex"].alias("un"))


@register(
    "sparql_geo_symdifference",
    _NB_SQL + f"""
    , m AS (
        SELECT k,
               '(' || {_sql_ring_ccw('x0', 'y0', 'x0 + 2.0', 'y0 + 4.0')}
               || ')' AS ma,
               '(' || {_sql_ring_ccw('x0 + 4.0', 'y0', 'x0 + 6.0',
                                     'y0 + 4.0')} || ')' AS mb
        FROM b
    )
    SELECT 'urn:nation:' || CAST(k AS VARCHAR) AS n,
           'MULTIPOLYGON(' || LEAST(ma, mb) || ', ' || GREATEST(ma, mb)
           || ')' AS sd
    FROM m
    """,
    doc="geof:symDifference (§8.7.5): box XOR its 2-shifted twin → two "
        "2×4 strips as a MULTIPOLYGON. Oracle: the two strips assembled "
        "in canonical member order.",
)
def sparql_geo_symdifference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        geof_sym_difference,
    )

    nation = load(spark, sf_dir, "nation")
    iri, x0, y0 = _nation_box_cols()
    res = geof_sym_difference([
        _geo_term(_box_wkt_col(x0, y0, 4, 4)),
        _geo_term(_box_wkt_col(x0 + 2, y0, 4, 4)),
    ])
    return nation.select(iri.alias("n"), res["lex"].alias("sd"))


@register(
    "sparql_geo_convexhull",
    _NB_SQL + f"""
    SELECT 'urn:nation:' || CAST(k AS VARCHAR) AS n,
           'POLYGON(' || {_sql_ring_ccw('x0', 'y0', 'x0 + 4.0', 'y0 + 4.0')}
           || ')' AS hull
    FROM b
    """,
    doc="geof:convexHull (§8.7.1): monotone-chain hull of the box "
        "corners + an interior point — the interior point drops out and "
        "the hull is the box itself in canonical form.",
)
def sparql_geo_convexhull(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        geof_convex_hull,
    )

    nation = load(spark, sf_dir, "nation")
    iri, x0, y0 = _nation_box_cols()
    s = lambda c: c.cast("int").cast("string")  # noqa: E731
    sp, cm = F.lit(" "), F.lit("), (")
    mp = F.concat(
        F.lit("MULTIPOINT(("),
        s(x0), sp, s(y0), cm, s(x0 + 4), sp, s(y0), cm,
        s(x0 + 4), sp, s(y0 + 4), cm, s(x0), sp, s(y0 + 4), cm,
        s(x0 + 2), sp, s(y0 + 2),
        F.lit("))"),
    )
    res = geof_convex_hull([_geo_term(mp)])
    return nation.select(iri.alias("n"), res["lex"].alias("hull"))


# strict-interior relate box: 4-decimal bounds sit off the customers'
# 3-decimal point grid, so no point lies exactly on the boundary and the
# DE-9IM "within" pattern reduces to the strict bbox the oracle states
_REL_X1, _REL_X2 = -6.4025, -6.3025
_REL_Y1, _REL_Y2 = 53.2205, 53.2805


@register(
    "sparql_geo_relate",
    f"""
    WITH pts AS (
        SELECT c_custkey,
               CAST(CAST(CAST(-6.45 + (c_custkey % 80) * 0.005 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS x,
               CAST(CAST(CAST(53.20 + (c_custkey % 100) * 0.002 AS DOUBLE)
                    AS DECIMAL(8,3)) AS DOUBLE) AS y
        FROM customer
    )
    SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS c
    FROM pts
    WHERE x > {_REL_X1} AND x < {_REL_X2}
      AND y > {_REL_Y1} AND y < {_REL_Y2}
    """,
    doc="geof:relate (§8.8): DE-9IM 'within' pattern T*F**F*** between "
        "each customer POINT and an off-grid box — II nonempty forces "
        "strict interior for a point, which the oracle states as the "
        "strict bbox. Runs through real SPARQL FILTER text.",
)
def sparql_geo_relate(spark: SparkSession, sf_dir: str) -> DataFrame:
    geof = "http://www.opengis.net/def/function/geosparql/"
    box = (f"POLYGON(({_REL_X1} {_REL_Y1}, {_REL_X2} {_REL_Y1}, "
           f"{_REL_X2} {_REL_Y2}, {_REL_X1} {_REL_Y2}, "
           f"{_REL_X1} {_REL_Y1}))")
    df = _sparql(spark, sf_dir, f"""
        PREFIX rel: <{R}>
        PREFIX geo: <http://www.opengis.net/ont/geosparql#>
        PREFIX geof: <{geof}>
        SELECT ?cust
        WHERE {{
          ?cust a rel:Customer ; geo:asWKT ?wkt .
          FILTER(geof:relate(?wkt, "{box}"^^geo:wktLiteral, "T*F**F***"))
        }}
    """)
    return df.select(_lex("cust").alias("c"))


@register(
    "sparql_geo_line_clip",
    _NB_SQL + """
    SELECT 'urn:nation:' || CAST(k AS VARCHAR) AS n,
           CASE WHEN k % 7 > 0 THEN
             'LINESTRING(' || CAST(x0 AS VARCHAR) || ' '
               || CAST(y0 + 2.0 AS VARCHAR) || ', '
               || CAST(LEAST(x0 + CAST(k % 7 AS DOUBLE), x0 + 4.0)
                       AS VARCHAR)
               || ' ' || CAST(y0 + 2.0 AS VARCHAR) || ')'
           ELSE 'GEOMETRYCOLLECTION EMPTY' END AS clip
    FROM b
    """,
    doc="geof:intersection with a LINESTRING operand (round-8 linework "
        "support): a horizontal probe line of key-dependent length "
        "clipped by each nation's box — full spans, partial spans, and "
        "zero-length (empty) results all occur. Oracle: 1-D interval "
        "algebra + canonical LINESTRING assembly.",
)
def sparql_geo_line_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.sparql.extensions import (
        geof_intersection,
    )

    nation = load(spark, sf_dir, "nation")
    iri, x0, y0 = _nation_box_cols()
    k = F.col("n_nationkey")
    s = lambda c: c.cast("int").cast("string")  # noqa: E731
    line = F.concat(
        F.lit("LINESTRING("), s(x0 - 2), F.lit(" "), s(y0 + 2),
        F.lit(", "), s(x0 - 2 + 2 + k % 7), F.lit(" "), s(y0 + 2),
        F.lit(")"),
    )
    res = geof_intersection(
        [_geo_term(line), _geo_term(_box_wkt_col(x0, y0, 4, 4))]
    )
    return nation.select(iri.alias("n"), res["lex"].alias("clip"))
