"""Property-table views (SURVEY §1.5): pivoted wide views agree with the
SPARQL path and carry natively-typed columns."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import BooleanType, DecimalType, StringType, TimestampType

from dublin_smart_city_graphdb_spark import fixtures
from dublin_smart_city_graphdb_spark.engine import Engine

EX = fixtures.EX
SCHEMA = fixtures.SCHEMA


@pytest.fixture(scope="module")
def repo(spark):
    eng = Engine(spark)
    r = eng.create_repository("pt_repo", ruleset="none")
    r.load_turtle(fixtures.full_fixture_ttl(n=300))
    return r


@pytest.fixture(scope="module")
def facility_table(repo):
    return repo.property_table(
        columns={
            SCHEMA + "name": ("name", "string"),
            EX + "latitude": ("lat", "decimal"),
            EX + "longitude": ("lon", "decimal"),
            EX + "hasFacilityType": ("ftype", "iri"),
            EX + "inCommitteeArea": ("area", "iri"),
        },
        class_iri=EX + "Facility",
    )


def test_wide_shape_and_types(facility_table):
    assert facility_table.count() == 300  # one row per facility
    types = dict(facility_table.dtypes)
    assert types["lat"].startswith("decimal")
    assert types["name"] == "string"


def test_bbox_query_matches_sparql(repo, facility_table):
    wide = facility_table.filter(
        (F.col("lat") > 53.34) & (F.col("lat") < 53.36)
        & (F.col("lon") > -6.27) & (F.col("lon") < -6.25)
    )
    sparql_rows = repo.sparql_collect(
        f"""PREFIX ex: <{EX}>
        SELECT ?f WHERE {{
          ?f ex:latitude ?lat ; ex:longitude ?lon .
          FILTER(?lat > 53.34 && ?lat < 53.36 && ?lon > -6.27 && ?lon < -6.25)
        }}"""
    )
    assert {r["s"] for r in wide.collect()} == {r["f"].lex for r in sparql_rows}


def test_class_restriction(repo):
    areas = repo.property_table(
        columns={SCHEMA + "name": ("name", "string")},
        class_iri=EX + "CommitteeArea",
    )
    assert areas.count() == 5


def test_multivalued_collect_list(spark):
    eng = Engine(spark)
    r = eng.create_repository("pt_multi", ruleset="none")
    r.load_turtle("""
        @prefix ex: <http://pt#> .
        ex:d ex:tag "a" , "b" , "c" .
        ex:e ex:tag "x" .
    """)
    t = r.property_table(
        columns={"http://pt#tag": ("tags", "string")}, collect="list"
    )
    got = {row["s"]: sorted(row["tags"]) for row in t.collect()}
    assert got == {"http://pt#d": ["a", "b", "c"], "http://pt#e": ["x"]}


# -- star-view fast path (compiler routing, SURVEY §1.5) ---------------------

README_Q = (
    f"PREFIX ex: <{EX}>\nPREFIX schema: <{SCHEMA}>\n"
    "SELECT ?name ?type WHERE {\n"
    "  ?facility a ex:Facility ; schema:name ?name ; ex:hasFacilityType ?type .\n"
    "}"
)


@pytest.fixture(scope="module")
def wh_repo(spark, tmp_path_factory):
    eng = Engine(spark, warehouse=str(tmp_path_factory.mktemp("wh")))
    r = eng.create_repository("sv_repo", ruleset="none")
    r.load_turtle(fixtures.full_fixture_ttl(n=300))
    return r


def test_star_view_routes_readme_query_to_one_filescan(wh_repo):
    """The README acceptance-query star compiles to ONE columnar FileScan
    of the materialized view — no quads scan, no star groupBy shuffle."""
    baseline = {
        (r["name"].lex, r["type"].lex)
        for r in wh_repo.sparql_collect(README_Q)
    }
    wh_repo.materialize_star_view(
        "facility",
        [SCHEMA + "name", EX + "hasFacilityType", EX + "latitude"],
        class_iri=EX + "Facility",
    )
    df = wh_repo.sparql(README_Q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert "star_views" in plan  # scanning the view parquet, not quads
    got = {(r["name"].lex, r["type"].lex) for r in wh_repo.sparql_collect(README_Q)}
    assert got == baseline and len(got) > 0


def test_star_view_constant_object_and_fallbacks(wh_repo):
    """Constant objects filter the view columns; stars the view can't
    prove equivalent (unknown predicate, wrong class) fall back to the
    quads path and still answer correctly."""
    q_const = (
        f"PREFIX ex: <{EX}>\nPREFIX schema: <{SCHEMA}>\n"
        "SELECT ?name WHERE { ?f a ex:Facility ; schema:name ?name ; "
        "ex:hasFacilityType ex:Library . }"
    )
    base = {r["name"].lex for r in wh_repo.sparql_collect(q_const)}
    plan = wh_repo.sparql(q_const)._jdf.queryExecution().executedPlan().toString()
    assert "star_views" in plan
    assert {r["name"].lex for r in wh_repo.sparql_collect(q_const)} == base

    # predicate outside the view → falls back to quads (two scans of it)
    q_out = (
        f"PREFIX ex: <{EX}>\nPREFIX schema: <{SCHEMA}>\n"
        "SELECT ?name ?addr WHERE { ?f schema:name ?name ; schema:address ?addr . }"
    )
    plan2 = wh_repo.sparql(q_out)._jdf.queryExecution().executedPlan().toString()
    assert "star_views" not in plan2
    assert len(wh_repo.sparql_collect(q_out)) > 0

    # no rdf:type restriction in the query but the view is class-scoped →
    # must NOT use the view (it would silently drop untyped subjects)
    q_untyped = (
        f"PREFIX ex: <{EX}>\nPREFIX schema: <{SCHEMA}>\n"
        "SELECT ?name ?type WHERE { ?f schema:name ?name ; "
        "ex:hasFacilityType ?type . }"
    )
    plan3 = wh_repo.sparql(q_untyped)._jdf.queryExecution().executedPlan().toString()
    assert "star_views" not in plan3


def test_star_view_rebuilds_after_mutation(wh_repo):
    """Views are keyed on the statement-set version: loading more triples
    must transparently rebuild, not serve stale rows."""
    q = (
        f"PREFIX ex: <{EX}>\nPREFIX schema: <{SCHEMA}>\n"
        "SELECT ?name ?type WHERE { ?f a ex:Facility ; schema:name ?name ; "
        "ex:hasFacilityType ?type . }"
    )
    before = len(wh_repo.sparql_collect(q))
    wh_repo.load_turtle(
        f"""
        @prefix ex: <{EX}> .
        @prefix schema: <{SCHEMA}> .
        ex:newFacility a ex:Facility ;
            schema:name "Brand New Depot" ;
            ex:hasFacilityType ex:Library .
        """
    )
    rows = wh_repo.sparql_collect(q)
    assert len(rows) == before + 1
    assert any(r["name"].lex == "Brand New Depot" for r in rows)
    plan = wh_repo.sparql(q)._jdf.queryExecution().executedPlan().toString()
    assert "star_views" in plan  # still served by the (rebuilt) view
