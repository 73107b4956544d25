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
