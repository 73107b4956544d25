"""SPARQL-callable BM25 full-text search (GraphDB Lucene-connector
surface, VERDICT r3 task 6): fts:match / fts:score magic predicates
compiled to the operators/fts.py inverted-index-probe aggregation."""

from __future__ import annotations

import pytest

FTS_TTL = """
@prefix ex: <http://example.org/> .
@prefix schema: <http://schema.org/> .
ex:pool a ex:Facility ; schema:name "Ballymun swimming pool" ;
        schema:address "Main Street Ballymun Dublin" .
ex:lib a ex:Facility ; schema:name "Central library" ;
       schema:address "Pearse Street Dublin" .
ex:park a ex:Facility ; schema:name "Phoenix park playground" .
"""


@pytest.fixture(scope="module")
def repo(spark):
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    r = eng.create_repository("fts_test", ruleset="none")
    r.load_turtle_text(FTS_TTL)
    yield r
    eng.drop_repository("fts_test")


def q(repo, text):
    return repo.sparql("PREFIX fts: <urn:spark-graft:fts:>\n" + text)


def test_match_restricts_to_matching_subjects(repo):
    rows = q(repo, """
        SELECT ?s WHERE { ?s fts:match "ballymun" } ORDER BY ?s
    """).collect()
    assert [r["s"]["lex"] for r in rows] == ["http://example.org/pool"]


def test_multi_term_query_ranks_by_score(repo):
    rows = q(repo, """
        SELECT ?s ?score WHERE {
          ?s fts:match "dublin ballymun" .
          ?s fts:score ?score .
        } ORDER BY DESC(?score) ?s
    """).collect()
    subjects = [r["s"]["lex"] for r in rows]
    # pool matches both terms (ballymun twice + dublin), lib matches dublin
    assert subjects[0] == "http://example.org/pool"
    assert set(subjects) == {
        "http://example.org/pool", "http://example.org/lib",
    }
    scores = [float(r["score"]["num"]) for r in rows]
    assert scores[0] > scores[1] > 0


def test_fts_joins_with_bgp_patterns(repo):
    rows = q(repo, """
        PREFIX schema: <http://schema.org/>
        SELECT ?name WHERE {
          ?s fts:match "dublin" .
          ?s schema:name ?name .
        } ORDER BY ?name
    """).collect()
    assert [r["name"]["lex"] for r in rows] == [
        "Ballymun swimming pool", "Central library",
    ]


def test_score_without_match_raises(repo):
    with pytest.raises(Exception, match="fts:score"):
        q(repo, """
            SELECT ?s ?sc WHERE { ?s fts:score ?sc }
        """).collect()


def test_no_hits_yields_empty(repo):
    rows = q(repo, """
        SELECT ?s WHERE { ?s fts:match "zzz_unseen_term" }
    """).collect()
    assert rows == []
