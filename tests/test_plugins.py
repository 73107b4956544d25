"""GraphDB plugin surfaces as magic predicates: RDF Rank and Autocomplete.

The deployed GraphDB image (reference ``Dockerfile:2``) ships the RDF Rank
plugin (``?n rank:hasRDFRank ?r``) and the Autocomplete plugin (prefix
suggestions over IRI local names and labels); these tests pin the engine's
Spark-native twins — rank:hasRDFRank (fixed-2-iteration PageRank over the
store's IRI-object graph) and auto:query (map-side startswith over the
quad scan).
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def repo(spark):
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    name = "plugins_test"
    if name in eng.list_repositories():
        eng.drop_repository(name)
    r = eng.create_repository(name, ruleset="none")
    r.load_turtle("""
        @prefix ex: <http://x#> .
        ex:a ex:link ex:b .
        ex:c ex:link ex:b .
        ex:a ex:label "Alpha Station" .
        ex:b ex:label "alphabet depot" .
        ex:c ex:label "Gamma Hub" .
    """)
    return r


def test_rdf_rank_hand_computed(repo):
    """2-iteration PageRank, d=0.85 over a→b←c: literals are not edges,
    b collects both contributions (1.85 after round 1, 0.405 after round
    2), sources settle at the (1-d) floor."""
    rows = repo.sparql_collect("""
        PREFIX rank: <urn:spark-graft:rank:>
        SELECT ?s ?r WHERE { ?s rank:hasRDFRank ?r } ORDER BY ?s
    """)
    got = {r["s"].lex: float(r["r"].lex) for r in rows}
    assert got == {
        "http://x#a": 0.15,
        "http://x#b": 0.405,
        "http://x#c": 0.15,
    }


def test_rdf_rank_joins_into_bgp(repo):
    """rank bindings join the rest of the BGP on the node variable and are
    FILTER/ORDER-able like any numeric literal."""
    rows = repo.sparql_collect("""
        PREFIX ex: <http://x#>
        PREFIX rank: <urn:spark-graft:rank:>
        SELECT ?lbl ?r WHERE {
          ?s ex:label ?lbl ; rank:hasRDFRank ?r .
          FILTER(?r > 0.2)
        }
    """)
    assert [(r["lbl"].lex, float(r["r"].lex)) for r in rows] == [
        ("alphabet depot", 0.405)
    ]


def test_rdf_rank_requires_variables(repo):
    with pytest.raises(Exception, match="rank:hasRDFRank"):
        repo.sparql("""
            PREFIX rank: <urn:spark-graft:rank:>
            SELECT ?r WHERE { <http://x#a> rank:hasRDFRank 3.0 }
        """)


def test_autocomplete_literal_prefix_case_insensitive(repo):
    """'alpha' matches ex:a (label "Alpha Station") and ex:b ("alphabet
    depot") via literals — case-insensitively — but not ex:c."""
    rows = repo.sparql_collect("""
        PREFIX auto: <urn:spark-graft:auto:>
        SELECT ?s WHERE { ?s auto:query "alpha" } ORDER BY ?s
    """)
    assert [r["s"].lex for r in rows] == ["http://x#a", "http://x#b"]


def test_autocomplete_iri_local_name(repo):
    """IRI local names (text after the last /, # or :) are suggestible
    even when no literal matches — GraphDB's IRI autocomplete."""
    rows = repo.sparql_collect("""
        PREFIX auto: <urn:spark-graft:auto:>
        SELECT ?s WHERE { ?s auto:query "c" } ORDER BY ?s
    """)
    assert [r["s"].lex for r in rows] == ["http://x#c"]


def test_autocomplete_composes_with_bgp(repo):
    rows = repo.sparql_collect("""
        PREFIX ex: <http://x#>
        PREFIX auto: <urn:spark-graft:auto:>
        SELECT ?lbl WHERE { ?s auto:query "gamma" ; ex:label ?lbl }
    """)
    assert [r["lbl"].lex for r in rows] == ["Gamma Hub"]


def test_autocomplete_requires_literal_prefix(repo):
    with pytest.raises(Exception, match="auto:query"):
        repo.sparql("""
            PREFIX auto: <urn:spark-graft:auto:>
            SELECT ?s WHERE { ?s auto:query ?q }
        """)


@pytest.fixture()
def sim_repo(spark):
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    name = "plugins_sim"
    if name in eng.list_repositories():
        eng.drop_repository(name)
    r = eng.create_repository(name, ruleset="none")
    r.load_turtle("""
        @prefix ex: <http://x#> .
        ex:a ex:text "red green blue" .
        ex:b ex:text "red green yellow" .
        ex:c ex:text "purple orange teal" .
    """)
    return r


def test_similarity_tfidf_cosine_hand_computed(sim_repo):
    """anchor a shares {red, green} with b (cos = 2·ln(3/2)² / (2·ln(3/2)²
    + ln(3)²) ≈ 0.214098) and nothing with c; the anchor itself is
    excluded."""
    rows = sim_repo.sparql_collect("""
        PREFIX sim: <urn:spark-graft:sim:>
        SELECT ?x ?sc WHERE {
          ?x sim:similarTo <http://x#a> .
          ?x sim:score ?sc .
        } ORDER BY ?x
    """)
    assert [r["x"].lex for r in rows] == ["http://x#b"]
    assert abs(float(rows[0]["sc"].lex) - 0.214098) < 1e-5


def test_similarity_composes_with_bgp(sim_repo):
    rows = sim_repo.sparql_collect("""
        PREFIX ex: <http://x#>
        PREFIX sim: <urn:spark-graft:sim:>
        SELECT ?t WHERE {
          ?x sim:similarTo <http://x#a> ; ex:text ?t .
        }
    """)
    assert [r["t"].lex for r in rows] == ["red green yellow"]


def test_similarity_requires_bound_anchor(sim_repo):
    with pytest.raises(Exception, match="sim:similarTo"):
        sim_repo.sparql("""
            PREFIX sim: <urn:spark-graft:sim:>
            SELECT ?x WHERE { ?x sim:similarTo ?y }
        """)
