"""RDF-star / SPARQL-star (GraphDB 10.x engine surface): quoted triples as
terms — Turtle-star parsing (explicit << >> and {| |} annotation sugar),
columnar storage as kind=3 with canonical N-Triples-star text, SPARQL-star
pattern decomposition, the TRIPLE/SUBJECT/PREDICATE/OBJECT/isTRIPLE
builtins, and N-Triples export."""

from __future__ import annotations

import pytest

from dublin_smart_city_graphdb_spark.engine import Engine

P = "PREFIX ex: <http://star#> "


@pytest.fixture(scope="module")
def star(spark):
    eng = Engine(spark)
    r = eng.create_repository("rdfstar", ruleset="none")
    r.load_turtle("""
    @prefix ex: <http://star#> .
    << ex:a ex:p ex:b >> ex:certainty 0.9 .
    << ex:a ex:p ex:c >> ex:certainty 0.4 .
    << ex:a ex:p "v w"@en >> ex:source ex:sensor2 .
    ex:d ex:p ex:e {| ex:source ex:sensor1 ; ex:certainty 0.5 |} .
    ex:plain ex:p ex:q .
    """)
    return r


def lex(rows):
    return sorted(
        tuple(t.lex if t is not None else None for t in row) for row in rows
    )


def test_quoted_pattern_decomposes_variables(star):
    got = lex(star.sparql_collect(
        P + "SELECT ?s ?o ?c WHERE { << ?s ex:p ?o >> ex:certainty ?c }"
    ))
    assert got == [
        ("http://star#a", "http://star#b", "0.9"),
        ("http://star#a", "http://star#c", "0.4"),
        ("http://star#d", "http://star#e", "0.5"),
    ]


def test_quoted_pattern_filters_on_annotation(star):
    got = lex(star.sparql_collect(
        P + "SELECT ?o WHERE { << ex:a ex:p ?o >> ex:certainty ?c . "
            "FILTER(?c > 0.5) }"
    ))
    assert got == [("http://star#b",)]


def test_ground_quoted_subject_matches(star):
    got = lex(star.sparql_collect(
        P + "SELECT ?c WHERE { << ex:a ex:p ex:b >> ex:certainty ?c }"
    ))
    assert got == [("0.9",)]


def test_literal_object_component_with_spaces_and_lang(star):
    rows = star.sparql_collect(
        P + "SELECT ?o WHERE { << ex:a ex:p ?o >> ex:source ex:sensor2 }"
    )
    (o,) = rows[0]
    assert o.lex == "v w" and o.lang == "en" and o.kind == 2


def test_annotation_sugar_asserts_and_annotates(star):
    # the annotated triple IS asserted ...
    assert lex(star.sparql_collect(
        P + "SELECT ?o WHERE { ex:d ex:p ?o }"
    )) == [("http://star#e",)]
    # ... and both annotations attach to its quoted form
    got = lex(star.sparql_collect(
        P + "SELECT ?src ?c WHERE { << ex:d ex:p ex:e >> ex:source ?src ; "
            "ex:certainty ?c }"
    ))
    assert got == [("http://star#sensor1", "0.5")]


def test_plain_quoted_statement_is_not_asserted(star):
    # << ex:a ex:p ex:b >> annotated but never asserted directly
    assert star.sparql_collect(
        P + "SELECT ?x WHERE { ex:a ex:p ex:b . BIND(1 AS ?x) }"
    ) == []


def test_accessors_and_istriple(star):
    rows = star.sparql_collect(
        P + "SELECT ?s ?p ?o WHERE { ?t ex:certainty 0.9 . "
            "FILTER(isTRIPLE(?t)) "
            "BIND(SUBJECT(?t) AS ?s) BIND(PREDICATE(?t) AS ?p) "
            "BIND(OBJECT(?t) AS ?o) }"
    )
    (s, p, o) = rows[0]
    assert (s.lex, p.lex, o.lex) == (
        "http://star#a", "http://star#p", "http://star#b"
    )
    # SUBJECT of a non-triple is an error → unbound
    rows = star.sparql_collect(
        P + "SELECT ?x WHERE { ex:plain ex:p ?q . "
            "BIND(SUBJECT(ex:plain) AS ?x) }"
    )
    assert rows[0][0] is None or rows[0][0].kind is None  # error → unbound


def test_triple_constructor_joins_back(star):
    got = lex(star.sparql_collect(
        P + 'SELECT ?c WHERE { BIND(TRIPLE(ex:a, ex:p, ex:b) AS ?t) '
            "?t ex:certainty ?c }"
    ))
    assert got == [("0.9",)]


def test_variable_binds_whole_quoted_term_and_exports(star):
    rows = star.sparql_collect(
        P + "SELECT ?t WHERE { ?t ex:certainty 0.9 }"
    )
    assert rows[0][0].lex == "<< <http://star#a> <http://star#p> <http://star#b> >>"
    # results-JSON carries the quoted term as a "triple" binding
    doc = star.sparql_json(P + "SELECT ?t WHERE { ?t ex:certainty 0.9 }")
    b = doc["results"]["bindings"][0]["t"]
    assert b["type"] == "triple" and b["value"].startswith("<< ")


def test_update_insert_quoted_data(star):
    star.update(
        'PREFIX ex: <http://star#> INSERT DATA { '
        "<< ex:x ex:p ex:y >> ex:certainty 0.7 }"
    )
    got = lex(star.sparql_collect(
        P + "SELECT ?c WHERE { << ex:x ex:p ?o >> ex:certainty ?c }"
    ))
    assert got == [("0.7",)]


def test_construct_star_template(star):
    """CONSTRUCT-star: the template builds quoted terms from solution
    components; the result round-trips through N-Triples-star export."""
    from dublin_smart_city_graphdb_spark.sparql.protocol import (
        construct_to_ntriples,
    )

    df = star.sparql(
        P + "CONSTRUCT { << ?s ex:p ?o >> ex:reviewed true } "
            "WHERE { << ?s ex:p ?o >> ex:certainty ?c . "
            "FILTER(?c IN (0.9, 0.5)) }"  # order-independent of the
            # 0.7-certainty annotation the update test inserts
    )
    lines = sorted(
        r["value"] for r in construct_to_ntriples(df).collect()
    )
    assert lines == [
        '<< <http://star#a> <http://star#p> <http://star#b> >> '
        '<http://star#reviewed> "true"^^'
        '<http://www.w3.org/2001/XMLSchema#boolean> .',
        '<< <http://star#d> <http://star#p> <http://star#e> >> '
        '<http://star#reviewed> "true"^^'
        '<http://www.w3.org/2001/XMLSchema#boolean> .',
    ]
