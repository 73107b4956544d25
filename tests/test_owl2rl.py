"""OWL 2 RL slice (round 6): property chains, owl:hasKey, and
maxCardinality-1 value merging on top of the pD* restriction rules.

Rules are the public W3C "OWL 2 Profiles" RL entailment table
(prp-spo2 at chain lengths 2-3, prp-key at key lengths 1-2, cls-maxc);
GraphDB exposes the same ruleset as ``owl2-rl(-optimized)``.
"""

from __future__ import annotations

from tests.test_horst import PFX, TTL_PFX, _repo


def test_property_chain_length2(spark):
    """prp-spo2: grandparent = parent o parent."""
    r = _repo(spark, "owl2_chain", TTL_PFX + """
        ex:grandparent owl:propertyChainAxiom ( ex:parent ex:parent ) .
        ex:a ex:parent ex:b .
        ex:b ex:parent ex:c .
        ex:c ex:parent ex:d .
    """, ruleset="owl2-rl")
    got = r.sparql_collect(
        PFX + "SELECT ?x ?y WHERE { ?x ex:grandparent ?y } ORDER BY ?x"
    )
    assert [(row["x"]["lex"], row["y"]["lex"]) for row in got] == [
        ("http://x#a", "http://x#c"), ("http://x#b", "http://x#d"),
    ]


def test_property_chain_length3(spark):
    r = _repo(spark, "owl2_chain3", TTL_PFX + """
        ex:ggp owl:propertyChainAxiom ( ex:p ex:p ex:p ) .
        ex:a ex:p ex:b . ex:b ex:p ex:c . ex:c ex:p ex:d .
    """, ruleset="owl2-rl")
    got = r.sparql_collect(PFX + "SELECT ?x ?y WHERE { ?x ex:ggp ?y }")
    assert [(row["x"]["lex"], row["y"]["lex"]) for row in got] == [
        ("http://x#a", "http://x#d"),
    ]


def test_has_key_merges_individuals(spark):
    """prp-key: two Person instances sharing the (ssn) key become sameAs,
    and the built-in equality machinery propagates their statements."""
    r = _repo(spark, "owl2_key", TTL_PFX + """
        ex:Person owl:hasKey ( ex:ssn ) .
        ex:p1 a ex:Person ; ex:ssn "123" ; ex:nick "one" .
        ex:p2 a ex:Person ; ex:ssn "123" .
        ex:p3 a ex:Person ; ex:ssn "999" .
    """, ruleset="owl2-rl")
    same = r.sparql_collect(
        PFX + "ASK { ex:p1 owl:sameAs ex:p2 }")
    assert same[0]["ask"] is True
    # sameAs rewrites let p2 see p1's nick
    nick = r.sparql_collect(
        PFX + 'ASK { ex:p2 ex:nick "one" }')
    assert nick[0]["ask"] is True
    not_same = r.sparql_collect(
        PFX + "ASK { ex:p1 owl:sameAs ex:p3 }")
    assert not_same[0]["ask"] is False


def test_has_key_two_properties(spark):
    """prp-key with a 2-property key: BOTH values must match."""
    r = _repo(spark, "owl2_key2", TTL_PFX + """
        ex:Flight owl:hasKey ( ex:code ex:day ) .
        ex:f1 a ex:Flight ; ex:code "EI123" ; ex:day "mon" .
        ex:f2 a ex:Flight ; ex:code "EI123" ; ex:day "mon" .
        ex:f3 a ex:Flight ; ex:code "EI123" ; ex:day "tue" .
    """, ruleset="owl2-rl")
    assert r.sparql_collect(
        PFX + "ASK { ex:f1 owl:sameAs ex:f2 }")[0]["ask"] is True
    assert r.sparql_collect(
        PFX + "ASK { ex:f1 owl:sameAs ex:f3 }")[0]["ask"] is False


def test_max_cardinality_one_merges_values(spark):
    """cls-maxc: a maxCardinality-1 restriction merges the two observed
    values of the restricted property."""
    r = _repo(spark, "owl2_maxc", TTL_PFX + """
        ex:SingleCapital owl:onProperty ex:capital ;
                         owl:maxCardinality 1 .
        ex:ireland a ex:SingleCapital ;
                   ex:capital ex:dublin ; ex:capital ex:bac .
    """, ruleset="owl2-rl")
    assert r.sparql_collect(
        PFX + "ASK { ex:dublin owl:sameAs ex:bac }")[0]["ask"] is True
