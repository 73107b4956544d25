"""OWL-Horst (pD*) ruleset: restriction rules on top of RDFS-Plus.

Pins the four pD* restriction rules (ter Horst 2005: rdfp14a/14b/15/16)
that ``ruleset="owl-horst"`` adds over the built-in RDFS-Plus batch, plus
GraphDB ruleset-name aliasing (``rdfsplus-optimized`` etc.).
"""

from __future__ import annotations

import pytest

PFX = """
    PREFIX ex: <http://x#>
    PREFIX owl: <http://www.w3.org/2002/07/owl#>
    PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
"""

TTL_PFX = """
@prefix ex: <http://x#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
"""


def _repo(spark, name, ttl, ruleset="owl-horst"):
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    if name in eng.list_repositories():
        eng.drop_repository(name)
    r = eng.create_repository(name, ruleset=ruleset)
    r.load_turtle(ttl)
    return r


def test_has_value_both_directions(spark):
    """rdfp14a: holding the value types the subject; rdfp14b: being typed
    asserts the value."""
    r = _repo(spark, "horst_hv", TTL_PFX + """
        ex:DublinThing owl:onProperty ex:city ; owl:hasValue ex:dublin .
        ex:spire ex:city ex:dublin .
        ex:liffey a ex:DublinThing .
    """)
    typed = r.sparql_collect(
        PFX + "SELECT ?x WHERE { ?x a ex:DublinThing } ORDER BY ?x"
    )
    assert {x["x"].lex for x in typed} == {
        "http://x#spire", "http://x#liffey",
    }
    vals = r.sparql_collect(PFX + "SELECT ?c WHERE { ex:liffey ex:city ?c }")
    assert [x["c"].lex for x in vals] == ["http://x#dublin"]


def test_some_values_from(spark):
    """rdfp15: an ex:worksAt link to something typed ex:Hospital types the
    subject as ex:HospitalWorker; a link to an untyped target does not."""
    r = _repo(spark, "horst_svf", TTL_PFX + """
        ex:HospitalWorker owl:onProperty ex:worksAt ;
                          owl:someValuesFrom ex:Hospital .
        ex:stjames a ex:Hospital .
        ex:maria ex:worksAt ex:stjames .
        ex:john ex:worksAt ex:shop1 .
    """)
    rows = r.sparql_collect(
        PFX + "SELECT ?x WHERE { ?x a ex:HospitalWorker }"
    )
    assert [x["x"].lex for x in rows] == ["http://x#maria"]


def test_all_values_from(spark):
    """rdfp16: every ex:treats target of a typed ex:Doctor is a
    ex:Patient."""
    r = _repo(spark, "horst_avf", TTL_PFX + """
        ex:Doctor owl:onProperty ex:treats ; owl:allValuesFrom ex:Patient .
        ex:greg a ex:Doctor .
        ex:greg ex:treats ex:ann .
        ex:greg ex:treats ex:bob .
    """)
    rows = r.sparql_collect(
        PFX + "SELECT ?p WHERE { ?p a ex:Patient } ORDER BY ?p"
    )
    assert [x["p"].lex for x in rows] == ["http://x#ann", "http://x#bob"]


def test_restrictions_chain_with_rdfs_rules(spark):
    """The combined batch reaches a joint fixpoint: someValuesFrom fires
    off an rdfs:subClassOf-inferred type, and the restriction-derived type
    feeds subClassOf in turn."""
    r = _repo(spark, "horst_chain", TTL_PFX + """
        ex:Clinic rdfs:subClassOf ex:Hospital .
        ex:HospitalWorker owl:onProperty ex:worksAt ;
                          owl:someValuesFrom ex:Hospital .
        ex:HospitalWorker rdfs:subClassOf ex:EssentialWorker .
        ex:smithfield a ex:Clinic .
        ex:maria ex:worksAt ex:smithfield .
    """)
    rows = r.sparql_collect(
        PFX + "SELECT ?x WHERE { ?x a ex:EssentialWorker }"
    )
    assert [x["x"].lex for x in rows] == ["http://x#maria"]


def test_graphdb_ruleset_aliases(spark):
    """The reference posts ruleset=rdfsplus-optimized (init-graphdb.sh:54);
    -optimized variants and 'empty' normalize to the engine's families,
    unknown names fail at create time."""
    from dublin_smart_city_graphdb_spark.engine import Engine, _norm_ruleset

    assert _norm_ruleset("rdfsplus-optimized") == "rdfsplus"
    assert _norm_ruleset("owl-horst-optimized") == "owl-horst"
    assert _norm_ruleset("empty") == "none"
    eng = Engine(spark)
    with pytest.raises(ValueError, match="unknown ruleset"):
        eng.create_repository("horst_bad", ruleset="owl2-ql")

    if "horst_alias" in eng.list_repositories():
        eng.drop_repository("horst_alias")
    r = eng.create_repository("horst_alias", ruleset="rdfsplus-optimized")
    r.load_turtle(TTL_PFX + """
        ex:Clinic rdfs:subClassOf ex:Hospital .
        ex:smithfield a ex:Clinic .
    """)
    rows = r.sparql_collect(PFX + "SELECT ?x WHERE { ?x a ex:Hospital }")
    assert [x["x"].lex for x in rows] == ["http://x#smithfield"]
