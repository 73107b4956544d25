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


# -- round-7: the full RL rule table ------------------------------------

def _ask(r, q):
    return r.sparql_collect(PFX + q)[0]["ask"] is True


def test_property_chain_length4_and_5(spark):
    """prp-spo2 at arbitrary length (r6 capped at 3): chains expand to
    exact-length join rules from the driver-collected axiom table."""
    r = _repo(spark, "owl2_chain45", TTL_PFX + """
        ex:c4 owl:propertyChainAxiom ( ex:p ex:p ex:p ex:p ) .
        ex:c5 owl:propertyChainAxiom ( ex:p ex:p ex:p ex:p ex:p ) .
        ex:a ex:p ex:b . ex:b ex:p ex:c . ex:c ex:p ex:d .
        ex:d ex:p ex:e . ex:e ex:p ex:f .
    """, ruleset="owl2-rl")
    got4 = r.sparql_collect(PFX + "SELECT ?x ?y WHERE { ?x ex:c4 ?y } ORDER BY ?x")
    assert [(w["x"]["lex"], w["y"]["lex"]) for w in got4] == [
        ("http://x#a", "http://x#e"), ("http://x#b", "http://x#f"),
    ]
    got5 = r.sparql_collect(PFX + "SELECT ?x ?y WHERE { ?x ex:c5 ?y }")
    assert [(w["x"]["lex"], w["y"]["lex"]) for w in got5] == [
        ("http://x#a", "http://x#f"),
    ]


def test_has_key_length3(spark):
    r = _repo(spark, "owl2_key3", TTL_PFX + """
        ex:P owl:hasKey ( ex:k1 ex:k2 ex:k3 ) .
        ex:a a ex:P ; ex:k1 "1" ; ex:k2 "2" ; ex:k3 "3" .
        ex:b a ex:P ; ex:k1 "1" ; ex:k2 "2" ; ex:k3 "3" .
        ex:c a ex:P ; ex:k1 "1" ; ex:k2 "2" ; ex:k3 "9" .
    """, ruleset="owl2-rl")
    assert _ask(r, "ASK { ex:a owl:sameAs ex:b }")
    assert not _ask(r, "ASK { ex:a owl:sameAs ex:c }")


def test_intersection_union_oneof(spark):
    """cls-int1 (all members → c), cls-int2 (c → members), scm-int,
    cls-uni, scm-uni, cls-oo."""
    r = _repo(spark, "owl2_bool", TTL_PFX + """
        ex:Both owl:intersectionOf ( ex:A ex:B ) .
        ex:Either owl:unionOf ( ex:C ex:D ) .
        ex:Enum owl:oneOf ( ex:e1 ex:e2 ) .
        ex:x a ex:A , ex:B .
        ex:y a ex:Both .
        ex:z a ex:C .
    """, ruleset="owl2-rl")
    assert _ask(r, "ASK { ex:x a ex:Both }")          # cls-int1
    assert _ask(r, "ASK { ex:y a ex:A }")             # cls-int2
    assert _ask(r, "ASK { ex:y a ex:B }")
    assert _ask(r, "ASK { ex:Both rdfs:subClassOf ex:A }")   # scm-int
    assert _ask(r, "ASK { ex:z a ex:Either }")        # cls-uni
    assert _ask(r, "ASK { ex:C rdfs:subClassOf ex:Either }") # scm-uni
    assert _ask(r, "ASK { ex:e1 a ex:Enum }")         # cls-oo
    assert not _ask(r, "ASK { ex:x a ex:Either }")


def test_svf_thing_and_qualified_cardinality(spark):
    """cls-svf2 (someValuesFrom owl:Thing) and cls-maxqc3 (qualified
    max-1 merges only values OF THE QUALIFYING CLASS)."""
    r = _repo(spark, "owl2_qc", TTL_PFX + """
        ex:HasAnyFriend owl:someValuesFrom owl:Thing ;
                        owl:onProperty ex:friend .
        ex:OneDogOwner owl:maxQualifiedCardinality 1 ;
                       owl:onProperty ex:pet ; owl:onClass ex:Dog .
        ex:s ex:friend ex:t .
        ex:o a ex:OneDogOwner ; ex:pet ex:d1 , ex:d2 , ex:c1 .
        ex:d1 a ex:Dog . ex:d2 a ex:Dog .
    """, ruleset="owl2-rl")
    assert _ask(r, "ASK { ex:s a ex:HasAnyFriend }")   # cls-svf2
    assert _ask(r, "ASK { ex:d1 owl:sameAs ex:d2 }")   # cls-maxqc3
    # the unqualified pet (not a Dog) must NOT merge
    assert not _ask(r, "ASK { ex:d1 owl:sameAs ex:c1 }")


def test_maxqc4_thing_merges_all_values(spark):
    r = _repo(spark, "owl2_qc4", TTL_PFX + """
        ex:OnePet owl:maxQualifiedCardinality 1 ;
                  owl:onProperty ex:pet ; owl:onClass owl:Thing .
        ex:o a ex:OnePet ; ex:pet ex:v1 , ex:v2 .
    """, ruleset="owl2-rl")
    assert _ask(r, "ASK { ex:v1 owl:sameAs ex:v2 }")


def test_schema_schema_rules(spark):
    """scm-dom1/dom2, scm-rng1, scm-eqc2, scm-eqp2, scm-hv, scm-svf1 —
    schema×schema closure, checked through instance consequences too."""
    r = _repo(spark, "owl2_scm", TTL_PFX + """
        ex:p rdfs:domain ex:A . ex:A rdfs:subClassOf ex:SuperA .
        ex:sub rdfs:subPropertyOf ex:p .
        ex:q rdfs:range ex:B . ex:B rdfs:subClassOf ex:SuperB .
        ex:C1 rdfs:subClassOf ex:C2 . ex:C2 rdfs:subClassOf ex:C1 .
        ex:r1 rdfs:subPropertyOf ex:r2 . ex:r2 rdfs:subPropertyOf ex:r1 .
        ex:HV1 owl:hasValue ex:v ; owl:onProperty ex:hp1 .
        ex:HV2 owl:hasValue ex:v ; owl:onProperty ex:hp2 .
        ex:hp1 rdfs:subPropertyOf ex:hp2 .
        ex:SV1 owl:someValuesFrom ex:Y1 ; owl:onProperty ex:sp .
        ex:SV2 owl:someValuesFrom ex:Y2 ; owl:onProperty ex:sp .
        ex:Y1 rdfs:subClassOf ex:Y2 .
        ex:i ex:sub ex:j .
        ex:k ex:q ex:m .
    """, ruleset="owl2-rl")
    assert _ask(r, "ASK { ex:p rdfs:domain ex:SuperA }")     # scm-dom1
    assert _ask(r, "ASK { ex:sub rdfs:domain ex:A }")        # scm-dom2
    assert _ask(r, "ASK { ex:i a ex:SuperA }")               # via both
    assert _ask(r, "ASK { ex:q rdfs:range ex:SuperB }")      # scm-rng1
    assert _ask(r, "ASK { ex:m a ex:SuperB }")
    assert _ask(r, "ASK { ex:C1 owl:equivalentClass ex:C2 }")  # scm-eqc2
    assert _ask(r, "ASK { ex:r1 owl:equivalentProperty ex:r2 }")  # scm-eqp2
    assert _ask(r, "ASK { ex:HV1 rdfs:subClassOf ex:HV2 }")  # scm-hv
    assert _ask(r, "ASK { ex:SV1 rdfs:subClassOf ex:SV2 }")  # scm-svf1


def test_sameas_replacement_object_and_predicate_position(spark):
    """eq-rep-o / eq-rep-p: RDFS-Plus only replaces subjects; RL
    replaces all three positions."""
    r = _repo(spark, "owl2_eqrep", TTL_PFX + """
        ex:a owl:sameAs ex:b .
        ex:p owl:sameAs ex:q .
        ex:s ex:knows ex:a .
        ex:s ex:p ex:t .
    """, ruleset="owl2-rl")
    assert _ask(r, "ASK { ex:s ex:knows ex:b }")   # eq-rep-o
    assert _ask(r, "ASK { ex:s ex:q ex:t }")       # eq-rep-p


def _report(spark, name, ttl):
    r = _repo(spark, name, ttl, ruleset="owl2-rl")
    rows = r.check_consistency().collect()
    return {(w["rule"], w["focus"], w["detail"]) for w in rows}


def test_consistency_report_disjointness(spark):
    """cax-dw, cax-adc, cls-com as report rows; a consistent store
    yields an empty report."""
    X = "http://x#"
    got = _report(spark, "owl2_dw", TTL_PFX + """
        ex:Cat owl:disjointWith ex:Dog .
        ex:fluffy a ex:Cat , ex:Dog .
        _:adc a owl:AllDisjointClasses ; owl:members ( ex:A ex:B ex:C ) .
        ex:x a ex:A , ex:C .
        ex:Odd owl:complementOf ex:Even .
        ex:two a ex:Odd , ex:Even .
    """)
    assert ("cax-dw", X + "fluffy", X + "Cat") in got
    assert ("cax-adc", X + "x", X + "A") in got
    assert ("cls-com", X + "two", X + "Odd") in got
    clean = _report(spark, "owl2_clean", TTL_PFX + """
        ex:Cat owl:disjointWith ex:Dog .
        ex:fluffy a ex:Cat . ex:rex a ex:Dog .
    """)
    assert clean == set()


def test_consistency_report_property_rules(spark):
    """prp-irp, prp-asyp, prp-pdw, prp-adp, prp-npa1, prp-npa2."""
    X = "http://x#"
    got = _report(spark, "owl2_prp", TTL_PFX + """
        ex:properPart a owl:IrreflexiveProperty .
        ex:w ex:properPart ex:w .
        ex:bigger a owl:AsymmetricProperty .
        ex:m ex:bigger ex:n . ex:n ex:bigger ex:m .
        ex:likes owl:propertyDisjointWith ex:hates .
        ex:s ex:likes ex:t . ex:s ex:hates ex:t .
        _:adp a owl:AllDisjointProperties ; owl:members ( ex:f ex:g ) .
        ex:u ex:f ex:v . ex:u ex:g ex:v .
        _:npa owl:sourceIndividual ex:i ; owl:assertionProperty ex:knows ;
              owl:targetIndividual ex:j .
        ex:i ex:knows ex:j .
        _:npv owl:sourceIndividual ex:i ; owl:assertionProperty ex:age ;
              owl:targetValue 41 .
        ex:i ex:age 41 .
    """)
    rules = {w[0] for w in got}
    assert {"prp-irp", "prp-asyp", "prp-pdw", "prp-adp",
            "prp-npa1", "prp-npa2"} <= rules
    assert ("prp-irp", X + "w", X + "properPart") in got


def test_consistency_report_equality_and_cardinality(spark):
    """eq-diff1, eq-diff2 (AllDifferent), cls-nothing2, cls-maxc1,
    cls-maxqc1 — note sameAs here comes from INFERENCE (functional
    property), proving the report reads the materialized view."""
    X = "http://x#"
    got = _report(spark, "owl2_eqcard", TTL_PFX + """
        ex:ssn a owl:FunctionalProperty .
        ex:p ex:ssn ex:id1 , ex:id2 .
        ex:id1 owl:differentFrom ex:id2 .
        _:ad a owl:AllDifferent ; owl:distinctMembers ( ex:id1 ex:id2 ) .
        ex:ghost a owl:Nothing .
        ex:NoPets owl:maxCardinality 0 ; owl:onProperty ex:pet .
        ex:q a ex:NoPets ; ex:pet ex:cat .
        ex:NoDogs owl:maxQualifiedCardinality 0 ;
                  owl:onProperty ex:pet ; owl:onClass ex:Dog .
        ex:z a ex:NoDogs ; ex:pet ex:rover . ex:rover a ex:Dog .
    """)
    rules = {w[0] for w in got}
    assert {"eq-diff1", "eq-diff2", "cls-nothing2",
            "cls-maxc1", "cls-maxqc1"} <= rules
    assert ("cls-nothing2", X + "ghost",
            "http://www.w3.org/2002/07/owl#Nothing") in got


def test_anonymous_class_expressions(spark):
    """cls-int1/2, cls-uni with the CANONICAL anonymous class form
    (ADVICE r7): `[ owl:intersectionOf (...) ]` heads are blank nodes —
    the generated per-axiom rules must match them in object position
    (kind-correct, via the skolemized rule space) and the inferred
    rdf:type rows must come back with blank-node kind."""
    r = _repo(spark, "owl2_anon", TTL_PFX + """
        ex:Both owl:equivalentClass [ owl:intersectionOf ( ex:A ex:B ) ] .
        ex:Either owl:equivalentClass [ owl:unionOf ( ex:C ex:D ) ] .
        ex:x a ex:A , ex:B .
        ex:y a ex:Both .
        ex:z a ex:C .
    """, ruleset="owl2-rl")
    # cls-int1 types ex:x as the ANONYMOUS class; cax-eqc carries it to
    # the named equivalent. Before the fix both silently failed.
    assert _ask(r, "ASK { ex:x a ex:Both }")
    assert _ask(r, "ASK { ex:y a ex:A }")      # eqc → cls-int2
    assert _ask(r, "ASK { ex:y a ex:B }")
    assert _ask(r, "ASK { ex:z a ex:Either }")  # cls-uni → eqc
    assert not _ask(r, "ASK { ex:x a ex:Either }")
    # inferred bnode-typed rows carry KIND_BLANK, not a leaked skolem IRI
    got = r.sparql_collect(PFX + """
        SELECT ?c WHERE { ex:x a ?c . FILTER(isBlank(?c)) }
    """)
    assert len(got) == 1
    assert not got[0]["c"]["lex"].startswith("urn:x-skolem:")


def test_anonymous_all_disjoint_members(spark):
    """cax-adc with blank-node MEMBERS: anonymous class expressions in
    the members list must survive the VALUES injection kind-correctly."""
    X = "http://x#"
    got = _report(spark, "owl2_anon_adc", TTL_PFX + """
        _:adc a owl:AllDisjointClasses ; owl:members ( ex:A ex:B ) .
        ex:w a ex:A , ex:B .
    """)
    assert ("cax-adc", X + "w", X + "A") in got
