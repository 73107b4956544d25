"""Custom rulesets: SPARQL CONSTRUCT rules run to fixpoint at load time.

The GraphDB custom-.pie-ruleset analog (``create_repository(...,
ruleset="custom", rules=[...])``): rule premises are a CONSTRUCT WHERE
body, consequences its template, evaluated by the same fixpoint
scaffolding as the built-in RDFS-Plus batch (inference/custom.py).
"""

from __future__ import annotations

import pytest

P = "PREFIX ex: <http://x#>\n"


def _repo(spark, name, rules, ttl):
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    if name in eng.list_repositories():
        eng.drop_repository(name)
    r = eng.create_repository(name, ruleset="custom", rules=rules)
    r.load_turtle(ttl)
    return r


def test_single_rule_derives_uncle(spark):
    r = _repo(
        spark,
        "rules_uncle",
        [P + "CONSTRUCT { ?n ex:uncle ?u } WHERE "
             "{ ?n ex:parent ?p . ?p ex:brother ?u }"],
        P.replace("PREFIX ex: <http://x#>", "@prefix ex: <http://x#> .")
        + """
        ex:nina ex:parent ex:paula .
        ex:paula ex:brother ex:ugo .
        """,
    )
    rows = r.sparql_collect(P + "SELECT ?u WHERE { ex:nina ex:uncle ?u }")
    assert [x["u"].lex for x in rows] == ["http://x#ugo"]


def test_recursive_rule_reaches_fixpoint(spark):
    """A transitivity rule written as a custom CONSTRUCT needs one round
    per doubling — a 5-node chain closes completely (10 pairs), proving
    multi-round fixpoint + dedup against already-derived statements."""
    ttl = "@prefix ex: <http://x#> .\n" + "\n".join(
        f"ex:n{i} ex:next ex:n{i+1} ." for i in range(4)
    )
    r = _repo(
        spark,
        "rules_trans",
        [P + "CONSTRUCT { ?a ex:reach ?b } WHERE { ?a ex:next ?b }",
         P + "CONSTRUCT { ?a ex:reach ?c } WHERE "
             "{ ?a ex:reach ?b . ?b ex:reach ?c }"],
        ttl,
    )
    rows = r.sparql_collect(
        P + "SELECT (COUNT(*) AS ?n) WHERE { ?a ex:reach ?b }"
    )
    assert rows[0]["n"].lex == "10"  # C(5,2) ordered pairs along the chain


def test_inferred_statements_live_in_inferred_graph(spark):
    """Custom-rule conclusions land under urn:inferred like every other
    ruleset, so explicit-only access (infer=false) still works."""
    r = _repo(
        spark,
        "rules_graph",
        [P + "CONSTRUCT { ?s ex:labelled true } WHERE { ?s ex:name ?n }"],
        '@prefix ex: <http://x#> . ex:a ex:name "A" .',
    )
    with_inf = r.sparql_collect(P + "SELECT ?s WHERE { ?s ex:labelled true }")
    assert [x["s"].lex for x in with_inf] == ["http://x#a"]
    explicit = r.sparql_collect(
        P + "SELECT ?s WHERE { ?s ex:labelled true }", include_inferred=False
    )
    assert explicit == []


def test_append_rematerializes(spark):
    """A later load re-runs the custom fixpoint over the grown statement
    set (full re-materialization — custom bodies have no Δ-seeded path)."""
    r = _repo(
        spark,
        "rules_append",
        [P + "CONSTRUCT { ?n ex:uncle ?u } WHERE "
             "{ ?n ex:parent ?p . ?p ex:brother ?u }"],
        "@prefix ex: <http://x#> . ex:nina ex:parent ex:paula .",
    )
    assert r.sparql_collect(P + "SELECT ?u WHERE { ?n ex:uncle ?u }") == []
    r.load_turtle("@prefix ex: <http://x#> . ex:paula ex:brother ex:ugo .")
    rows = r.sparql_collect(P + "SELECT ?u WHERE { ?n ex:uncle ?u }")
    assert [x["u"].lex for x in rows] == ["http://x#ugo"]


def test_rule_body_can_use_filters(spark):
    r = _repo(
        spark,
        "rules_filter",
        [P + "CONSTRUCT { ?s ex:adult true } WHERE "
             "{ ?s ex:age ?a . FILTER(?a >= 18) }"],
        "@prefix ex: <http://x#> . ex:a ex:age 20 . ex:b ex:age 12 .",
    )
    rows = r.sparql_collect(P + "SELECT ?s WHERE { ?s ex:adult true }")
    assert [x["s"].lex for x in rows] == ["http://x#a"]


def test_non_construct_rule_rejected(spark):
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    if "rules_bad" in eng.list_repositories():
        eng.drop_repository("rules_bad")
    r = eng.create_repository(
        "rules_bad", ruleset="custom",
        rules=[P + "SELECT ?s WHERE { ?s ?p ?o }"],
    )
    with pytest.raises(ValueError, match="CONSTRUCT"):
        r.load_turtle("@prefix ex: <http://x#> . ex:a ex:b ex:c .")


def test_custom_requires_rules(spark):
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    with pytest.raises(ValueError, match="rules"):
        eng.create_repository("rules_none2", ruleset="custom")
