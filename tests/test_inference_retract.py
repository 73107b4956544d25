"""DRed (delete-and-rederive) closure maintenance (inference/dred.py):
SPARQL-Update / transaction deletes run Δ-seeded overdeletion + one
rederive round instead of the full fixpoint the old path re-ran per
update. Equivalence contract: after any update batch the repository's
quad set is bit-identical to a fresh repository loaded with the final
explicit content and fully materialized. A spy pins WHICH path ran —
the scale claim is that instance deletes never re-materialize."""

from __future__ import annotations

import pytest

from dublin_smart_city_graphdb_spark.engine import Engine

PFX = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://ret#> .
"""
QPFX = (
    "PREFIX ex: <http://ret#> "
    "PREFIX owl: <http://www.w3.org/2002/07/owl#> "
    "PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> "
)


def _quads(repo):
    return {
        tuple(r)
        for r in repo.quads.select(
            "g", "s", "p", "o_kind", "o_lex", "o_dtype", "o_lang"
        ).distinct().collect()
    }


def _no_full_rebuild(monkeypatch, repo):
    """Fail the test if the repository falls back to full
    re-materialization — the incremental path must carry the update."""
    def boom():  # pragma: no cover - failure path
        raise AssertionError("full re-materialization ran")

    monkeypatch.setattr(repo, "materialize_inference", boom)


def _equiv(spark, eng, repo, name):
    """Fresh repo loaded with repo's final EXPLICIT content, fully
    materialized — the DRed result must match it bit-for-bit."""
    from dublin_smart_city_graphdb_spark.model.schema import INFERRED_GRAPH

    fresh = eng.create_repository(name, ruleset=repo.config["ruleset"])
    q = repo.quads
    fresh.add_quads(
        q.filter((q.g.isNull()) | (q.g != INFERRED_GRAPH))
    )
    fresh.materialize_inference()
    assert _quads(repo) == _quads(fresh)


# -- rdfsplus ---------------------------------------------------------------

RDFS_ONT = PFX + """
ex:Sub1 rdfs:subClassOf ex:Super .
ex:Sub2 rdfs:subClassOf ex:Super .
ex:next a owl:TransitiveProperty .
"""


def test_leaf_delete_no_overdeletion(spark, monkeypatch):
    eng = Engine(spark)
    repo = eng.create_repository("ret_leaf", ruleset="rdfsplus")
    repo.load_turtle(RDFS_ONT + "ex:i a ex:Sub1 . ex:i ex:note ex:j .\n")
    _no_full_rebuild(monkeypatch, repo)
    repo.update(QPFX + "DELETE DATA { ex:i ex:note ex:j }")
    assert not repo.sparql_collect(QPFX + "ASK { ex:i ex:note ex:j }")[0][
        "ask"
    ]
    assert repo.sparql_collect(QPFX + "ASK { ex:i a ex:Super }")[0]["ask"]
    _equiv(spark, eng, repo, "ret_leaf_eq")


def test_dependent_inference_retracted(spark, monkeypatch):
    eng = Engine(spark)
    repo = eng.create_repository("ret_dep", ruleset="rdfsplus")
    repo.load_turtle(RDFS_ONT + "ex:i a ex:Sub1 .\n")
    assert repo.sparql_collect(QPFX + "ASK { ex:i a ex:Super }")[0]["ask"]
    _no_full_rebuild(monkeypatch, repo)
    repo.update(QPFX + "DELETE DATA { ex:i a ex:Sub1 }")
    assert not repo.sparql_collect(QPFX + "ASK { ex:i a ex:Super }")[0][
        "ask"
    ]
    _equiv(spark, eng, repo, "ret_dep_eq")


def test_alternative_derivation_survives(spark, monkeypatch):
    """i is Super via BOTH Sub1 and Sub2 — deleting one support must
    keep the inference (the rederive round finds the other)."""
    eng = Engine(spark)
    repo = eng.create_repository("ret_alt", ruleset="rdfsplus")
    repo.load_turtle(RDFS_ONT + "ex:i a ex:Sub1 . ex:i a ex:Sub2 .\n")
    _no_full_rebuild(monkeypatch, repo)
    repo.update(QPFX + "DELETE DATA { ex:i a ex:Sub1 }")
    assert repo.sparql_collect(QPFX + "ASK { ex:i a ex:Super }")[0]["ask"]
    _equiv(spark, eng, repo, "ret_alt_eq")


def test_deleted_explicit_still_entailed_moves_to_inferred(
    spark, monkeypatch
):
    """`i a Super` asserted AND derivable: deleting the assertion keeps
    the triple — as an INFERRED one, exactly like a full rebuild."""
    eng = Engine(spark)
    repo = eng.create_repository("ret_reinfer", ruleset="rdfsplus")
    repo.load_turtle(RDFS_ONT + "ex:i a ex:Sub1 . ex:i a ex:Super .\n")
    _no_full_rebuild(monkeypatch, repo)
    repo.update(QPFX + "DELETE DATA { ex:i a ex:Super }")
    assert repo.sparql_collect(QPFX + "ASK { ex:i a ex:Super }")[0]["ask"]
    assert not repo.sparql(
        QPFX + "ASK { ex:i a ex:Super }", include_inferred=False
    ).collect()[0]["ask"]
    _equiv(spark, eng, repo, "ret_reinfer_eq")


def test_transitive_chain_retraction(spark, monkeypatch):
    eng = Engine(spark)
    repo = eng.create_repository("ret_chain", ruleset="rdfsplus")
    repo.load_turtle(
        RDFS_ONT
        + "ex:a ex:next ex:b . ex:b ex:next ex:c . ex:c ex:next ex:d .\n"
    )
    assert repo.sparql_collect(QPFX + "ASK { ex:a ex:next ex:d }")[0]["ask"]
    _no_full_rebuild(monkeypatch, repo)
    repo.update(QPFX + "DELETE DATA { ex:b ex:next ex:c }")
    get = lambda q: repo.sparql_collect(QPFX + q)[0]["ask"]  # noqa: E731
    assert not get("ASK { ex:a ex:next ex:c }")
    assert not get("ASK { ex:a ex:next ex:d }")
    assert not get("ASK { ex:b ex:next ex:d }")
    assert get("ASK { ex:c ex:next ex:d }")
    _equiv(spark, eng, repo, "ret_chain_eq")


def test_schema_delete_falls_back_to_full(spark):
    eng = Engine(spark)
    repo = eng.create_repository("ret_schema", ruleset="rdfsplus")
    repo.load_turtle(RDFS_ONT + "ex:i a ex:Sub1 .\n")
    repo.update(
        QPFX + "DELETE DATA { ex:Sub1 rdfs:subClassOf ex:Super }"
    )
    assert not repo.sparql_collect(QPFX + "ASK { ex:i a ex:Super }")[0][
        "ask"
    ]
    _equiv(spark, eng, repo, "ret_schema_eq")


def test_modify_delete_insert_composes(spark, monkeypatch):
    """DELETE/INSERT WHERE: the retract and insert maintenance paths
    compose — moved instance re-derives under its new class only."""
    eng = Engine(spark)
    repo = eng.create_repository("ret_modify", ruleset="rdfsplus")
    repo.load_turtle(RDFS_ONT + "ex:i a ex:Sub1 .\n")
    _no_full_rebuild(monkeypatch, repo)
    repo.update(
        QPFX + "DELETE { ?x a ex:Sub1 } INSERT { ?x a ex:Sub2 } "
        "WHERE { ?x a ex:Sub1 }"
    )
    assert repo.sparql_collect(QPFX + "ASK { ex:i a ex:Sub2 }")[0]["ask"]
    assert repo.sparql_collect(QPFX + "ASK { ex:i a ex:Super }")[0]["ask"]
    assert not repo.sparql_collect(QPFX + "ASK { ex:i a ex:Sub1 }")[0][
        "ask"
    ]
    _equiv(spark, eng, repo, "ret_modify_eq")


def test_insert_via_update_is_incremental(spark, monkeypatch):
    eng = Engine(spark)
    repo = eng.create_repository("ret_insert", ruleset="rdfsplus")
    repo.load_turtle(RDFS_ONT + "ex:i a ex:Sub1 .\n")
    _no_full_rebuild(monkeypatch, repo)
    repo.update(QPFX + "INSERT DATA { ex:j a ex:Sub2 }")
    assert repo.sparql_collect(QPFX + "ASK { ex:j a ex:Super }")[0]["ask"]
    _equiv(spark, eng, repo, "ret_insert_eq")


def test_noop_update_keeps_closure(spark, monkeypatch):
    eng = Engine(spark)
    repo = eng.create_repository("ret_noop", ruleset="rdfsplus")
    repo.load_turtle(RDFS_ONT + "ex:i a ex:Sub1 .\n")
    before = _quads(repo)
    _no_full_rebuild(monkeypatch, repo)
    repo.update(QPFX + "DELETE WHERE { ex:nosuch a ?c }")
    assert _quads(repo) == before


def test_transaction_delete_turtle(spark, monkeypatch):
    eng = Engine(spark)
    repo = eng.create_repository("ret_txn", ruleset="rdfsplus")
    repo.load_turtle(RDFS_ONT + "ex:i a ex:Sub1 . ex:k a ex:Sub2 .\n")
    _no_full_rebuild(monkeypatch, repo)
    txn = repo.begin()
    txn.delete_turtle(PFX + "ex:i a ex:Sub1 .\n")
    txn.commit()
    assert not repo.sparql_collect(QPFX + "ASK { ex:i a ex:Super }")[0][
        "ask"
    ]
    assert repo.sparql_collect(QPFX + "ASK { ex:k a ex:Super }")[0]["ask"]
    _equiv(spark, eng, repo, "ret_txn_eq")


# -- extended rulesets ------------------------------------------------------

HORST_ONT = PFX + """
ex:HasGoodFriend owl:someValuesFrom ex:Good ; owl:onProperty ex:friend .
"""


def test_horst_restriction_retract(spark, monkeypatch):
    eng = Engine(spark)
    repo = eng.create_repository("ret_horst", ruleset="owl-horst")
    repo.load_turtle(
        HORST_ONT
        + "ex:g a ex:Good . ex:x ex:friend ex:g . ex:z ex:friend ex:g .\n"
    )
    assert repo.sparql_collect(
        QPFX + "ASK { ex:x a ex:HasGoodFriend }"
    )[0]["ask"]
    _no_full_rebuild(monkeypatch, repo)
    repo.update(QPFX + "DELETE DATA { ex:g a ex:Good }")
    for who in ("ex:x", "ex:z"):
        assert not repo.sparql_collect(
            QPFX + f"ASK {{ {who} a ex:HasGoodFriend }}"
        )[0]["ask"]
    _equiv(spark, eng, repo, "ret_horst_eq")


def test_horst_alternative_support_survives(spark, monkeypatch):
    eng = Engine(spark)
    repo = eng.create_repository("ret_horst2", ruleset="owl-horst")
    repo.load_turtle(
        HORST_ONT
        + "ex:g a ex:Good . ex:h a ex:Good . "
        "ex:x ex:friend ex:g . ex:x ex:friend ex:h .\n"
    )
    _no_full_rebuild(monkeypatch, repo)
    repo.update(QPFX + "DELETE DATA { ex:x ex:friend ex:g }")
    assert repo.sparql_collect(
        QPFX + "ASK { ex:x a ex:HasGoodFriend }"
    )[0]["ask"]
    _equiv(spark, eng, repo, "ret_horst2_eq")


OWL2_ONT = PFX + """
ex:grand owl:propertyChainAxiom (ex:parent ex:parent) .
ex:Both owl:equivalentClass [ owl:intersectionOf (ex:A ex:B) ] .
"""


def test_owl2rl_chain_and_anonymous_class_retract(spark, monkeypatch):
    eng = Engine(spark)
    repo = eng.create_repository("ret_owl2", ruleset="owl2-rl")
    repo.load_turtle(
        OWL2_ONT
        + "ex:a ex:parent ex:b . ex:b ex:parent ex:c . "
        "ex:m a ex:A . ex:m a ex:B .\n"
    )
    assert repo.sparql_collect(QPFX + "ASK { ex:a ex:grand ex:c }")[0][
        "ask"
    ]
    assert repo.sparql_collect(QPFX + "ASK { ex:m a ex:Both }")[0]["ask"]
    _no_full_rebuild(monkeypatch, repo)
    repo.update(QPFX + "DELETE DATA { ex:b ex:parent ex:c }")
    assert not repo.sparql_collect(QPFX + "ASK { ex:a ex:grand ex:c }")[
        0
    ]["ask"]
    repo.update(QPFX + "DELETE DATA { ex:m a ex:B }")
    assert not repo.sparql_collect(QPFX + "ASK { ex:m a ex:Both }")[0][
        "ask"
    ]
    assert repo.sparql_collect(QPFX + "ASK { ex:m a ex:A }")[0]["ask"]
    _equiv(spark, eng, repo, "ret_owl2_eq")


def test_owl2rl_deep_overdeletion_cascade(spark, monkeypatch):
    """Chain inference stacked on intersection membership: deleting one
    leaf cascades through TWO derivation levels, exercising multi-round
    overdeletion."""
    eng = Engine(spark)
    repo = eng.create_repository("ret_owl2b", ruleset="owl2-rl")
    repo.load_turtle(
        PFX
        + """
ex:grand owl:propertyChainAxiom (ex:parent ex:parent) .
ex:gggrand owl:propertyChainAxiom (ex:grand ex:grand) .
ex:a ex:parent ex:b . ex:b ex:parent ex:c .
ex:c ex:parent ex:d . ex:d ex:parent ex:e .
"""
    )
    assert repo.sparql_collect(QPFX + "ASK { ex:a ex:gggrand ex:e }")[0][
        "ask"
    ]
    _no_full_rebuild(monkeypatch, repo)
    repo.update(QPFX + "DELETE DATA { ex:d ex:parent ex:e }")
    assert not repo.sparql_collect(
        QPFX + "ASK { ex:a ex:gggrand ex:e }"
    )[0]["ask"]
    assert repo.sparql_collect(QPFX + "ASK { ex:a ex:grand ex:c }")[0][
        "ask"
    ]
    _equiv(spark, eng, repo, "ret_owl2b_eq")


def test_retract_none_on_schema_delta_unit(spark):
    """Module-level contract: schema-touching deletes return None."""
    import pyspark.sql.functions as F

    from dublin_smart_city_graphdb_spark.inference.rdfsplus import (
        retract_incremental,
    )
    from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA

    empty = spark.createDataFrame([], QUAD_SCHEMA).drop("g")
    schema_del = empty.sparkSession.createDataFrame(
        [
            (
                "http://ret#Sub1",
                "http://www.w3.org/2000/01/rdf-schema#subClassOf",
                0, "http://ret#Super", None, None, None, None, None,
            )
        ],
        empty.schema,
    )
    assert (
        retract_incremental(empty, empty.limit(0), schema_del) is None
    )
    # instance delete over empty closure: returns an (empty) frame
    inst_del = schema_del.withColumn(
        "p", F.lit("http://ret#note")
    )
    out = retract_incremental(empty, empty.limit(0), inst_del)
    assert out is not None and out.count() == 0
