"""OWL-Horst (pD*) ruleset: RDFS-Plus plus the owl:Restriction rules.

GraphDB's ``owl-horst(-optimized)`` ruleset implements ter Horst's pD*
entailment (H. J. ter Horst, "Completeness, decidability and complexity of
entailment for RDF Schema and a semantic extension involving the OWL
vocabulary", J. Web Semantics 3(2-3), 2005 — public). The engine's
RDFS-Plus batch (rdfsplus.py) already covers the property-semantics rules
(inverseOf, Transitive/SymmetricProperty, sameAs, equivalence,
(Inverse)FunctionalProperty); what pD* adds on top is the restriction
vocabulary:

  rdfp14a  ?c owl:hasValue ?v; owl:onProperty ?p.  ?x ?p ?v   ⇒ ?x a ?c
  rdfp14b  ?c owl:hasValue ?v; owl:onProperty ?p.  ?x a ?c    ⇒ ?x ?p ?v
  rdfp15   ?c owl:someValuesFrom ?d; owl:onProperty ?p.
           ?x ?p ?y. ?y a ?d                                  ⇒ ?x a ?c
  rdfp16   ?c owl:allValuesFrom ?d; owl:onProperty ?p.
           ?x a ?c. ?x ?p ?y                                  ⇒ ?y a ?d

These four are expressed as CONSTRUCT rules and evaluated by the same
compiled-BGP machinery as custom rulesets, unioned into the built-in
batch's candidate set each fixpoint round — one shared driver loop, one
shared dedup/checkpoint lifecycle. Restriction schemas are tiny (they
broadcast); the instance-side patterns are ordinary pruned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dublin_smart_city_graphdb_spark.inference.rdfsplus import (
    _fixpoint,
    _round,
    _SPO_COLS,
)

_PROLOG = (
    "PREFIX owl: <http://www.w3.org/2002/07/owl#> "
    "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
)

RESTRICTION_RULES = [
    # rdfp14a (hasValue, property → type)
    _PROLOG + "CONSTRUCT { ?x rdf:type ?c } WHERE "
    "{ ?c owl:hasValue ?v . ?c owl:onProperty ?p . ?x ?p ?v }",
    # rdfp14b (hasValue, type → property)
    _PROLOG + "CONSTRUCT { ?x ?p ?v } WHERE "
    "{ ?c owl:hasValue ?v . ?c owl:onProperty ?p . ?x rdf:type ?c }",
    # rdfp15 (someValuesFrom)
    _PROLOG + "CONSTRUCT { ?x rdf:type ?c } WHERE "
    "{ ?c owl:someValuesFrom ?d . ?c owl:onProperty ?p . "
    "?x ?p ?y . ?y rdf:type ?d }",
    # rdfp16 (allValuesFrom)
    _PROLOG + "CONSTRUCT { ?y rdf:type ?d } WHERE "
    "{ ?c owl:allValuesFrom ?d . ?c owl:onProperty ?p . "
    "?x rdf:type ?c . ?x ?p ?y }",
]


def materialize(
    spark: SparkSession, explicit: DataFrame, max_rounds: int = 20
) -> DataFrame:
    """Run RDFS-Plus ∪ restriction rules to fixpoint; returns ONLY the
    inferred quads, tagged ``g = urn:inferred`` (same contract as
    rdfsplus.materialize).

    Evaluation strategy (r11): the Δ-restrictable round function the
    incremental paths already use — round 0 runs full, every later round
    whose fresh set stays off the owl:/rdfs: vocabulary evaluates the
    restriction rules through |Δ|-sized GRAPH-marker variants and the
    built-in batch through its seeded path, instead of re-running every
    rule over the whole accumulated set each round. The closure is
    identical (each round's candidates are a superset of the
    delta-derived conclusions and a subset of the derivable ones); only
    the per-round cost changes — the old full re-evaluation was
    O(|store| × rules) per round for work whose new conclusions are
    Δ-sized."""
    from dublin_smart_city_graphdb_spark.inference.delta import (
        touches_schema_extended,
    )

    spo = explicit.select(*_SPO_COLS)
    return _fixpoint(
        spo, None, max_rounds,
        round_fn=_incremental_round_fn(spark),
        touches_schema=touches_schema_extended,
    )


def materialize_incremental(
    spark: SparkSession, base: DataFrame, new_explicit: DataFrame,
    max_rounds: int = 20,
) -> DataFrame:
    """Inferred quads NEWLY entailed by adding ``new_explicit`` to
    ``base`` (base = explicit ∪ already-materialized inferred) under
    owl-horst. pD* rules are monotone, so the fixpoint runs Δ-seeded:
    the RDFS-Plus batch through its built-in seeding, the restriction
    CONSTRUCT rules through GRAPH-marker semi-naive variants
    (inference/delta.py) whose Δ-scans are |Δ|-sized. A Δ (or a later
    round's fresh set) that touches the owl:/rdfs: schema vocabulary
    falls back to a full-evaluation round — same contract as
    rdfsplus.materialize_incremental."""
    from dublin_smart_city_graphdb_spark.inference.delta import (
        touches_schema_extended,
    )

    base_spo = base.select(*_SPO_COLS)
    delta_spo = (
        new_explicit.select(*_SPO_COLS).distinct().localCheckpoint(eager=True)
    )
    return _fixpoint(
        base_spo.unionByName(delta_spo), delta_spo, max_rounds,
        round_fn=_incremental_round_fn(spark),
        touches_schema=touches_schema_extended,
    )


def _incremental_round_fn(spark: SparkSession):
    """Δ-restrictable round function for owl-horst: RDFS-Plus batch plus
    the pD* restriction CONSTRUCT rules through their GRAPH-marker
    variants — shared by insert and delete maintenance."""
    from dublin_smart_city_graphdb_spark.inference.delta import (
        delta_variants,
        make_round_fn,
    )
    from dublin_smart_city_graphdb_spark.sparql.parser import parse_query

    parsed = [parse_query(r) for r in RESTRICTION_RULES]
    variants = [delta_variants(p) for p in parsed]
    return make_round_fn(spark, parsed, variants)


def retract_incremental(
    spark: SparkSession, explicit_new: DataFrame, inferred_old: DataFrame,
    deleted: DataFrame, max_rounds: int = 20,
) -> DataFrame | None:
    """DRed maintenance of the owl-horst closure after removing
    ``deleted`` from the explicit store (inference/dred.py): Δ-seeded
    overdeletion, one rederive round, Δ-seeded propagation. Returns the
    maintained inferred quads, or None when the delta touches rule
    schema (the caller re-materializes fully)."""
    from dublin_smart_city_graphdb_spark.inference.delta import (
        touches_schema_extended,
    )
    from dublin_smart_city_graphdb_spark.inference.dred import retract

    return retract(
        explicit_new.select(*_SPO_COLS),
        inferred_old.select(*_SPO_COLS),
        deleted.select(*_SPO_COLS),
        _incremental_round_fn(spark),
        touches_schema_extended, max_rounds,
    )
