"""OWL 2 RL ruleset: the full W3C "OWL 2 Profiles" §4.3 entailment table.

GraphDB ships an ``owl2-rl(-optimized)`` ruleset (selected the same way
init-graphdb.sh selects rdfsplus-optimized); the rule set itself is the
public W3C RL rule table. Coverage map:

- eq-sym/eq-trans/eq-rep-s, prp-dom/rng/fp/ifp/symp/trp/spo1/eqp1+2/
  inv1+2, cax-sco (rdfs9), cax-eqc1+2 (eqc→mutual subClassOf), scm-sco,
  scm-spo, scm-eqc1 — already in the shared RDFS-Plus batch
  (rdfsplus._round).
- cls-svf1 (someValuesFrom), cls-avf, cls-hv1+2 — horst.RESTRICTION_RULES
  (pD* rdfp14a/b/15/16).
- Fixed-shape additions here (_FIXED_RULES, plain CONSTRUCT strings over
  the compiled-BGP machinery): eq-rep-o, eq-rep-p, cls-svf2, cls-maxc2
  (maxCardinality 1 → sameAs), cls-maxqc3+4 (qualified variants),
  scm-dom1+2, scm-rng1+2, scm-hv, scm-svf1+2, scm-avf1+2, scm-eqc2,
  scm-eqp1+2.
- List-driven rules (RDF lists are SCHEMA-static in RL — no rule emits
  rdf:first/rdf:rest — so the axiom tables are collected ONCE from the
  explicit store, driver-side, guarded by _LIST_TRIPLE_CAP, and expanded
  into per-axiom CONSTRUCT rules of exact length): prp-spo2 (property
  chains of ANY length), prp-key (keys of ANY length), cls-int1+2
  (intersectionOf), cls-uni, cls-oo, scm-int, scm-uni.
- Inconsistency-DETECTING rules (eq-diff1/2/3, prp-irp, prp-asyp,
  prp-pdw, prp-adp, prp-npa1+2, cls-com, cls-nothing2, cls-maxc1,
  cls-maxqc1+2, cax-dw, cax-adc) do not infer triples — they are
  surfaced as a VALIDATION REPORT (``consistency_report``, SHACL-style
  rows; empty ⇔ consistent), reachable as Repository.check_consistency.
- Deliberately omitted, matching GraphDB's "-optimized" profile: eq-ref
  (reflexive sameAs on every node), scm-cls/scm-op/scm-dp (reflexive
  subClassOf/subPropertyOf + Thing/Nothing bounds) — pure noise rows
  that triple store size without changing any query answer; and the
  dt-* datatype axioms (literal value semantics live in the typed
  shadow columns of the term model instead).

Cost contract unchanged from owl-horst: schema patterns are tiny
broadcast sides, instance patterns are predicate-pruned scans; the
per-axiom rules expand to exact-length join chains (a chain of n
properties = n-1 equi-joins on the hop node, fully distributed).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from dublin_smart_city_graphdb_spark.inference.horst import (
    RESTRICTION_RULES,
    _PROLOG,
)
from dublin_smart_city_graphdb_spark.inference.rdfsplus import (
    _fixpoint,
    _round,
    _SPO_COLS,
)
from dublin_smart_city_graphdb_spark.model.terms import OWL, RDF, RDFS

#: Driver-side guard for the one-time RDF-list walk: list vocabulary in
#: real ontologies is a few hundred triples; anything past this cap is
#: not a schema and must not be collected.
_LIST_TRIPLE_CAP = 100_000


class OwlRlError(ValueError):
    pass


# -- fixed-shape RL rules (beyond RDFS-Plus + pD* restrictions) -------------
#
# Each entry is (trigger vocabulary, CONSTRUCT text). A rule compiles
# into the fixpoint ONLY when at least one trigger IRI occurs in the
# EXPLICIT store (as a predicate, or as an rdf:type object) — triggers
# are chosen conservatively so that no other rule can introduce a
# trigger that was entirely absent: restriction/axiom vocabulary
# (onProperty, maxCardinality, hasKey, …) is never emitted by any RL
# rule, and owl:sameAs can only ENTER via the listed producer axioms.
# This keeps per-round compile cost proportional to the vocabulary the
# ontology actually uses (GraphDB's "-optimized" rulesets make the same
# trade).

_RDFS = "PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> "

#: vocabulary whose presence can (transitively) yield an owl:sameAs
_SAMEAS_PRODUCERS = frozenset({
    OWL + "sameAs", OWL + "hasKey", OWL + "maxCardinality",
    OWL + "maxQualifiedCardinality", OWL + "FunctionalProperty",
    OWL + "InverseFunctionalProperty",
})
_SUBCLASS_PRODUCERS = frozenset({
    RDFS + "subClassOf", OWL + "equivalentClass", OWL + "intersectionOf",
    OWL + "unionOf", OWL + "someValuesFrom", OWL + "allValuesFrom",
    OWL + "hasValue",
})

_FIXED_RULES: list[tuple[frozenset, str]] = [
    # eq-rep-o: sameAs replacement in object position (subject position
    # is in the RDFS-Plus batch; RL needs all three)
    (_SAMEAS_PRODUCERS,
     _PROLOG + "CONSTRUCT { ?s ?p ?y } WHERE { "
     "?s ?p ?x . ?x owl:sameAs ?y . FILTER(?x != ?y) }"),
    # eq-rep-p: sameAs replacement in predicate position
    (_SAMEAS_PRODUCERS,
     _PROLOG + "CONSTRUCT { ?s ?q ?o } WHERE { "
     "?s ?p ?o . ?p owl:sameAs ?q . FILTER(?p != ?q) }"),
    # cls-svf2: someValuesFrom owl:Thing
    (frozenset({OWL + "someValuesFrom"}),
     _PROLOG + "CONSTRUCT { ?x rdf:type ?c } WHERE { "
     "?c owl:someValuesFrom owl:Thing . ?c owl:onProperty ?p . ?x ?p ?y }"),
    # cls-maxc2: maxCardinality-1 restriction merges the values
    (frozenset({OWL + "maxCardinality"}),
     _PROLOG + "CONSTRUCT { ?y1 owl:sameAs ?y2 } WHERE { "
     "?c owl:maxCardinality ?n . ?c owl:onProperty ?p . "
     "?x rdf:type ?c . ?x ?p ?y1 . ?x ?p ?y2 . "
     "FILTER(?n = 1 && ?y1 != ?y2) }"),
    # cls-maxqc3: maxQualifiedCardinality 1 qualified by onClass
    (frozenset({OWL + "maxQualifiedCardinality"}),
     _PROLOG + "CONSTRUCT { ?y1 owl:sameAs ?y2 } WHERE { "
     "?c owl:maxQualifiedCardinality ?n . ?c owl:onProperty ?p . "
     "?c owl:onClass ?d . ?x rdf:type ?c . "
     "?x ?p ?y1 . ?y1 rdf:type ?d . ?x ?p ?y2 . ?y2 rdf:type ?d . "
     "FILTER(?n = 1 && ?y1 != ?y2) }"),
    # cls-maxqc4: maxQualifiedCardinality 1 onClass owl:Thing
    (frozenset({OWL + "maxQualifiedCardinality"}),
     _PROLOG + "CONSTRUCT { ?y1 owl:sameAs ?y2 } WHERE { "
     "?c owl:maxQualifiedCardinality ?n . ?c owl:onProperty ?p . "
     "?c owl:onClass owl:Thing . ?x rdf:type ?c . "
     "?x ?p ?y1 . ?x ?p ?y2 . FILTER(?n = 1 && ?y1 != ?y2) }"),
    # scm-dom1 / scm-dom2
    (frozenset({RDFS + "domain"}),
     _PROLOG + _RDFS + "CONSTRUCT { ?p rdfs:domain ?d } WHERE { "
     "?p rdfs:domain ?c . ?c rdfs:subClassOf ?d . FILTER(?c != ?d) }"),
    (frozenset({RDFS + "domain"}),
     _PROLOG + _RDFS + "CONSTRUCT { ?p2 rdfs:domain ?c } WHERE { "
     "?p1 rdfs:domain ?c . ?p2 rdfs:subPropertyOf ?p1 . "
     "FILTER(?p1 != ?p2) }"),
    # scm-rng1 / scm-rng2
    (frozenset({RDFS + "range"}),
     _PROLOG + _RDFS + "CONSTRUCT { ?p rdfs:range ?d } WHERE { "
     "?p rdfs:range ?c . ?c rdfs:subClassOf ?d . FILTER(?c != ?d) }"),
    (frozenset({RDFS + "range"}),
     _PROLOG + _RDFS + "CONSTRUCT { ?p2 rdfs:range ?c } WHERE { "
     "?p1 rdfs:range ?c . ?p2 rdfs:subPropertyOf ?p1 . "
     "FILTER(?p1 != ?p2) }"),
    # scm-hv
    (frozenset({OWL + "hasValue"}),
     _PROLOG + _RDFS + "CONSTRUCT { ?c1 rdfs:subClassOf ?c2 } WHERE { "
     "?c1 owl:hasValue ?i . ?c1 owl:onProperty ?p1 . "
     "?c2 owl:hasValue ?i . ?c2 owl:onProperty ?p2 . "
     "?p1 rdfs:subPropertyOf ?p2 . FILTER(?c1 != ?c2) }"),
    # scm-svf1 / scm-svf2
    (frozenset({OWL + "someValuesFrom"}),
     _PROLOG + _RDFS + "CONSTRUCT { ?c1 rdfs:subClassOf ?c2 } WHERE { "
     "?c1 owl:someValuesFrom ?y1 . ?c1 owl:onProperty ?p . "
     "?c2 owl:someValuesFrom ?y2 . ?c2 owl:onProperty ?p . "
     "?y1 rdfs:subClassOf ?y2 . FILTER(?c1 != ?c2) }"),
    (frozenset({OWL + "someValuesFrom"}),
     _PROLOG + _RDFS + "CONSTRUCT { ?c1 rdfs:subClassOf ?c2 } WHERE { "
     "?c1 owl:someValuesFrom ?y . ?c1 owl:onProperty ?p1 . "
     "?c2 owl:someValuesFrom ?y . ?c2 owl:onProperty ?p2 . "
     "?p1 rdfs:subPropertyOf ?p2 . FILTER(?c1 != ?c2) }"),
    # scm-avf1 / scm-avf2 (note avf2's REVERSED conclusion per the table)
    (frozenset({OWL + "allValuesFrom"}),
     _PROLOG + _RDFS + "CONSTRUCT { ?c1 rdfs:subClassOf ?c2 } WHERE { "
     "?c1 owl:allValuesFrom ?y1 . ?c1 owl:onProperty ?p . "
     "?c2 owl:allValuesFrom ?y2 . ?c2 owl:onProperty ?p . "
     "?y1 rdfs:subClassOf ?y2 . FILTER(?c1 != ?c2) }"),
    (frozenset({OWL + "allValuesFrom"}),
     _PROLOG + _RDFS + "CONSTRUCT { ?c2 rdfs:subClassOf ?c1 } WHERE { "
     "?c1 owl:allValuesFrom ?y . ?c1 owl:onProperty ?p1 . "
     "?c2 owl:allValuesFrom ?y . ?c2 owl:onProperty ?p2 . "
     "?p1 rdfs:subPropertyOf ?p2 . FILTER(?c1 != ?c2) }"),
    # scm-eqc2: mutual subClassOf → equivalentClass
    (_SUBCLASS_PRODUCERS,
     _PROLOG + _RDFS + "CONSTRUCT { ?c1 owl:equivalentClass ?c2 } WHERE { "
     "?c1 rdfs:subClassOf ?c2 . ?c2 rdfs:subClassOf ?c1 . "
     "FILTER(?c1 != ?c2) }"),
    # scm-eqp1: equivalentProperty → mutual subPropertyOf
    (frozenset({OWL + "equivalentProperty", RDFS + "subPropertyOf"}),
     _PROLOG + _RDFS + "CONSTRUCT { ?p1 rdfs:subPropertyOf ?p2 . "
     "?p2 rdfs:subPropertyOf ?p1 } "
     "WHERE { ?p1 owl:equivalentProperty ?p2 }"),
    # scm-eqp2: mutual subPropertyOf → equivalentProperty
    (frozenset({OWL + "equivalentProperty", RDFS + "subPropertyOf"}),
     _PROLOG + _RDFS + "CONSTRUCT { ?p1 owl:equivalentProperty ?p2 } "
     "WHERE { ?p1 rdfs:subPropertyOf ?p2 . ?p2 rdfs:subPropertyOf ?p1 . "
     "FILTER(?p1 != ?p2) }"),
]

#: pD* restriction rules with their trigger vocabulary (horst runs them
#: unconditionally; under owl2-rl they gate like everything else)
_RESTRICTION_TRIGGERS = [
    frozenset({OWL + "hasValue"}),
    frozenset({OWL + "hasValue"}),
    frozenset({OWL + "someValuesFrom"}),
    frozenset({OWL + "allValuesFrom"}),
]

#: Backward-compatible name (round-6 slice); now the fixed-shape batch.
OWL2_EXTRA_RULES = [text for _, text in _FIXED_RULES]


def _present_vocab(spo: DataFrame) -> frozenset:
    """Distinct predicates ∪ rdf:type objects of the explicit store —
    two tiny distinct-aggregations, driver-collected once."""
    preds = {r["p"] for r in spo.select("p").distinct().collect()}
    types = {
        r["o_lex"]
        for r in spo.filter(F.col("p") == RDF + "type")
        .select("o_lex").distinct().collect()
    }
    return frozenset(preds | types)


# -- RDF-list axiom collection (driver-side, once per materialize) ----------

def _collect_lists(explicit: DataFrame) -> dict[str, list[str]]:
    """{list head → ordered members} for every RDF list in the store.

    RL rules never CREATE rdf:first/rdf:rest triples, so the list
    vocabulary is static for the whole fixpoint — one bounded driver
    collection, guarded by _LIST_TRIPLE_CAP."""
    lt = explicit.filter(
        F.col("p").isin(RDF + "first", RDF + "rest")
    ).select("s", "p", "o_kind", "o_lex").limit(_LIST_TRIPLE_CAP + 1)
    rows = lt.collect()
    if len(rows) > _LIST_TRIPLE_CAP:
        raise OwlRlError(
            f"owl2-rl: more than {_LIST_TRIPLE_CAP} rdf:first/rdf:rest "
            "triples — RDF lists at this scale are instance data, not "
            "OWL axioms; refusing the driver-side walk"
        )
    first: dict[str, tuple[int, str]] = {}
    rest: dict[str, str] = {}
    for r in rows:
        if r["p"] == RDF + "first":
            first[r["s"]] = (r["o_kind"], r["o_lex"])
        else:
            rest[r["s"]] = r["o_lex"]
    out: dict[str, list[str]] = {}
    for head in first:
        members, node, seen = [], head, set()
        while node and node != RDF + "nil" and node not in seen:
            seen.add(node)
            if node not in first:
                break
            members.append(first[node][1])
            node = rest.get(node)
        if node == RDF + "nil" and members:
            out[head] = members
    return out


def _axiom_pairs(explicit: DataFrame, pred: str) -> list[tuple[str, str]]:
    return [
        (r["s"], r["o_lex"])
        for r in explicit.filter(F.col("p") == pred)
        .select("s", "o_lex").distinct().collect()
    ]


def _iri(v: str) -> str:
    return f"<{v}>"


# -- blank-node skolemization for the rule pipeline --------------------------
#
# List-driven axiom heads and class expressions (intersectionOf/unionOf/
# oneOf members, AllDisjoint* members) are typically ANONYMOUS — stored as
# ``_:bN`` with KIND_BLANK. The generated rules inject them into SPARQL
# text via _iri(), where ``<_:bN>`` parses as an IRI constant: object-
# position matching then requires KIND_IRI and silently never fires, and
# emitted rows would carry the wrong kind. Fix: run the WHOLE rule
# pipeline in a skolemized space (every blank node mapped bijectively to
# ``urn:x-skolem:<label>``, KIND_IRI) and map the inferred output back.
# Sound because RL rules are kind-agnostic term-identity joins (no
# isIRI/isBLANK tests in the table) and the mapping is a bijection.

_SKOLEM = "urn:x-skolem:"
_KIND_IRI = 0
_KIND_BLANK = 1


def _sk(col):
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.startswith("_:"),
        F.concat(F.lit(_SKOLEM), F.substring(c, 3, 1 << 30)),
    ).otherwise(c)


def _unsk(col):
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.startswith(_SKOLEM),
        F.concat(F.lit("_:"), F.substring(c, len(_SKOLEM) + 1, 1 << 30)),
    ).otherwise(c)


def _skolemize_spo(spo: DataFrame, lead: tuple = ()) -> DataFrame:
    """``lead`` names pass-through columns (e.g. ``g``) ahead of SPO."""
    o_blank = F.col("o_kind") == _KIND_BLANK
    return spo.select(
        *[F.col(c) for c in lead],
        _sk("s").alias("s"),
        F.col("p"),
        F.when(o_blank, F.lit(_KIND_IRI).cast("byte"))
        .otherwise(F.col("o_kind")).alias("o_kind"),
        F.when(o_blank, _sk("o_lex")).otherwise(F.col("o_lex"))
        .alias("o_lex"),
        *[F.col(c) for c in _SPO_COLS[4:]],
    )


def _deskolemize_out(inferred: DataFrame) -> DataFrame:
    """Undo _skolemize_spo on the fixpoint output (g + SPO columns)."""
    o_sk = F.col("o_lex").startswith(_SKOLEM)
    return inferred.select(
        F.col("g"),
        _unsk("s").alias("s"),
        _unsk("p").alias("p"),
        F.when(o_sk, F.lit(_KIND_BLANK).cast("byte"))
        .otherwise(F.col("o_kind")).alias("o_kind"),
        F.when(o_sk, _unsk("o_lex")).otherwise(F.col("o_lex"))
        .alias("o_lex"),
        *[F.col(c) for c in _SPO_COLS[4:]],
    )


def _list_rules(explicit: DataFrame) -> tuple[list[str], list[tuple]]:
    """Expand list-based axioms into exact-length CONSTRUCT rules plus
    static schema conclusions (scm-int / scm-uni / cls-oo — constant
    triples independent of instance data).

    Returns (construct_texts, static_spo_rows)."""
    lists = _collect_lists(explicit)
    rules: list[str] = []
    static: list[tuple] = []

    def spo(s: str, p: str, o: str) -> tuple:
        return (s, p, 0, o, None, None, None, None, None)

    # prp-spo2: property chains of any length n (n-1 hop joins)
    for p, head in _axiom_pairs(explicit, OWL + "propertyChainAxiom"):
        chain = lists.get(head)
        if not chain:
            continue
        body, prev = [], "?x"
        for i, pi in enumerate(chain):
            nxt = f"?z{i + 1}" if i < len(chain) - 1 else "?zz"
            body.append(f"{prev} {_iri(pi)} {nxt} .")
            prev = nxt
        rules.append(
            _PROLOG + f"CONSTRUCT {{ ?x {_iri(p)} ?zz }} WHERE {{ "
            + " ".join(body) + " }"
        )
    # prp-key: keys of any length
    for c, head in _axiom_pairs(explicit, OWL + "hasKey"):
        key = lists.get(head)
        if not key:
            continue
        body = [f"?x rdf:type {_iri(c)} .", f"?y rdf:type {_iri(c)} ."]
        for i, pi in enumerate(key):
            body.append(f"?x {_iri(pi)} ?v{i} . ?y {_iri(pi)} ?v{i} .")
        rules.append(
            _PROLOG + "CONSTRUCT { ?x owl:sameAs ?y } WHERE { "
            + " ".join(body) + " FILTER(?x != ?y) }"
        )
    # intersectionOf: cls-int1 (all members → c), cls-int2 (c → each
    # member), scm-int (c subClassOf each member, static)
    for c, head in _axiom_pairs(explicit, OWL + "intersectionOf"):
        members = lists.get(head)
        if not members:
            continue
        body = " ".join(f"?x rdf:type {_iri(m)} ." for m in members)
        rules.append(
            _PROLOG + f"CONSTRUCT {{ ?x rdf:type {_iri(c)} }} "
            f"WHERE {{ {body} }}"
        )
        tmpl = " ".join(f"?x rdf:type {_iri(m)} ." for m in members)
        rules.append(
            _PROLOG + f"CONSTRUCT {{ {tmpl} }} "
            f"WHERE {{ ?x rdf:type {_iri(c)} }}"
        )
        static += [spo(c, RDFS + "subClassOf", m) for m in members]
    # unionOf: cls-uni (each member → c), scm-uni (member subClassOf c)
    for c, head in _axiom_pairs(explicit, OWL + "unionOf"):
        members = lists.get(head)
        if not members:
            continue
        for m in members:
            rules.append(
                _PROLOG + f"CONSTRUCT {{ ?x rdf:type {_iri(c)} }} "
                f"WHERE {{ ?x rdf:type {_iri(m)} }}"
            )
        static += [spo(m, RDFS + "subClassOf", c) for m in members]
    # cls-oo: oneOf members are instances of c (static)
    for c, head in _axiom_pairs(explicit, OWL + "oneOf"):
        members = lists.get(head)
        if not members:
            continue
        static += [spo(i, RDF + "type", c) for i in members]
    return rules, static


def materialize(
    spark: SparkSession, explicit: DataFrame, max_rounds: int = 20
) -> DataFrame:
    """RDFS-Plus ∪ pD* restrictions ∪ the full OWL 2 RL rule table to
    fixpoint; returns ONLY the inferred quads tagged ``g = urn:inferred``
    (the shared ruleset contract)."""
    spo = _skolemize_spo(explicit.select(*_SPO_COLS))
    # Evaluation strategy (r11): the Δ-restrictable round function the
    # incremental paths already use — round 0 full, schema-free later
    # rounds evaluate every CONSTRUCT rule through |Δ|-sized GRAPH-marker
    # variants and the built-in batch through its seeded path. Closure
    # identical (superset-of-Δ-derived / subset-of-derivable per round);
    # the old full per-round re-evaluation of the whole vocabulary-gated
    # rule table was the dominant materialization cost.
    from dublin_smart_city_graphdb_spark.inference.delta import (
        touches_schema_extended,
    )

    return _deskolemize_out(
        _fixpoint(
            spo, None, max_rounds,
            round_fn=_incremental_round_fn(spark, spo),
            touches_schema=touches_schema_extended,
        )
    )


def materialize_incremental(
    spark: SparkSession, base: DataFrame, new_explicit: DataFrame,
    max_rounds: int = 20, ctx: dict | None = None,
) -> DataFrame:
    """Inferred quads NEWLY entailed by adding ``new_explicit`` to
    ``base`` under owl2-rl (base = explicit ∪ already-materialized
    inferred). RL rules are monotone, so the fixpoint runs Δ-seeded:
    RDFS-Plus through its built-in seeding, every CONSTRUCT rule
    (restrictions, fixed RL table, per-axiom list expansions) through
    GRAPH-marker semi-naive variants (inference/delta.py) whose Δ-scans
    are |Δ|-sized. Deltas touching the owl:/rdfs:/rdf-list schema
    vocabulary force a full-evaluation round (the axiom tables and rule
    set are rebuilt from base ∪ Δ up front, so a schema-carrying Δ is
    still answered correctly). Runs in the same skolemized space as
    ``materialize`` — anonymous class expressions keep matching.

    ``ctx`` (round 9): caller-owned round-function cache. Building the
    round function scans the FULL store (vocabulary presence flags +
    RDF-list axiom collection) — an O(store) term per append that the
    r9 soak measured as the owl2-rl append's entire store-growth
    (×3.02 under 10× store vs owl-horst's flat ×1.01). The rule table
    depends only on the store's SCHEMA subset, so the caller passes the
    same dict back while its commits stay instance-only (the engine
    keys validity on its statement-set version and drops the dict on
    any schema-touching or non-append mutation); ``ctx['round_fn']``
    is reused when present and written back after a build."""
    from dublin_smart_city_graphdb_spark.inference.delta import (
        touches_schema_extended,
    )

    base_spo = _skolemize_spo(base.select(*_SPO_COLS))
    delta_spo = _skolemize_spo(
        new_explicit.select(*_SPO_COLS)
    ).distinct().localCheckpoint(eager=True)
    known0 = base_spo.unionByName(delta_spo)
    round_fn = ctx.get("round_fn") if ctx is not None else None
    if round_fn is None:
        round_fn = _incremental_round_fn(spark, known0)
        if ctx is not None:
            ctx["round_fn"] = round_fn
    return _deskolemize_out(_fixpoint(
        known0, delta_spo, max_rounds,
        round_fn=round_fn,
        touches_schema=touches_schema_extended,
    ))


def _incremental_round_fn(spark: SparkSession, universe_spo: DataFrame):
    """Δ-restrictable round function for owl2-rl, built against the
    skolemized statement UNIVERSE the maintenance runs over (the rule
    table is trigger-gated on the vocabulary present, and the per-axiom
    list rules are expanded from the store's RDF lists — both read from
    the universe up front). Shared by insert and delete maintenance;
    instance-only deltas cannot change the axiom tables, and
    schema-touching deltas take the full-evaluation fallback anyway."""
    from dublin_smart_city_graphdb_spark.inference.delta import (
        delta_variants,
        make_round_fn,
    )
    from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA
    from dublin_smart_city_graphdb_spark.sparql.parser import parse_query

    vocab = _present_vocab(universe_spo)
    list_rules, static_rows = _list_rules(universe_spo)
    texts = [
        text
        for trig, text in zip(_RESTRICTION_TRIGGERS, RESTRICTION_RULES)
        if trig & vocab
    ] + [
        text for trig, text in _FIXED_RULES if trig & vocab
    ] + list_rules
    parsed = [parse_query(r) for r in texts]
    variants = [delta_variants(p) for p in parsed]
    spo_schema = spark.createDataFrame([], QUAD_SCHEMA).select(
        *_SPO_COLS
    ).schema
    static_df = (
        spark.createDataFrame(static_rows, spo_schema)
        if static_rows else None
    )
    return make_round_fn(spark, parsed, variants, static_df=static_df)


def retract_incremental(
    spark: SparkSession, explicit_new: DataFrame, inferred_old: DataFrame,
    deleted: DataFrame, max_rounds: int = 20,
) -> DataFrame | None:
    """DRed maintenance of the owl2-rl closure after removing ``deleted``
    from the explicit store (inference/dred.py). Runs in the same
    skolemized space as ``materialize`` — anonymous class expressions
    keep matching through the rule pipeline. Returns the maintained
    inferred quads (deskolemized), or None when the delta touches rule
    schema (the caller re-materializes fully)."""
    from dublin_smart_city_graphdb_spark.inference.delta import (
        touches_schema_extended,
    )
    from dublin_smart_city_graphdb_spark.inference.dred import retract

    mid = _skolemize_spo(explicit_new.select(*_SPO_COLS))
    inf = _skolemize_spo(inferred_old.select(*_SPO_COLS))
    dele = _skolemize_spo(
        deleted.select(*_SPO_COLS)
    ).localCheckpoint(eager=True)
    universe = mid.unionByName(dele).unionByName(inf)
    out = retract(
        mid, inf, dele, _incremental_round_fn(spark, universe),
        touches_schema_extended, max_rounds,
    )
    return None if out is None else _deskolemize_out(out)


# -- inconsistency detection (validation report, SHACL-style) ---------------

_RDFS_PFX = "PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> "

#: (rule, trigger vocabulary, SELECT text with ?focus / ?detail
#: projections) — a check only compiles when its trigger occurs in the
#: (already materialized) store, so the report costs a handful of tiny
#: plans on vocabulary-free stores.
_CONSISTENCY_CHECKS = [
    ("eq-diff1", frozenset({OWL + "differentFrom"}),
     "SELECT ?focus ?detail WHERE { ?focus owl:sameAs ?detail . "
     "?focus owl:differentFrom ?detail }"),
    ("prp-irp", frozenset({OWL + "IrreflexiveProperty"}),
     "SELECT ?focus ?detail WHERE { "
     "?detail rdf:type owl:IrreflexiveProperty . ?focus ?detail ?focus }"),
    ("prp-asyp", frozenset({OWL + "AsymmetricProperty"}),
     "SELECT ?focus ?detail WHERE { "
     "?p rdf:type owl:AsymmetricProperty . "
     "?focus ?p ?detail . ?detail ?p ?focus }"),
    ("prp-pdw", frozenset({OWL + "propertyDisjointWith"}),
     "SELECT ?focus ?detail WHERE { "
     "?p1 owl:propertyDisjointWith ?p2 . "
     "?focus ?p1 ?detail . ?focus ?p2 ?detail }"),
    ("prp-npa1", frozenset({OWL + "targetIndividual"}),
     "SELECT ?focus ?detail WHERE { "
     "?a owl:sourceIndividual ?focus . ?a owl:assertionProperty ?p . "
     "?a owl:targetIndividual ?detail . ?focus ?p ?detail }"),
    ("prp-npa2", frozenset({OWL + "targetValue"}),
     "SELECT ?focus ?detail WHERE { "
     "?a owl:sourceIndividual ?focus . ?a owl:assertionProperty ?p . "
     "?a owl:targetValue ?detail . ?focus ?p ?detail }"),
    ("cls-com", frozenset({OWL + "complementOf"}),
     "SELECT ?focus ?detail WHERE { "
     "?detail owl:complementOf ?c2 . "
     "?focus rdf:type ?detail . ?focus rdf:type ?c2 }"),
    ("cls-nothing2", frozenset({OWL + "Nothing"}),
     "SELECT ?focus ?detail WHERE { ?focus rdf:type owl:Nothing . "
     "BIND(owl:Nothing AS ?detail) }"),
    ("cls-maxc1", frozenset({OWL + "maxCardinality"}),
     "SELECT ?focus ?detail WHERE { "
     "?c owl:maxCardinality ?n . ?c owl:onProperty ?detail . "
     "?focus rdf:type ?c . ?focus ?detail ?y . FILTER(?n = 0) }"),
    ("cls-maxqc1", frozenset({OWL + "maxQualifiedCardinality"}),
     "SELECT ?focus ?detail WHERE { "
     "?c owl:maxQualifiedCardinality ?n . ?c owl:onProperty ?detail . "
     "?c owl:onClass ?d . ?focus rdf:type ?c . ?focus ?detail ?y . "
     "?y rdf:type ?d . FILTER(?n = 0) }"),
    ("cls-maxqc2", frozenset({OWL + "maxQualifiedCardinality"}),
     "SELECT ?focus ?detail WHERE { "
     "?c owl:maxQualifiedCardinality ?n . ?c owl:onProperty ?detail . "
     "?c owl:onClass owl:Thing . ?focus rdf:type ?c . "
     "?focus ?detail ?y . FILTER(?n = 0) }"),
    ("cax-dw", frozenset({OWL + "disjointWith"}),
     "SELECT ?focus ?detail WHERE { "
     "?detail owl:disjointWith ?c2 . "
     "?focus rdf:type ?detail . ?focus rdf:type ?c2 }"),
]


def consistency_report(spark: SparkSession, quads: DataFrame) -> DataFrame:
    """The RL inconsistency rules as a validation report — one row
    (rule, focus, detail) per violation; empty ⇔ the store is
    RL-consistent. Runs over the MATERIALIZED store (callers pass the
    post-inference view), mirroring how GraphDB raises inconsistency
    from the same rules at load time; list-based axioms
    (AllDisjointClasses/AllDisjointProperties/AllDifferent) expand to
    pairwise VALUES-driven checks."""
    from dublin_smart_city_graphdb_spark.sparql.compiler import (
        QueryCompiler,
    )
    from dublin_smart_city_graphdb_spark.sparql.parser import parse_query

    spo = _skolemize_spo(quads.select(*_SPO_COLS))
    vocab = _present_vocab(spo)
    lists = _collect_lists(spo) if (
        vocab & {OWL + "members", OWL + "distinctMembers"}
    ) else {}

    def pair_values(members: list[str]) -> str:
        pairs = [
            f"({_iri(a)} {_iri(b)})"
            for i, a in enumerate(members)
            for b in members[i + 1:]
        ]
        return " ".join(pairs)

    checks = [
        (rule, text)
        for rule, trig, text in _CONSISTENCY_CHECKS
        if trig & vocab
    ]
    # cax-adc: AllDisjointClasses — pairwise disjointness over members
    if OWL + "AllDisjointClasses" in vocab:
        for x, head in _adc_axioms(spo, OWL + "AllDisjointClasses"):
            members = lists.get(head)
            if members and len(members) > 1:
                checks.append((
                    "cax-adc",
                    "SELECT ?focus ?detail WHERE { "
                    f"VALUES (?detail ?c2) {{ {pair_values(members)} }} "
                    "?focus rdf:type ?detail . ?focus rdf:type ?c2 }",
                ))
    # prp-adp: AllDisjointProperties
    if OWL + "AllDisjointProperties" in vocab:
        for x, head in _adc_axioms(spo, OWL + "AllDisjointProperties"):
            members = lists.get(head)
            if members and len(members) > 1:
                checks.append((
                    "prp-adp",
                    "SELECT ?focus ?detail WHERE { "
                    f"VALUES (?p1 ?p2) {{ {pair_values(members)} }} "
                    "?focus ?p1 ?detail . ?focus ?p2 ?detail }",
                ))
    # eq-diff2/3: AllDifferent members pairwise not-sameAs
    if OWL + "AllDifferent" in vocab:
        for x, head in _adc_axioms(
            spo, OWL + "AllDifferent",
            member_preds=(OWL + "members", OWL + "distinctMembers"),
        ):
            members = lists.get(head)
            if members and len(members) > 1:
                checks.append((
                    "eq-diff2",
                    "SELECT ?focus ?detail WHERE { "
                    f"VALUES (?focus ?detail) {{ {pair_values(members)} }} "
                    "?focus owl:sameAs ?detail }",
                ))

    quads_view = _skolemize_spo(
        quads.select(F.col("g").cast("string").alias("g"), *_SPO_COLS),
        lead=("g",),
    )
    prolog = _PROLOG + _RDFS_PFX
    out: DataFrame | None = None
    for rule, text in checks:
        comp = QueryCompiler(spark, quads_view)
        df = comp.compile(parse_query(prolog + text))
        row = df.select(
            F.lit(rule).alias("rule"),
            _unsk(F.col("focus")["lex"]).alias("focus"),
            _unsk(F.col("detail")["lex"]).alias("detail"),
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        return spark.createDataFrame(
            [], "rule string, focus string, detail string"
        )
    return out.distinct()


def _adc_axioms(
    spo: DataFrame, cls: str,
    member_preds: tuple[str, ...] | None = None,
) -> list[tuple[str, str]]:
    """(axiom node, member-list head) pairs for AllDisjointClasses-style
    axiom nodes: ``_:x a <cls> ; owl:members (...)``."""
    preds = member_preds or (OWL + "members",)
    ax = spo.filter(
        (F.col("p") == RDF + "type") & (F.col("o_lex") == cls)
    ).select(F.col("s").alias("ax"))
    mem = spo.filter(F.col("p").isin(*preds)).select(
        F.col("s").alias("ax"), F.col("o_lex").alias("head")
    )
    return [
        (r["ax"], r["head"])
        for r in ax.join(mem, "ax").distinct().collect()
    ]
