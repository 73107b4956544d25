"""Custom forward-chaining rulesets: SPARQL CONSTRUCT rules to fixpoint.

GraphDB repositories can be configured with a CUSTOM ruleset (a ``.pie``
file of ``premises => consequences`` rules) instead of a named one; this is
the Spark-native twin. Each rule is expressed as a SPARQL CONSTRUCT query —
the WHERE body is the rule's premises (it may use the full pattern
language: FILTER, property paths, UNION …), the template its consequences.
The driver loop re-evaluates the rule batch over the accumulated statement
set and anti-joins against what is already known until no rule derives
anything new (the same semi-naive scaffolding, checkpoint lifecycle and
null-safe dedup as the built-in RDFS-Plus batch in rdfsplus.py — custom
rules simply evaluate naively against the full set each round, because an
arbitrary CONSTRUCT body doesn't expose which of its patterns a delta
feeds).

Scale shape: each round is |rules| compiled BGP plans over the statement
set — the same join/filter plans queries use, so predicate pruning and
broadcast dimension joins apply; the anti-join is one hash join per round
on the 6-column statement identity. Inferred statements land under
``g = urn:inferred`` like every other ruleset, so "explicit only" access
and incremental re-materialization semantics stay uniform.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from dublin_smart_city_graphdb_spark.inference.rdfsplus import (
    _fixpoint,
    _SPO_COLS,
)


def _construct_to_spo(df: DataFrame) -> DataFrame:
    """CONSTRUCT output (s/p/o term structs) → statement-identity columns.

    Subjects and predicates store their lexical form directly (IRIs as-is,
    blank labels already ``_:``-prefixed by the term constructors); object
    structs decompose field-by-field into the typed object columns."""
    o = F.col("o")
    return df.select(
        F.col("s")["lex"].alias("s"),
        F.col("p")["lex"].alias("p"),
        o["kind"].cast("tinyint").alias("o_kind"),
        o["lex"].alias("o_lex"),
        o["dtype"].alias("o_dtype"),
        o["lang"].alias("o_lang"),
        o["num"].alias("o_num"),
        o["ts"].alias("o_ts"),
        o["bool"].alias("o_bool"),
    )


def materialize_rules(
    spark: SparkSession,
    explicit: DataFrame,
    rules: list[str],
    max_rounds: int = 20,
) -> DataFrame:
    """Run the CONSTRUCT rule batch to fixpoint over ``explicit``; returns
    ONLY the inferred quads, tagged ``g = urn:inferred`` (same contract as
    rdfsplus.materialize)."""
    from dublin_smart_city_graphdb_spark.sparql import ast as A
    from dublin_smart_city_graphdb_spark.sparql.parser import parse_query

    parsed = []
    for text in rules:
        q = parse_query(text)
        if not isinstance(q, A.ConstructQuery):
            raise ValueError(
                "custom ruleset entries must be CONSTRUCT queries; got "
                f"{type(q).__name__}"
            )
        parsed.append(q)
    if not parsed:
        return explicit.limit(0)

    spo = explicit.select(*_SPO_COLS)

    # Δ-restriction (r11): plain-BGP rule bodies get GRAPH-marker
    # semi-naive variants (inference/delta.py) so rounds after the first
    # scan |Δ| rows per instance slot instead of re-running every rule
    # over the whole accumulated set; non-rewritable bodies (FILTER-only
    # is fine; UNION/paths are not) keep full evaluation in delta rounds
    # — sound, just unseeded. Slots without variants can only match
    # owl:/rdfs: schema triples, so the extended schema-touch guard
    # forces a full round exactly when those could gain matches. The
    # fixpoint's result is unchanged: each round's candidates remain a
    # superset of the Δ-derived conclusions and a subset of the
    # derivable ones.
    from dublin_smart_city_graphdb_spark.inference.delta import (
        delta_quads_view,
        delta_variants,
        touches_schema_extended,
    )

    variants = [delta_variants(p) for p in parsed]

    def round_fn(known: DataFrame, inst) -> DataFrame:
        from dublin_smart_city_graphdb_spark.sparql.compiler import (
            QueryCompiler,
        )

        if inst is None:
            view = known.select(
                F.lit(None).cast("string").alias("g"), *_SPO_COLS
            )
            asts = parsed
        else:
            view = delta_quads_view(known, inst, _SPO_COLS)
            asts = [
                a
                for full, vs in zip(parsed, variants)
                for a in (vs if vs is not None else [full])
            ]
        if not asts:
            return known.select(*_SPO_COLS).limit(0)
        comp = QueryCompiler(spark, view)
        parts = [_construct_to_spo(comp.compile(ast)) for ast in asts]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    return _fixpoint(
        spo, None, max_rounds, round_fn=round_fn,
        touches_schema=touches_schema_extended,
    )
