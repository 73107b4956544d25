"""Streaming SHACL validation — the CDC-gate twin of ``shacl.py``.

Scenario: a repository holds the known graph (types, existing
statements); NEW statements arrive as a quad stream (the same shape the
exactly-once ingest feed uses). Each micro-batch is validated against
the shapes BEFORE it lands, so constraint-violating statements can be
quarantined at the door — RDF4J's transactional-SHACL behavior
re-expressed for continuous ingestion.

Constraint envelope (documented, enforced at build time):
 - all ROW-LEVEL components (datatype, nodeKind, pattern, numeric
   ranges, lengths, sh:in) — stateless filters, shared verbatim with the
   batch validator (``shacl._value_checks``);
 - sh:class — a stream-static LEFT OUTER join against the repository's
   instance set (``shacl._class_check``; left-outer is on Structured
   Streaming's supported stream-static list, anti is not — which is why
   the batch validator uses the same null-marker formulation);
 - focus scoping by sh:targetClass / sh:targetSubjectsOf resolves
   against the STATIC graph (stream-static inner join): a streamed
   statement is validated when its subject is already a known instance.
 - sh:minCount / sh:maxCount / sh:hasValue are CARDINALITY constraints
   over the whole graph — meaningless per micro-batch — and raise.

The rejection list is CONTRACTUAL (r8 verdict task 7 — every class is
either validated or refused loudly, never silently skipped; pinned by
``test_shacl.py::test_stream_rejection_contract``):
 - cardinality: minCount / maxCount / hasValue / qualifiedValueShape
 - whole-graph per focus: uniqueLang (language multiset), closed
   (predicate scan of all the focus's statements), sh:sparql
 - cross-statement joins: pair constraints (equals / disjoint /
   lessThan / lessThanOrEquals read the focus's OTHER property),
   sh:node (the value node's properties), composite sh:path forms,
   logic bundles needing join-level evaluation (sh:class / sh:node
   inside or/and/not/xone)
All could only be validated per micro-batch by pretending the batch IS
the graph — wrong answers at the door are worse than a loud boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from dublin_smart_city_graphdb_spark.shacl import (
    NodeShape,
    PropertyShape,
    ShaclError,
    _class_check,
    _focus_nodes,
    _logic_is_row_level,
    _value_checks,
    property_values,
)


def _reject_unstreamable(ns: NodeShape, ps: PropertyShape) -> None:
    """Refuse loudly every constraint class whose semantics need the
    whole graph or a cross-statement join — the contractual boundary of
    per-micro-batch validation."""
    if (
        ps.min_count is not None
        or ps.max_count is not None
        or ps.has_value is not None
        or ps.qvs is not None
    ):
        raise ShaclError(
            "shacl-stream: cardinality constraints (minCount/"
            "maxCount/hasValue/qualifiedValueShape) are whole-"
            "graph properties — validate them with "
            "Repository.validate_shacl"
        )
    if ps.path_expr is not None:
        raise ShaclError(
            "shacl-stream: composite sh:path forms (sequence/"
            "alternative/closure) join across statements — "
            "validate them with Repository.validate_shacl"
        )
    if ps.unique_lang:
        raise ShaclError(
            "shacl-stream: sh:uniqueLang is a whole-graph language"
            " multiset per focus — validate it with"
            " Repository.validate_shacl"
        )
    if (
        ps.equals is not None
        or ps.disjoint is not None
        or ps.less_than is not None
        or ps.less_than_or_equals is not None
    ):
        raise ShaclError(
            "shacl-stream: pair constraints (equals/disjoint/lessThan/"
            "lessThanOrEquals) compare against the focus's OTHER"
            " property values across the graph — validate them with"
            " Repository.validate_shacl"
        )
    if ps.node is not None:
        raise ShaclError(
            "shacl-stream: sh:node reads the value node's properties"
            " across the graph — validate it with"
            " Repository.validate_shacl"
        )
    if (
        ps.or_branches or ps.and_branches or ps.xone_branches
        or ps.not_branch is not None
    ) and not _logic_is_row_level(ps):
        raise ShaclError(
            "shacl-stream: logic bundles containing join-level branches"
            " (sh:class/sh:node) — validate them with"
            " Repository.validate_shacl"
        )


def validate_statements_stream(
    stream_quads: DataFrame, static_quads: DataFrame,
    shapes: list[NodeShape],
) -> DataFrame:
    """Violation stream for a quad feed, scoped and class-checked against
    the static repository graph. Returns a streaming DataFrame with the
    batch validator's report columns."""
    reports: list[DataFrame] = []
    for ns in shapes:
        if ns.closed:
            raise ShaclError(
                "shacl-stream: sh:closed scans ALL the focus's"
                " statements — validate it with Repository.validate_shacl"
            )
        if ns.sparql_constraints:
            raise ShaclError(
                "shacl-stream: sh:sparql constraints see the whole data"
                " graph — validate them with Repository.validate_shacl"
            )
        focus = _focus_nodes(static_quads, ns)
        for ps in ns.properties:
            _reject_unstreamable(ns, ps)
            vals = property_values(stream_quads, ps).join(focus, "focus")
            reports.extend(_value_checks(vals, ns, ps))
            if ps.class_ is not None:
                reports.append(_class_check(vals, static_quads, ns, ps))
    if not reports:
        raise ShaclError("shacl-stream: no streamable constraints in shapes")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
