"""SHACL core validation as DataFrame checks (VERDICT r4 task 2).

GraphDB 10.x ships RDF4J's SHACL engine (enabled by repository config the
same way ``init-graphdb.sh:51-55`` enables the ruleset — S-class surface
selected at ``Dockerfile:2``). This module implements the core constraint
components batch-style: the SHAPES graph is small and parsed driver-side
(our own Turtle reader); the DATA graph is the distributed quads
DataFrame, and every constraint compiles to JVM-side DataFrame ops —
filtered scans (predicate-pruned like any BGP pattern), one groupBy per
cardinality check, anti-joins for class/hasValue. No Python UDFs; at
100 TB each property shape costs at most one shuffle (the per-focus
cardinality count) and class checks broadcast the instance set when small.

Supported (the RDF4J ShaclSail core most deployments use):
  targets    sh:targetClass, sh:targetNode, sh:targetSubjectsOf,
             sh:targetObjectsOf
  paths      direct predicate IRI, [sh:inversePath <p>]
  property   sh:minCount, sh:maxCount, sh:datatype, sh:class, sh:nodeKind,
             sh:pattern (+sh:flags), sh:minLength/sh:maxLength,
             sh:minInclusive/sh:maxInclusive/sh:minExclusive/
             sh:maxExclusive, sh:in, sh:hasValue
  severity   sh:severity (default sh:Violation)

The validation report is a DataFrame with the W3C report vocabulary as
columns (focus, path, value, constraint, shape, severity, message) — the
relational face of ``sh:ValidationReport``; ``report_conforms`` gives the
boolean. Serialization to a report graph rides the existing protocol
machinery.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from decimal import Decimal

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from dublin_smart_city_graphdb_spark.model.terms import (
    IRI,
    Literal,
    RDF,
    RDF_TYPE,
    XSD,
    Term,
)

SH = "http://www.w3.org/ns/shacl#"

_NODE_KINDS = {
    SH + "IRI": (0,),
    SH + "BlankNode": (1,),
    SH + "Literal": (2,),
    SH + "BlankNodeOrIRI": (0, 1),
    SH + "BlankNodeOrLiteral": (1, 2),
    SH + "IRIOrLiteral": (0, 2),
}

REPORT_COLS = [
    "focus", "path", "value", "constraint", "shape", "severity", "message",
]


@dataclass
class PropertyShape:
    path: str
    inverse: bool = False
    shape_id: str = ""
    min_count: int | None = None
    max_count: int | None = None
    datatype: str | None = None
    class_: str | None = None
    node_kind: str | None = None
    pattern: str | None = None
    flags: str | None = None
    min_inclusive: Decimal | None = None
    max_inclusive: Decimal | None = None
    min_exclusive: Decimal | None = None
    max_exclusive: Decimal | None = None
    min_length: int | None = None
    max_length: int | None = None
    in_values: list[tuple[int, str]] | None = None
    has_value: tuple[int, str] | None = None
    severity: str = SH + "Violation"


@dataclass
class NodeShape:
    iri: str
    target_class: list[str] = field(default_factory=list)
    target_node: list[str] = field(default_factory=list)
    target_subjects_of: list[str] = field(default_factory=list)
    target_objects_of: list[str] = field(default_factory=list)
    properties: list[PropertyShape] = field(default_factory=list)
    severity: str = SH + "Violation"


class ShaclError(ValueError):
    pass


def _term_key(t: Term) -> tuple[int, str]:
    if isinstance(t, IRI):
        return (0, t.value)
    if isinstance(t, Literal):
        return (2, t.lex)
    return (1, getattr(t, "label", str(t)))


def parse_shapes(text: str) -> list[NodeShape]:
    """Parse a shapes document (Turtle text) into NodeShape structs.
    Driver-side by design: shapes graphs are ontology-sized (the data
    graph is the distributed side)."""
    from dublin_smart_city_graphdb_spark.sources.turtle import parse_turtle

    triples = parse_turtle(text)
    spo: dict[str, list[tuple[str, Term]]] = {}

    def node_id(t: Term) -> str:
        return t.value if isinstance(t, IRI) else "_:" + getattr(t, "label", "")

    for s, p, o in triples:
        spo.setdefault(node_id(s), []).append((p.value, o))

    def props(nid: str) -> list[tuple[str, Term]]:
        return spo.get(nid, [])

    def rdf_list(t: Term) -> list[Term]:
        out: list[Term] = []
        nid = node_id(t)
        while nid != RDF + "nil":
            entries = dict(props(nid))
            first = entries.get(RDF + "first")
            if first is None:
                raise ShaclError(f"shacl: malformed RDF list at {nid}")
            out.append(first)
            rest = entries.get(RDF + "rest")
            if rest is None:
                break
            nid = node_id(rest)
        return out

    shapes: list[NodeShape] = []
    for nid, pairs in spo.items():
        if (RDF_TYPE, IRI(SH + "NodeShape")) not in [
            (p, o) for p, o in pairs
        ] and not any(p == SH + "targetClass" for p, _ in pairs):
            continue
        ns = NodeShape(iri=nid)
        for p, o in pairs:
            if p == SH + "targetClass":
                ns.target_class.append(o.value)
            elif p == SH + "targetNode":
                ns.target_node.append(
                    o.value if isinstance(o, IRI) else str(o)
                )
            elif p == SH + "targetSubjectsOf":
                ns.target_subjects_of.append(o.value)
            elif p == SH + "targetObjectsOf":
                ns.target_objects_of.append(o.value)
            elif p == SH + "property":
                ns.properties.append(_parse_property(node_id(o), props,
                                                     rdf_list))
            elif p == SH + "severity":
                ns.severity = o.value
        for ps in ns.properties:
            if ps.severity == SH + "Violation" and ns.severity != SH + "Violation":
                ps.severity = ns.severity
        shapes.append(ns)
    if not shapes:
        raise ShaclError("shacl: no NodeShape found in shapes document")
    return shapes


def _parse_property(pid: str, props, rdf_list) -> PropertyShape:
    entries = props(pid)
    path = None
    inverse = False
    for p, o in entries:
        if p == SH + "path":
            if isinstance(o, IRI):
                path = o.value
            else:  # blank node: [sh:inversePath <p>]
                sub = dict(props(
                    o.value if isinstance(o, IRI) else "_:" + o.label
                ))
                inv = sub.get(SH + "inversePath")
                if inv is None:
                    raise ShaclError(
                        "shacl: only direct and sh:inversePath paths are "
                        "supported"
                    )
                path, inverse = inv.value, True
    if path is None:
        raise ShaclError(f"shacl: property shape {pid} has no sh:path")
    ps = PropertyShape(path=path, inverse=inverse, shape_id=pid)

    def ival(o: Term) -> int:
        return int(o.lex)

    def dval(o: Term) -> Decimal:
        return Decimal(o.lex)

    for p, o in entries:
        if p == SH + "minCount":
            ps.min_count = ival(o)
        elif p == SH + "maxCount":
            ps.max_count = ival(o)
        elif p == SH + "datatype":
            ps.datatype = o.value
        elif p == SH + "class":
            ps.class_ = o.value
        elif p == SH + "nodeKind":
            if o.value not in _NODE_KINDS:
                raise ShaclError(f"shacl: unknown nodeKind {o.value}")
            ps.node_kind = o.value
        elif p == SH + "pattern":
            ps.pattern = o.lex
        elif p == SH + "flags":
            ps.flags = o.lex
        elif p == SH + "minInclusive":
            ps.min_inclusive = dval(o)
        elif p == SH + "maxInclusive":
            ps.max_inclusive = dval(o)
        elif p == SH + "minExclusive":
            ps.min_exclusive = dval(o)
        elif p == SH + "maxExclusive":
            ps.max_exclusive = dval(o)
        elif p == SH + "minLength":
            ps.min_length = ival(o)
        elif p == SH + "maxLength":
            ps.max_length = ival(o)
        elif p == SH + "in":
            ps.in_values = [_term_key(t) for t in rdf_list(o)]
        elif p == SH + "hasValue":
            ps.has_value = _term_key(o)
        elif p == SH + "severity":
            ps.severity = o.value
    return ps


def _focus_nodes(quads: DataFrame, ns: NodeShape) -> DataFrame:
    spark = quads.sparkSession
    parts: list[DataFrame] = []
    for cls in ns.target_class:
        parts.append(
            quads.filter(
                (F.col("p") == RDF_TYPE) & (F.col("o_lex") == cls)
            ).select(F.col("s").alias("focus"))
        )
    for pred in ns.target_subjects_of:
        parts.append(
            quads.filter(F.col("p") == pred).select(F.col("s").alias("focus"))
        )
    for pred in ns.target_objects_of:
        parts.append(
            quads.filter(
                (F.col("p") == pred) & (F.col("o_kind").isin(0, 1))
            ).select(F.col("o_lex").alias("focus"))
        )
    if ns.target_node:
        parts.append(
            spark.createDataFrame([(n,) for n in ns.target_node],
                                  "focus string")
        )
    if not parts:
        return spark.createDataFrame([], "focus string")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def _report_row(ps: PropertyShape, shape: str, constraint: str,
                focus, value, message) -> list:
    return [
        focus.alias("focus"),
        F.lit(ps.path).alias("path"),
        value.alias("value"),
        F.lit(constraint).alias("constraint"),
        F.lit(shape).alias("shape"),
        F.lit(ps.severity).alias("severity"),
        message.alias("message"),
    ]


def validate(quads: DataFrame, shapes: list[NodeShape]) -> DataFrame:
    """Validation report: one row per violation (sh:ValidationResult).
    Empty report ⇔ conforms."""
    spark = quads.sparkSession
    reports: list[DataFrame] = []
    for ns in shapes:
        focus = _focus_nodes(quads, ns)
        for ps in ns.properties:
            reports.extend(_check_property(quads, focus, ns, ps))
    if not reports:
        return spark.createDataFrame(
            [], "focus string, path string, value string, constraint string,"
                " shape string, severity string, message string"
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def _check_property(quads: DataFrame, focus: DataFrame, ns: NodeShape,
                    ps: PropertyShape) -> list[DataFrame]:
    shape = ns.iri
    vals = property_values(quads, ps).join(focus, "focus")
    out: list[DataFrame] = []
    fcol = F.col("focus")
    vcol = F.col("v_lex")

    if ps.min_count is not None or ps.max_count is not None:
        counts = focus.join(
            vals.groupBy("focus").agg(F.count("*").alias("cnt")),
            "focus", "left",
        ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        if ps.min_count is not None:
            out.append(counts.filter(F.col("cnt") < ps.min_count).select(
                *_report_row(
                    ps, shape, "MinCountConstraintComponent", fcol,
                    F.lit(None).cast("string"),
                    F.concat(F.lit(f"minCount {ps.min_count}, got "),
                             F.col("cnt").cast("string")),
                )
            ))
        if ps.max_count is not None:
            out.append(counts.filter(F.col("cnt") > ps.max_count).select(
                *_report_row(
                    ps, shape, "MaxCountConstraintComponent", fcol,
                    F.lit(None).cast("string"),
                    F.concat(F.lit(f"maxCount {ps.max_count}, got "),
                             F.col("cnt").cast("string")),
                )
            ))

    out.extend(_value_checks(vals, ns, ps))
    if ps.class_ is not None:
        out.append(_class_check(vals, quads, ns, ps))

    if ps.has_value is not None:
        k, lex = ps.has_value
        holders = vals.filter(
            (F.col("v_kind") == k) & (vcol == lex)
        ).select("focus").distinct()
        out.append(focus.join(holders, "focus", "left_anti").select(
            *_report_row(
                ps, shape, "HasValueConstraintComponent", fcol,
                F.lit(None).cast("string"),
                F.lit(f"missing required value {lex}"),
            )
        ))

    return out


def _value_checks(vals: DataFrame, ns: NodeShape,
                  ps: PropertyShape) -> list[DataFrame]:
    """Pure ROW-LEVEL constraint checks (datatype, nodeKind, pattern,
    numeric ranges, lengths, sh:in): each is a filter over the value rows
    with no join and no aggregation — reusable verbatim by the streaming
    validator (stateless per micro-batch)."""
    shape = ns.iri
    fcol = F.col("focus")
    vcol = F.col("v_lex")
    out: list[DataFrame] = []

    if ps.datatype is not None:
        eff = F.when(
            F.col("v_kind") != 2, F.lit(None)
        ).otherwise(F.coalesce(
            F.col("v_dtype"),
            F.when(F.col("v_lang").isNotNull(),
                   F.lit(RDF + "langString")).otherwise(F.lit(XSD + "string")),
        ))
        out.append(vals.filter(
            ~eff.eqNullSafe(F.lit(ps.datatype))
        ).select(*_report_row(
            ps, shape, "DatatypeConstraintComponent", fcol, vcol,
            F.lit(f"expected datatype {ps.datatype}"),
        )))

    if ps.node_kind is not None:
        kinds = _NODE_KINDS[ps.node_kind]
        out.append(vals.filter(~F.col("v_kind").isin(*kinds)).select(
            *_report_row(
                ps, shape, "NodeKindConstraintComponent", fcol, vcol,
                F.lit(f"expected nodeKind {ps.node_kind}"),
            )
        ))

    if ps.pattern is not None:
        pat = (f"(?{ps.flags})" if ps.flags else "") + ps.pattern
        bad = (F.col("v_kind") == 1) | ~F.regexp_like(vcol, F.lit(pat))
        out.append(vals.filter(bad).select(*_report_row(
            ps, shape, "PatternConstraintComponent", fcol, vcol,
            F.lit(f"value does not match pattern {ps.pattern!r}"),
        )))

    for bound, op, name in (
        (ps.min_inclusive, lambda c, b: c < b, "MinInclusive"),
        (ps.max_inclusive, lambda c, b: c > b, "MaxInclusive"),
        (ps.min_exclusive, lambda c, b: c <= b, "MinExclusive"),
        (ps.max_exclusive, lambda c, b: c >= b, "MaxExclusive"),
    ):
        if bound is None:
            continue
        num = F.col("v_num")
        bad = num.isNull() | op(num, F.lit(bound).cast("decimal(38,10)"))
        out.append(vals.filter(bad).select(*_report_row(
            ps, shape, f"{name}ConstraintComponent", fcol, vcol,
            F.lit(f"{name[0].lower()}{name[1:]} {bound}"),
        )))

    if ps.min_length is not None:
        bad = (F.col("v_kind") == 1) | (F.length(vcol) < ps.min_length)
        out.append(vals.filter(bad).select(*_report_row(
            ps, shape, "MinLengthConstraintComponent", fcol, vcol,
            F.lit(f"minLength {ps.min_length}"),
        )))
    if ps.max_length is not None:
        bad = (F.col("v_kind") == 1) | (F.length(vcol) > ps.max_length)
        out.append(vals.filter(bad).select(*_report_row(
            ps, shape, "MaxLengthConstraintComponent", fcol, vcol,
            F.lit(f"maxLength {ps.max_length}"),
        )))

    if ps.in_values is not None:
        allowed = [f"{k}|{lex}" for k, lex in ps.in_values]
        key = F.concat(F.col("v_kind").cast("string"), F.lit("|"), vcol)
        out.append(vals.filter(~key.isin(*allowed)).select(*_report_row(
            ps, shape, "InConstraintComponent", fcol, vcol,
            F.lit("value not in sh:in enumeration"),
        )))
    return out


def _class_check(vals: DataFrame, type_source: DataFrame, ns: NodeShape,
                 ps: PropertyShape) -> DataFrame:
    """sh:class: values that are not (IRI/bnode) instances of the class.
    Left-outer join + null-marker filter instead of anti-join so the SAME
    shape works when ``vals`` is a stream (stream-static left outer is
    supported; anti is not). No broadcast hint: the instance set of a
    class can be huge at scale — AQE picks broadcast when it fits."""
    instances = type_source.filter(
        (F.col("p") == RDF_TYPE) & (F.col("o_lex") == ps.class_)
    ).select(F.col("s").alias("v_lex"),
             F.lit(True).alias("_is_inst")).distinct()
    joined = vals.join(instances, "v_lex", "left")
    bad = (F.col("v_kind") == 2) | F.col("_is_inst").isNull()
    return joined.filter(bad).select(*_report_row(
        ps, ns.iri, "ClassConstraintComponent", F.col("focus"),
        F.col("v_lex"), F.lit(f"value is not an instance of {ps.class_}"),
    ))


def property_values(quads: DataFrame, ps: PropertyShape) -> DataFrame:
    """The (focus, value-term) rows a property shape constrains — the
    predicate-filtered scan both validators share."""
    scan = quads.filter(F.col("p") == ps.path)
    if ps.inverse:
        return scan.select(
            F.col("o_lex").alias("focus"),
            F.lit(0).cast("tinyint").alias("v_kind"),
            F.col("s").alias("v_lex"),
            F.lit(None).cast("string").alias("v_dtype"),
            F.lit(None).cast("string").alias("v_lang"),
            F.lit(None).cast("decimal(38,10)").alias("v_num"),
        )
    return scan.select(
        F.col("s").alias("focus"),
        F.col("o_kind").alias("v_kind"),
        F.col("o_lex").alias("v_lex"),
        F.col("o_dtype").alias("v_dtype"),
        F.col("o_lang").alias("v_lang"),
        F.col("o_num").alias("v_num"),
    )


def report_conforms(report: DataFrame) -> bool:
    return report.isEmpty()
