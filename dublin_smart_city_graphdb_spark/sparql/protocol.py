"""SPARQL 1.1 Protocol result serialization (SURVEY.md §2.1 S4).

The reference's clients consume ``application/sparql-results+json``
(``init-graphdb.sh:134``, ``README.md:108``): ``head/vars`` +
``results/bindings``, each binding ``{type, value, datatype?, xml:lang?}``
per the public W3C "SPARQL 1.1 Query Results JSON Format" spec. ASK results
use ``{head: {}, boolean: ...}``.

``rows_to_json`` works on collected rows (driver-side, result sets are
post-LIMIT small); for large exports ``df_to_json_lines`` keeps
serialization distributed via ``to_json`` on executors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from dublin_smart_city_graphdb_spark.model.schema import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
)


def _term_json(t) -> dict | None:
    """Binding struct Row (kind/lex/dtype/lang/...) → results-JSON term."""
    if t is None or t["kind"] is None:
        return None
    if t["kind"] == KIND_IRI:
        return {"type": "uri", "value": t["lex"]}
    if t["kind"] == KIND_BLANK:
        lex = t["lex"]
        return {"type": "bnode", "value": lex[2:] if lex.startswith("_:") else lex}
    out: dict = {"type": "literal", "value": t["lex"]}
    if t["lang"]:
        out["xml:lang"] = t["lang"]
    elif t["dtype"]:
        out["datatype"] = t["dtype"]
    return out


def rows_to_json(columns: list[str], rows: list) -> dict:
    """SELECT solutions → SPARQL-results-JSON document."""
    if columns == ["ask"]:  # ASK form (engine returns a single boolean col)
        return {"head": {}, "boolean": bool(rows[0]["ask"])}
    bindings = []
    for r in rows:
        b = {}
        for var in columns:
            tj = _term_json(r[var])
            if tj is not None:  # unbound vars are simply absent (spec)
                b[var] = tj
        bindings.append(b)
    return {"head": {"vars": list(columns)}, "results": {"bindings": bindings}}


def df_to_json_lines(df: DataFrame) -> DataFrame:
    """Distributed path: one JSON object per solution row (NDJSON export).
    Serialization runs on executors via ``to_json``; no driver collect."""
    cols = []
    for var in df.columns:
        t = F.col(var)
        lex = t["lex"]
        term = (
            F.when(
                t["kind"] == KIND_IRI,
                F.struct(F.lit("uri").alias("type"), lex.alias("value")),
            )
            .when(
                t["kind"] == KIND_BLANK,
                F.struct(
                    F.lit("bnode").alias("type"),
                    F.regexp_replace(lex, "^_:", "").alias("value"),
                ),
            )
            .when(
                t["kind"] == KIND_LITERAL,
                F.struct(F.lit("literal").alias("type"), lex.alias("value")),
            )
        )
        cols.append(term.alias(var))
    return df.select(F.to_json(F.struct(*cols)).alias("json"))
