"""HTTP SERVICE federation (SPARQL 1.1 Federated Query over the wire).

The reference engine (GraphDB, selected wholesale at ``Dockerfile:2``)
federates ``SERVICE <http://...>`` groups to remote SPARQL-protocol
endpoints. Our engine-internal federation (``urn:repo:{name}`` targets,
``compiler._service``) keeps data on the cluster; this module adds the
wire path: the SERVICE group is re-serialized to a self-contained
``SELECT *`` query (token lexemes captured at parse time, prefixes
replayed), POSTed to the endpoint per the SPARQL Protocol, and the
results-JSON bindings come back as one term-struct DataFrame that joins
into the outer plan like any local pattern.

Scale posture: a remote SPARQL endpoint is an external, non-Spark data
source — its result set necessarily lands on the driver (the protocol is
a single HTTP response, not a splittable source), so this path is for
dimension-sized remote lookups, the same operational envelope the
reference's own federation has. The fetched solutions become a normal
(usually broadcast-sized) DataFrame; Catalyst is free to broadcast it
against the 100 TB local side. Remote blank nodes are re-scoped per call
(`_:svc{n}_...`) so they can never accidentally join local blank labels.
"""

from __future__ import annotations

import itertools
import json
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType

from dublin_smart_city_graphdb_spark.model.schema import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    TERM_STRUCT,
)
from dublin_smart_city_graphdb_spark.model.terms import BNode, IRI, Literal, Term

_scope_counter = itertools.count()


def fetch_bindings(
    endpoint: str, query: str, timeout: float = 15.0
) -> tuple[list[str], list[dict[str, Term]]]:
    """POST ``query`` to a SPARQL-protocol endpoint; parse results-JSON.

    Uses the protocol's form-encoded POST (the shape the reference's own
    init client uses against its endpoint, ``init-graphdb.sh:133-135``,
    just with POST instead of GET so long queries never hit URL limits).
    """
    data = urllib.parse.urlencode({"query": query}).encode()
    req = urllib.request.Request(
        endpoint,
        data=data,
        headers={
            "Content-Type": "application/x-www-form-urlencoded",
            "Accept": "application/sparql-results+json",
        },
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        doc = json.load(resp)
    scope = f"svc{next(_scope_counter)}"
    vars_ = list(doc["head"]["vars"])
    rows = [
        {
            v: _term_from_json(b[v], scope)
            for v in b
            if b[v] is not None
        }
        for b in doc["results"]["bindings"]
    ]
    return vars_, rows


def _term_from_json(t: dict, scope: str) -> Term:
    typ = t.get("type")
    if typ == "uri":
        return IRI(t["value"])
    if typ == "bnode":
        # fresh per-call scope: remote bnode labels are distinct from any
        # local label (SPARQL 1.1 Federated Query §2.4 — bnodes do not
        # travel across endpoints)
        return BNode(f"{scope}_{t['value']}")
    # "literal" (and legacy "typed-literal")
    return Literal(
        t["value"],
        datatype=t.get("datatype"),
        lang=t.get("xml:lang"),
    )


def _term_tuple(t: Term | None) -> tuple | None:
    """Term → TERM_STRUCT row tuple (same flattening as terms.term_to_row)."""
    if t is None:
        return None
    if isinstance(t, IRI):
        return (KIND_IRI, t.value, None, None, None, None, None)
    if isinstance(t, BNode):
        return (KIND_BLANK, f"_:{t.label}", None, None, None, None, None)
    lit: Literal = t
    return (
        KIND_LITERAL,
        lit.lex,
        lit.datatype,
        lit.lang,
        lit.numeric_value(),
        lit.timestamp_value(),
        lit.boolean_value(),
    )


def solutions_df(
    spark: SparkSession, vars_: list[str], rows: list[dict[str, Term]]
) -> tuple[DataFrame, list[str], set[str]]:
    """Remote bindings → (df, var_order, certainly-bound vars)."""
    if not vars_:
        # var-free remote group: n unit solutions (e.g. a constant ASK-ish
        # pattern) — mirror compiler.unit()'s empty-projection shape
        return spark.range(len(rows)).select(), [], set()
    schema = StructType([StructField(v, TERM_STRUCT, True) for v in vars_])
    py_rows = [tuple(_term_tuple(r.get(v)) for v in vars_) for r in rows]
    df = spark.createDataFrame(py_rows, schema)
    certain = {v for v in vars_ if all(r.get(v) is not None for r in rows)}
    return df, vars_, certain
