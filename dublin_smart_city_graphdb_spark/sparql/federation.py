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
    KIND_TRIPLE,
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


# ---------------------------------------------------------------------------
# Bound join (FedX-style, Schwarte et al. ISWC 2011): instead of fetching
# the remote group unrestricted and joining locally, inject the LOCAL
# side's distinct bindings of the shared variables into the remote query
# as a VALUES block. The remote endpoint then returns only solutions
# compatible with bindings we actually hold — remote transfer becomes
# O(|local distinct keys| ⋈ remote selectivity) instead of O(|remote
# pattern|). Soundness: the outer join re-checks compatibility on every
# shared var, so the injection may only ever REMOVE remote solutions the
# join would have discarded; restricted vars are certainly-bound locally,
# so each local row matches exactly one VALUES copy and multiplicities
# are preserved even when the remote group binds the var only partially
# (e.g. in one UNION branch).
# ---------------------------------------------------------------------------

_BOUND_JOIN_MAX = 256  # above this, fall back to the unrestricted fetch


def binding_vars(group) -> set[str]:
    """Variables the remote group can BIND (pattern positions, BIND/VALUES
    targets, GRAPH vars, subselect projections). Deliberately excludes
    FILTER-only variables: a VALUES row would bind them, changing a
    filter's unbound-error outcome — SERVICE evaluates independently of
    outer bindings per SPARQL 1.1 Federated Query §2.2, so only vars the
    group itself could bind are safe to restrict."""
    from dublin_smart_city_graphdb_spark.sparql import ast as A

    out: set[str] = set()

    def term(t):
        if isinstance(t, A.Var):
            out.add(t.name)
        elif isinstance(t, A.QuotedPattern):
            term(t.s), term(t.p), term(t.o)

    def walk_group(g):
        for elem in g.elements:
            if isinstance(elem, A.BGP):
                for tp in elem.triples:
                    term(tp.s), term(tp.o)
                    if isinstance(tp.p, A.Var):
                        out.add(tp.p.name)
            elif isinstance(elem, A.OptionalPattern):
                walk_group(elem.group)
            elif isinstance(elem, A.UnionPattern):
                for b in elem.branches:
                    walk_group(b)
            elif isinstance(elem, A.GraphGraphPattern):
                if isinstance(elem.graph, A.Var):
                    out.add(elem.graph.name)
                walk_group(elem.group)
            elif isinstance(elem, A.ServicePattern):
                walk_group(elem.group)
            elif isinstance(elem, A.BindPattern):
                out.add(elem.var.name)
            elif isinstance(elem, A.ValuesPattern):
                out.update(v.name for v in elem.vars)
            elif isinstance(elem, A.SubSelectPattern):
                q = elem.query
                if q.projections:
                    for p, alias in q.projections:
                        if alias is not None:
                            out.add(alias.name)
                        elif isinstance(p, A.Var):
                            out.add(p.name)
                else:
                    walk_group(q.where)
            # MinusPattern binds nothing visible to the outer solution
        return out

    return walk_group(group)


def _sparql_term_text(cell) -> str | None:
    """TERM_STRUCT row cell → SPARQL term syntax, or None if the term
    cannot travel (blank nodes are endpoint-scoped; a remote bnode can
    never equal a local one, but restricting on it is impossible — the
    caller drops the variable instead, which is a safe over-fetch)."""
    if cell is None or cell.kind is None:
        return None
    if cell.kind == KIND_IRI:
        v = cell.lex
        if any(ch in v for ch in "<>\"{}|^`\\") or any(
            ord(ch) <= 0x20 for ch in v
        ):
            return None
        return f"<{v}>"
    if cell.kind == KIND_BLANK:
        return None
    if cell.kind == KIND_TRIPLE:
        # lex is canonical N-Triples-star text — already valid SPARQL-star
        return cell.lex
    esc = (
        cell.lex.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    if cell.lang:
        return f'"{esc}"@{cell.lang}'
    if cell.dtype:
        return f'"{esc}"^^<{cell.dtype}>'
    return f'"{esc}"'


def values_clause(left_df, shared: list[str]) -> str | None:
    """Build the ``VALUES`` restriction from the local side's distinct
    bindings, or None when a bound join does not apply (too many distinct
    keys, or no serializable variable survives). The collect is bounded
    at ``_BOUND_JOIN_MAX + 1`` rows — a dimension-sized scatter-gather,
    the same envelope as the fetch itself."""
    rows = (
        left_df.select(*shared).distinct().limit(_BOUND_JOIN_MAX + 1).collect()
    )
    if len(rows) > _BOUND_JOIN_MAX:
        return None
    texts: dict[str, list[str]] = {}
    keep: list[str] = []
    for v in shared:
        col = [_sparql_term_text(r[v]) for r in rows]
        if all(t is not None for t in col):
            keep.append(v)
            texts[v] = col
    if not keep:
        return None
    tuples = sorted({tuple(texts[v][i] for v in keep) for i in range(len(rows))})
    head = " ".join(f"?{v}" for v in keep)
    body = " ".join("(" + " ".join(t) + ")" for t in tuples)
    return f"VALUES ({head}) {{ {body} }}"
