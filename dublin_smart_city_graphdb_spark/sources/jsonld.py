"""JSON-LD ingest (S1 source surface).

The reference's RDF4J REST endpoint accepts ``application/ld+json`` uploads
alongside Turtle/N-Triples (GraphDB import surface; the repo's own client
scripts post Turtle, but the served content-type list includes JSON-LD).
This module implements the practically-used subset of the JSON-LD 1.0 to-RDF
algorithm, hand-rolled against the public W3C spec — no external processor:

- expanded form (top-level array of node objects),
- flattened form (``@graph`` array, including named-graph node objects that
  carry their own ``@graph``),
- compact form with a simple ``@context``: term → IRI strings,
  ``{"@id": ..., "@type": "@id" | <datatype>}`` definitions, ``@vocab``,
  ``@base`` and ``@language``,
- keywords ``@id`` ``@type`` ``@value`` ``@language`` ``@list`` ``@set``
  ``@graph``; ``@list`` expands to an rdf:first/rdf:rest chain,
- JSON natives per spec: number → xsd:integer / xsd:double, boolean →
  xsd:boolean, plain string → simple literal (with context ``@language``
  applied when set),
- nested node objects allocate fresh blank nodes.

Documented restrictions (raise or ignore, never silently corrupt):
``@reverse``, ``@container`` indexing, scoped contexts, remote ``@context``
IRIs and JSON-LD 1.1 ``@included`` are out of scope.

Two paths, mirroring turtle.py:

- ``jsonld_to_rows`` / ``read_jsonld`` — driver-side parse of one document
  (config-file scale; the document must fit on the driver, which matches
  how the reference's REST import receives a single request body).
- ``read_jsonld_distributed`` — NDJSON-LD: ONE node object per line (the
  layout bulk pipelines actually emit, e.g. a Wikidata dump shard). Lines
  split across executors exactly like the N-Triples bulk path; blank-node
  labels are scoped per line so two lines can never collide.
"""

from __future__ import annotations

import json
from typing import Any

from dublin_smart_city_graphdb_spark.session import local_df
from dublin_smart_city_graphdb_spark.model.terms import (
    RDF,
    XSD,
    BNode,
    IRI,
    Literal,
    Term,
    term_to_row,
)

RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"

_UNSUPPORTED = ("@reverse", "@included", "@nest")


class JsonLdError(ValueError):
    pass


class _Context:
    """Flattened view of a simple local @context."""

    def __init__(self, ctx: Any):
        self.vocab: str | None = None
        self.base: str | None = None
        self.language: str | None = None
        self.terms: dict[str, dict] = {}
        if ctx is None:
            return
        if isinstance(ctx, list):
            for part in ctx:
                self._merge(part)
        else:
            self._merge(ctx)

    def _merge(self, ctx: Any) -> None:
        if ctx is None:
            return
        if isinstance(ctx, str):
            raise JsonLdError(
                f"remote @context {ctx!r} is not supported (no network "
                "fetch at parse time); inline the context"
            )
        if not isinstance(ctx, dict):
            raise JsonLdError(f"unsupported @context form: {type(ctx).__name__}")
        for k, v in ctx.items():
            if k == "@vocab":
                self.vocab = v
            elif k == "@base":
                self.base = v
            elif k == "@language":
                self.language = v
            elif k.startswith("@"):
                raise JsonLdError(f"unsupported @context keyword {k}")
            elif isinstance(v, str):
                self.terms[k] = {"@id": v}
            elif isinstance(v, dict):
                self.terms[k] = v
            else:
                raise JsonLdError(f"unsupported term definition for {k!r}")

    def expand_iri(self, value: str, *, vocab: bool) -> str:
        """Term / CURIE / relative-IRI expansion (simple algorithm)."""
        if value.startswith("_:"):
            return value
        if value in self.terms:
            target = self.terms[value].get("@id")
            if not isinstance(target, str):
                raise JsonLdError(f"term {value!r} has no @id mapping")
            if target == value:  # guard degenerate self-mapping
                return value
            return self.expand_iri(target, vocab=vocab)
        if ":" in value:
            prefix, suffix = value.split(":", 1)
            if prefix in self.terms and not suffix.startswith("//"):
                base = self.terms[prefix].get("@id")
                if isinstance(base, str):
                    return base + suffix
            return value  # already an absolute IRI
        if vocab and self.vocab:
            return self.vocab + value
        if not vocab and self.base:
            return self.base + value
        return value

    def term_def(self, key: str) -> dict:
        return self.terms.get(key, {})


class _State:
    def __init__(self, bnode_prefix: str):
        self.triples: list[tuple[str | None, Term, Term, Term]] = []
        self._bnode_prefix = bnode_prefix
        self._bnode_n = 0
        self._label_map: dict[str, BNode] = {}

    def fresh_bnode(self) -> BNode:
        self._bnode_n += 1
        return BNode(f"{self._bnode_prefix}{self._bnode_n}")

    def labeled_bnode(self, label: str) -> BNode:
        """Document-supplied labels (``_:b0``) go through the same scope as
        fresh ones: two NDJSON lines — or two REST uploads — each saying
        ``_:b0`` must NOT merge into one node (RDF4J remaps bnode ids per
        upload the same way). ADVICE r3."""
        if label not in self._label_map:
            self._label_map[label] = BNode(f"{self._bnode_prefix}x{label}")
        return self._label_map[label]


def _node_id(obj: dict, ctx: _Context, st: _State) -> Term:
    nid = obj.get("@id")
    if nid is None:
        return st.fresh_bnode()
    if not isinstance(nid, str):
        raise JsonLdError(f"@id must be a string, got {type(nid).__name__}")
    if nid.startswith("_:"):
        return st.labeled_bnode(nid[2:])
    return IRI(ctx.expand_iri(nid, vocab=False))


def _canonical_double(v: float) -> str:
    """XSD canonical mapping for xsd:double: mantissa with no trailing
    zeros (but at least one fraction digit), 'E', exponent with no sign-+
    or leading zeros. E.g. 2.5 → '2.5E0', 100.0 → '1.0E2'.

    Built from ``repr`` (shortest round-trip digits — a fixed %.15E loses
    values needing 16-17 significant digits) and handles the non-finite
    floats Python's json parser admits (Infinity/NaN) with their XSD
    lexical forms (ADVICE r4)."""
    import math
    from decimal import Decimal

    if math.isinf(v):
        return "INF" if v > 0 else "-INF"
    if math.isnan(v):
        return "NaN"
    sign, digits, exp = Decimal(repr(v)).as_tuple()
    mant_digits = "".join(map(str, digits)).rstrip("0")
    if not mant_digits:
        return "-0.0E0" if sign else "0.0E0"
    e = exp + len(digits) - 1
    mant = (
        mant_digits + ".0"
        if len(mant_digits) == 1
        else mant_digits[0] + "." + mant_digits[1:]
    )
    return ("-" if sign else "") + mant + "E" + str(e)


def _native_literal(v: Any, ctx: _Context, dt: str | None) -> Literal:
    if isinstance(v, bool):
        return Literal("true" if v else "false", XSD + "boolean")
    if isinstance(v, int):
        return Literal(str(v), dt or XSD + "integer")
    if isinstance(v, float):
        # JSON-LD value-to-RDF: numbers with a fraction → xsd:double in the
        # XSD *canonical* lexical form ('2.5E0', not '2.500000000000000E+00')
        # — what RDF4J/jsonld-java emit, so lexical joins/round-trips against
        # reference-produced data agree (ADVICE r3)
        return Literal(_canonical_double(v), dt or XSD + "double")
    if isinstance(v, str):
        if dt:
            return Literal(v, dt)
        if ctx.language:
            return Literal(v, None, ctx.language)
        return Literal(v)
    raise JsonLdError(f"unsupported literal value {v!r}")


def _value_object(obj: dict, ctx: _Context) -> Literal:
    v = obj["@value"]
    lang = obj.get("@language")
    dt = obj.get("@type")
    if lang is not None and dt is not None:
        raise JsonLdError("@value with both @language and @type")
    if lang is not None:
        if not isinstance(v, str):
            raise JsonLdError("@language requires a string @value")
        return Literal(v, None, lang)
    if dt is not None:
        dt = ctx.expand_iri(dt, vocab=True)
        if isinstance(v, bool):
            v = "true" if v else "false"
        return Literal(str(v), dt)
    return _native_literal(v, ctx, None)


def _object_term(
    v: Any, ctx: _Context, st: _State, graph: str | None, term: dict
) -> Term:
    """One object position → a Term, emitting any nested triples."""
    type_coercion = term.get("@type")
    if isinstance(v, dict):
        if "@value" in v:
            return _value_object(v, ctx)
        if "@list" in v:
            return _list_chain(v["@list"], ctx, st, graph, term)
        # nested node object
        node = _expand_node(v, ctx, st, graph)
        return node
    if isinstance(v, str) and type_coercion == "@id":
        if v.startswith("_:"):
            return st.labeled_bnode(v[2:])
        return IRI(ctx.expand_iri(v, vocab=False))
    if isinstance(v, str) and type_coercion:
        return Literal(v, ctx.expand_iri(type_coercion, vocab=True))
    lang = term.get("@language")
    if isinstance(v, str) and lang:
        return Literal(v, None, lang)
    return _native_literal(v, ctx, None)


def _list_chain(
    items: Any, ctx: _Context, st: _State, graph: str | None, term: dict
) -> Term:
    if not isinstance(items, list):
        items = [items]
    if not items:
        return IRI(RDF_NIL)
    head = st.fresh_bnode()
    node = head
    for i, item in enumerate(items):
        st.triples.append(
            (graph, node, IRI(RDF_FIRST), _object_term(item, ctx, st, graph, term))
        )
        nxt: Term = IRI(RDF_NIL) if i == len(items) - 1 else st.fresh_bnode()
        st.triples.append((graph, node, IRI(RDF_REST), nxt))
        node = nxt
    return head


def _expand_node(
    obj: dict, ctx: _Context, st: _State, graph: str | None
) -> Term:
    """Emit all triples of one node object; return its subject term."""
    for kw in _UNSUPPORTED:
        if kw in obj:
            raise JsonLdError(f"{kw} is not supported")
    if "@context" in obj:
        inner = _Context(None)
        inner.vocab, inner.base = ctx.vocab, ctx.base
        inner.language = ctx.language
        inner.terms = dict(ctx.terms)
        merged = _Context(obj["@context"])
        inner.vocab = merged.vocab or inner.vocab
        inner.base = merged.base or inner.base
        inner.language = merged.language or inner.language
        inner.terms.update(merged.terms)
        ctx = inner
    subj = _node_id(obj, ctx, st)

    for key, value in obj.items():
        if key in ("@context", "@id"):
            continue
        if key == "@type":
            types = value if isinstance(value, list) else [value]
            for t in types:
                st.triples.append(
                    (graph, subj, IRI(RDF + "type"),
                     IRI(ctx.expand_iri(t, vocab=True)))
                )
            continue
        if key == "@graph":
            # named graph: triples nested under this node's @id
            gname = None
            if "@id" in obj:
                gname = subj.value if isinstance(subj, IRI) else str(subj)
            items = value if isinstance(value, list) else [value]
            for item in items:
                _expand_node(item, ctx, st, gname)
            continue
        if key.startswith("@"):
            raise JsonLdError(f"unsupported keyword {key}")
        term = ctx.term_def(key)
        pred = IRI(ctx.expand_iri(key, vocab=True))
        values = value
        if isinstance(values, dict) and "@set" in values:
            values = values["@set"]
        if term.get("@container") == "@list" and isinstance(values, list):
            o = _list_chain(values, ctx, st, graph, term)
            st.triples.append((graph, subj, pred, o))
            continue
        if not isinstance(values, list):
            values = [values]
        for v in values:
            if isinstance(v, dict) and "@list" in v:
                o = _list_chain(v["@list"], ctx, st, graph, term)
            else:
                o = _object_term(v, ctx, st, graph, term)
            st.triples.append((graph, subj, pred, o))
    return subj


def parse_jsonld(
    text: str, bnode_prefix: str = "jb"
) -> list[tuple[str | None, Term, Term, Term]]:
    """Parse one JSON-LD document → (graph, s, p, o) statements."""
    doc = json.loads(text)
    st = _State(bnode_prefix)
    ctx = _Context(None)
    if isinstance(doc, dict) and "@context" in doc:
        ctx = _Context(doc["@context"])
    nodes: list
    if isinstance(doc, list):
        nodes = doc
    elif isinstance(doc, dict) and "@graph" in doc and "@id" not in doc:
        nodes = doc["@graph"]
        if not isinstance(nodes, list):
            nodes = [nodes]
    else:
        nodes = [doc]
    for node in nodes:
        if not isinstance(node, dict):
            raise JsonLdError(
                f"top-level entries must be node objects, got {type(node).__name__}"
            )
        _expand_node(node, ctx, st, None)
    return st.triples


def jsonld_to_rows(
    text: str, graph: str | None = None, bnode_prefix: str = "jb"
) -> list[tuple]:
    """Parse JSON-LD → QUAD_SCHEMA rows (driver-side path).

    An explicit ``graph`` forces EVERY statement into that graph —
    including statements the document placed in its own named ``@graph``
    blocks. This matches RDF4J's ``RepositoryConnection.add(..., context)``
    (an explicit context overrides parsed contexts), so a graph-scoped GSP
    PUT (CLEAR + load) is a true replace: nothing can escape into other
    graphs and survive the next PUT (ADVICE r3). ``graph=None`` keeps the
    document's own graph placement."""
    rows = []
    for g, s, p, o in parse_jsonld(text, bnode_prefix):
        rows.append(term_to_row(graph if graph is not None else g, s, p, o))
    return rows


def read_jsonld(spark, path: str, graph: str | None = None):
    """Whole-document JSON-LD file → quads DataFrame (driver parse)."""
    from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA

    with open(path, encoding="utf-8") as f:
        rows = jsonld_to_rows(f.read(), graph)
    return local_df(spark, rows, QUAD_SCHEMA)


def read_jsonld_distributed(spark, path: str, graph: str | None = None):
    """NDJSON-LD bulk load: one node object per line, parsed executor-side.

    ``spark.read.text`` splits the file by byte ranges (same Hadoop
    text-split contract as the N-Triples bulk path), so a 100 TB dump
    shards across the cluster; each line is an independent JSON-LD node
    object (with an optional inline ``@context``). Blank-node labels are
    prefixed with the line's partition/offset so nodes from different
    lines can never collide.
    """
    from pyspark.sql import functions as F

    from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA

    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_id"), "value"
    )

    def parse_partition(rows):
        for r in rows:
            text = r.value.strip()
            if not text:
                continue
            yield from jsonld_to_rows(text, graph, bnode_prefix=f"l{r.line_id}b")

    return spark.createDataFrame(
        lines.rdd.mapPartitions(parse_partition), QUAD_SCHEMA
    )
