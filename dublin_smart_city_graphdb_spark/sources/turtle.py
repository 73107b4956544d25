"""Turtle / N-Triples parsers (no external RDF library in this environment).

Covers the Turtle subset exercised by the reference's data files
(``data/ontology/facilities.ttl``, ``data/graph_data/areas.ttl``: prefixes,
``a``, predicate/object lists ``;`` ``,``, IRIs, prefixed names, blank
nodes, plain/lang-tagged/typed literals, numeric shorthand, booleans,
triple-quoted strings, comments) per the public W3C Turtle 1.1 grammar.

Two ingestion paths (SURVEY.md §2.1 S1):

- ``parse_turtle`` — recursive-descent parser on the driver; fine for
  ontology/dimension files (the reference's are < 250 lines).
- ``read_ntriples_distributed`` — bulk path: ``spark.read.text`` +
  ``mapPartitions`` line parser, since N-Triples is line-delimited and
  therefore splittable. At 100 TB this is the path that matters: parsing
  scales with executors and never touches the driver.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from dublin_smart_city_graphdb_spark.session import local_df
from dublin_smart_city_graphdb_spark.model.terms import (
    RDF,
    RDF_TYPE,
    XSD,
    BNode,
    IRI,
    Literal,
    QuotedTriple,
    Term,
    term_to_row,
)

_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+|\#[^\n]*)
    | (?P<IRIREF><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<STRING_LONG2>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\")
    | (?P<STRING_LONG1>'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<STRING2>"(?:[^"\\\n]|\\.)*")
    | (?P<STRING1>'(?:[^'\\\n]|\\.)*')
    | (?P<PREFIX_KW>@prefix\b|@base\b|PREFIX\b|BASE\b)
    | (?P<LANGTAG>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<DOUBLE>[+-]?(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
    | (?P<DECIMAL>[+-]?\d*\.\d+)
    | (?P<INTEGER>[+-]?\d+)
    | (?P<BNODE>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
    | (?P<PNAME>[A-Za-z0-9_-]*:(?:(?:[A-Za-z0-9_.%:-]|\\[_~.!$&'()*+,;=/?\#@%-])*(?:[A-Za-z0-9_%:-]|\\[_~.!$&'()*+,;=/?\#@%-]))?)
    | (?P<KW_A>\ba\b)
    | (?P<KW_GRAPH>\bGRAPH\b|\bgraph\b|\bGraph\b)
    | (?P<BOOL>\btrue\b|\bfalse\b)
    | (?P<DTYPE>\^\^)
    | (?P<QUOTE2><<|>>|\{\||\|\})
    | (?P<PUNCT>[;,.\[\](){}])
    """,
    re.VERBOSE,
)


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            mapping = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
                       '"': '"', "'": "'", "\\": "\\"}
            if n in mapping:
                out.append(mapping[n])
                i += 2
                continue
            if n == "u" and i + 6 <= len(s):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if n == "U" and i + 10 <= len(s):
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


class TurtleParser:
    def __init__(self, text: str):
        self.tokens: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m:
                raise ValueError(f"turtle: cannot tokenize at {text[pos:pos + 40]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind != "WS":
                self.tokens.append((kind, m.group()))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self._bnode_n = 0
        self.triples: list[tuple[Term, Term, Term]] = []

    # -- token helpers ------------------------------------------------------
    def _peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else ("EOF", "")

    def _next(self):
        tok = self._peek()
        self.i += 1
        return tok

    def _expect(self, value: str):
        kind, v = self._next()
        if v != value:
            raise ValueError(f"turtle: expected {value!r}, got {v!r}")

    # -- grammar ------------------------------------------------------------
    def parse(self) -> list[tuple[Term, Term, Term]]:
        while self._peek()[0] != "EOF":
            kind, v = self._peek()
            if kind == "PREFIX_KW":
                self._directive()
            else:
                self._triples_block()
                self._expect(".")
        return self.triples

    def _directive(self):
        _, kw = self._next()
        if kw in ("@prefix", "PREFIX"):
            _, pname = self._next()
            if not pname.endswith(":"):
                # PNAME token may include the local part; prefix decl is 'ns:'
                raise ValueError(f"turtle: bad prefix name {pname!r}")
            _, iri = self._next()
            self.prefixes[pname[:-1]] = iri[1:-1]
            if kw == "@prefix":
                self._expect(".")
        else:  # @base / BASE
            _, iri = self._next()
            self.base = iri[1:-1]
            if kw == "@base":
                self._expect(".")

    def _triples_block(self):
        subj = self._term(position="subject")
        self._predicate_object_list(subj)

    def _predicate_object_list(self, subj: Term):
        while True:
            pred = self._predicate()
            while True:
                obj = self._term(position="object")
                self.triples.append((subj, pred, obj))
                if self._peek()[1] == "{|":
                    # Turtle-star annotation: asserts the triple AND opens
                    # a predicate-object list about its quoted form
                    self._next()
                    self._predicate_object_list(QuotedTriple(subj, pred, obj))
                    k2, v2 = self._next()
                    if v2 != "|}":
                        raise ValueError(f"turtle: expected '|}}', got {v2!r}")
                if self._peek()[1] == ",":
                    self._next()
                    continue
                break
            if self._peek()[1] == ";":
                self._next()
                # trailing ';' before '.' or ']' is legal
                if self._peek()[1] in (".", "]", ";"):
                    while self._peek()[1] == ";":
                        self._next()
                    if self._peek()[1] in (".", "]"):
                        return
                continue
            return

    def _predicate(self) -> Term:
        kind, v = self._peek()
        if kind == "KW_A":
            self._next()
            return IRI(RDF_TYPE)
        return self._term(position="predicate")

    def _resolve_pname(self, pname: str) -> str:
        ns, _, local = pname.partition(":")
        if ns not in self.prefixes:
            raise ValueError(f"turtle: unknown prefix {ns!r}")
        return self.prefixes[ns] + local.replace("\\", "")

    def _term(self, position: str) -> Term:
        kind, v = self._next()
        if kind == "QUOTE2" and v == "<<":
            # Turtle-star quoted triple (subject/object positions)
            qs = self._term(position="subject")
            qp = self._predicate()
            qo = self._term(position="object")
            k2, v2 = self._next()
            if v2 != ">>":
                raise ValueError(f"turtle: expected '>>', got {v2!r}")
            return QuotedTriple(qs, qp, qo)
        if kind == "IRIREF":
            iri = v[1:-1]
            if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
                from dublin_smart_city_graphdb_spark.model.terms import resolve_iri

                iri = resolve_iri(self.base, iri)
            return IRI(iri)
        if kind == "PNAME":
            return IRI(self._resolve_pname(v))
        if kind == "BNODE":
            return BNode(v[2:])
        if kind == "PUNCT" and v == "[":
            self._bnode_n += 1
            node = BNode(f"anon{self._bnode_n}")
            if self._peek()[1] != "]":
                self._predicate_object_list(node)
            self._expect("]")
            return node
        if kind == "PUNCT" and v == "(":
            # RDF collection → rdf:first/rdf:rest chain
            items = []
            while self._peek()[1] != ")":
                items.append(self._term(position="object"))
            self._next()
            head: Term = IRI(RDF + "nil")
            for item in reversed(items):
                self._bnode_n += 1
                cell = BNode(f"list{self._bnode_n}")
                self.triples.append((cell, IRI(RDF + "first"), item))
                self.triples.append((cell, IRI(RDF + "rest"), head))
                head = cell
            return head
        if position == "predicate":
            raise ValueError(f"turtle: bad predicate token {v!r}")
        if kind in ("STRING2", "STRING1", "STRING_LONG2", "STRING_LONG1"):
            q = 3 if kind.startswith("STRING_LONG") else 1
            lex = _unescape(v[q:-q])
            nk, nv = self._peek()
            if nk == "LANGTAG":
                self._next()
                return Literal(lex, lang=nv[1:])
            if nk == "DTYPE":
                self._next()
                dt = self._term(position="datatype")
                if not isinstance(dt, IRI):
                    raise ValueError("turtle: datatype must be an IRI")
                return Literal(lex, datatype=dt.value)
            return Literal(lex)
        if kind == "INTEGER":
            return Literal(v, datatype=XSD + "integer")
        if kind == "DECIMAL":
            return Literal(v, datatype=XSD + "decimal")
        if kind == "DOUBLE":
            return Literal(v, datatype=XSD + "double")
        if kind == "BOOL":
            return Literal(v, datatype=XSD + "boolean")
        raise ValueError(f"turtle: unexpected token {v!r} in {position}")


class TrigParser(TurtleParser):
    """TriG 1.1 (W3C): Turtle plus named-graph blocks.

    Grammar extensions over the inherited Turtle parser:
    ``GRAPH <label> { ... }``, the keyword-less ``<label> { ... }`` sugar,
    an anonymous ``{ ... }`` default-graph block, and plain Turtle triples
    at the top level (default graph). The engine-surface twin of the
    reference image's ``application/trig`` import route — GraphDB's
    ``/statements`` accepts TriG alongside Turtle/RDF-XML/JSON-LD."""

    def __init__(self, text: str):
        super().__init__(text)
        self.quads: list[tuple[str | None, Term, Term, Term]] = []

    def parse_quads(self) -> list[tuple[str | None, Term, Term, Term]]:
        while self._peek()[0] != "EOF":
            kind, v = self._peek()
            if kind == "PREFIX_KW":
                self._directive()
            elif kind == "KW_GRAPH":
                self._next()
                label = self._term(position="subject")
                self._graph_block(label)
            elif v == "{":
                self._graph_block(None)
            elif (
                kind in ("IRIREF", "PNAME", "BNODE")
                and self.i + 1 < len(self.tokens)
                and self.tokens[self.i + 1][1] == "{"
            ):
                # labelled block without the GRAPH keyword — the label is a
                # single simple term, so the one-token lookahead is exact
                label = self._term(position="subject")
                self._graph_block(label)
            else:
                before = len(self.triples)
                self._triples_block()
                self._expect(".")
                self._route(None, before)
        return self.quads

    def _graph_block(self, label: Term | None):
        self._expect("{")
        before = len(self.triples)
        while self._peek()[1] != "}":
            self._triples_block()
            nxt = self._peek()[1]
            if nxt == ".":
                self._next()
            elif nxt != "}":
                raise ValueError(
                    f"trig: expected '.' or '}}' in graph block, got {nxt!r}"
                )
        self._expect("}")
        self._route(label, before)

    def _route(self, label: Term | None, start: int):
        if label is None:
            g = None
        elif isinstance(label, IRI):
            g = label.value
        elif isinstance(label, BNode):
            g = f"_:{label.label}"
        else:
            raise ValueError(f"trig: graph label must be an IRI or blank node, got {label!r}")
        for s, p, o in self.triples[start:]:
            self.quads.append((g, s, p, o))


def parse_trig(text: str) -> list[tuple[str | None, Term, Term, Term]]:
    return TrigParser(text).parse_quads()


def trig_to_rows(text: str, graph: str | None = None) -> list[tuple]:
    """Parse TriG → QUAD_SCHEMA rows. An explicit ``graph`` forces EVERY
    statement into that graph — including statements the document placed in
    its own named-graph blocks (RDF4J explicit-context override semantics,
    same contract as ``jsonld_to_rows``); ``graph=None`` keeps the
    document's own graph placement."""
    return [
        term_to_row(graph if graph is not None else g, s, p, o)
        for g, s, p, o in parse_trig(text)
    ]


def parse_turtle(text: str) -> list[tuple[Term, Term, Term]]:
    return TurtleParser(text).parse()


def turtle_to_rows(text: str, graph: str | None = None) -> list[tuple]:
    """Parse Turtle → QUAD_SCHEMA rows (driver-side path)."""
    return [term_to_row(graph, s, p, o) for s, p, o in parse_turtle(text)]


# ---------------------------------------------------------------------------
# Distributed N-Triples bulk path
# ---------------------------------------------------------------------------

_NT_LINE = re.compile(
    r"""^\s*
    (?:<(?P<s_iri>[^>]*)>|(?P<s_bn>_:\S+))\s+
    <(?P<p>[^>]*)>\s+
    (?:<(?P<o_iri>[^>]*)>
      |(?P<o_bn>_:\S+)
      |"(?P<o_lit>(?:[^"\\]|\\.)*)"
       (?:@(?P<lang>[A-Za-z0-9-]+)|\^\^<(?P<dt>[^>]*)>)?
    )
    (?:\s+<(?P<g_iri>[^>]*)>)?    # N-Quads: optional graph label
    \s*\.\s*$""",
    re.VERBOSE,
)


def parse_ntriples_lines(
    lines: Iterator[str], graph: str | None = None, allow_graph: bool = False
) -> Iterator[tuple]:
    """Per-partition N-Triples / N-Quads line parser (used via
    mapPartitions). With ``allow_graph`` a 4th ``<g>`` term routes the
    statement to that named graph (N-Quads); otherwise it's rejected."""
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _NT_LINE.match(line)
        if not m or (m["g_iri"] is not None and not allow_graph):
            kind = "nquads" if allow_graph else "ntriples"
            raise ValueError(f"{kind}: bad line {line[:80]!r}")
        s: Term = IRI(m["s_iri"]) if m["s_iri"] is not None else BNode(m["s_bn"][2:])
        p = IRI(m["p"])
        if m["o_iri"] is not None:
            o: Term = IRI(m["o_iri"])
        elif m["o_bn"] is not None:
            o = BNode(m["o_bn"][2:])
        else:
            o = Literal(_unescape(m["o_lit"]), datatype=m["dt"], lang=m["lang"])
        yield term_to_row(m["g_iri"] if m["g_iri"] is not None else graph, s, p, o)


def read_ntriples_distributed(spark, path: str, graph: str | None = None):
    """Bulk N-Triples load: splittable text scan + executor-side parse.

    Stays an RDD only for the line→row flatMap (per-partition imperative
    parse, the one legitimate RDD use), then immediately becomes a DataFrame.
    """
    from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA

    lines = spark.read.text(path).rdd.map(lambda r: r.value)
    rows = lines.mapPartitions(lambda it: parse_ntriples_lines(it, graph))
    return local_df(spark, rows, QUAD_SCHEMA)


def read_nquads_distributed(spark, path: str):
    """Bulk N-Quads load: like the N-Triples path, with each line's optional
    graph label landing in ``g`` (default graph when absent)."""
    from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA

    lines = spark.read.text(path).rdd.map(lambda r: r.value)
    rows = lines.mapPartitions(
        lambda it: parse_ntriples_lines(it, None, allow_graph=True)
    )
    return local_df(spark, rows, QUAD_SCHEMA)
