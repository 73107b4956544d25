"""RDF term model: IRIs, blank nodes, literals (RDF 1.1 / SPARQL 1.1).

Python-side representation used by the Turtle/SPARQL parsers before rows are
handed to Spark; executors only ever see the flattened columnar form
(model/schema.py). Mirrors the term kinds present in the reference's data
(SURVEY.md §1.1: IRIs, plain / language-tagged / typed literals, wktLiteral).
"""

from __future__ import annotations

from dataclasses import dataclass
from decimal import Decimal, InvalidOperation
import datetime as _dt

# Well-known namespaces (public W3C vocabularies).
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
XSD = "http://www.w3.org/2001/XMLSchema#"

RDF_TYPE = RDF + "type"


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 over a path string (exact stack algorithm)."""
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = path[2:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = path[3:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1)
            seg, path = (path, "") if i < 0 else (path[:i], path[i:])
            out.append(seg)
    return "".join(out)


def resolve_iri(base: str, ref: str) -> str:
    """RFC 3986 §5.2.2 reference resolution (scheme-agnostic, unlike
    ``urllib.parse.urljoin`` which special-cases known schemes). Used by
    the SPARQL/Turtle parsers for relative IRIREFs against BASE; the
    column-valued twin for IRI()/URI() lives in ``sparql/exprs.py``."""
    import re as _re

    if _re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", ref):
        return ref
    m = _re.match(
        r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*):"
        r"(?P<auth>//[^/?#]*)?(?P<path>[^?#]*)"
        r"(?:\?(?P<query>[^#]*))?(?:#.*)?$",
        base,
    )
    if m is None:
        return base + ref  # base not absolute: legacy concat
    scheme, auth, bpath = m["scheme"], m["auth"] or "", m["path"]
    bquery = m["query"]
    pre = scheme + ":" + auth
    if ref.startswith("//"):
        return scheme + ":" + ref
    if ref == "":
        return pre + bpath + ("?" + bquery if bquery is not None else "")
    if ref.startswith("#"):
        return pre + bpath + ("?" + bquery if bquery is not None else "") + ref
    if ref.startswith("?"):
        return pre + bpath + ref
    rm = _re.match(r"^(?P<path>[^?#]*)(?P<tail>.*)$", ref)
    rpath, tail = rm["path"], rm["tail"]
    if rpath.startswith("/"):
        return pre + remove_dot_segments(rpath) + tail
    if auth and not bpath:
        merged = "/" + rpath
    elif "/" in bpath:
        merged = bpath[: bpath.rfind("/") + 1] + rpath
    else:
        merged = rpath
    return pre + remove_dot_segments(merged) + tail

NUMERIC_DATATYPES = frozenset(
    XSD + t
    for t in (
        "integer", "decimal", "double", "float", "int", "long", "short",
        "byte", "nonNegativeInteger", "positiveInteger", "negativeInteger",
        "nonPositiveInteger", "unsignedInt", "unsignedLong", "unsignedShort",
        "unsignedByte",
    )
)


@dataclass(frozen=True)
class Term:
    pass


@dataclass(frozen=True)
class IRI(Term):
    value: str

    def __str__(self) -> str:
        return f"<{self.value}>"


@dataclass(frozen=True)
class BNode(Term):
    label: str

    def __str__(self) -> str:
        return f"_:{self.label}"


@dataclass(frozen=True)
class Literal(Term):
    lex: str
    datatype: str | None = None
    lang: str | None = None

    def __str__(self) -> str:
        if self.lang:
            return f'"{self.lex}"@{self.lang}'
        if self.datatype:
            return f'"{self.lex}"^^<{self.datatype}>'
        return f'"{self.lex}"'

    def numeric_value(self) -> Decimal | None:
        if self.datatype in NUMERIC_DATATYPES:
            try:
                return Decimal(self.lex)
            except InvalidOperation:
                return None
        return None

    def boolean_value(self) -> bool | None:
        if self.datatype == XSD + "boolean":
            if self.lex in ("true", "1"):
                return True
            if self.lex in ("false", "0"):
                return False
        return None

    def timestamp_value(self) -> _dt.datetime | None:
        if self.datatype in (XSD + "dateTime", XSD + "date"):
            try:
                lex = self.lex
                if self.datatype == XSD + "date":
                    lex = lex + "T00:00:00"
                if lex.endswith("Z"):
                    lex = lex[:-1] + "+00:00"
                ts = _dt.datetime.fromisoformat(lex)
                if ts.tzinfo is None:
                    ts = ts.replace(tzinfo=_dt.timezone.utc)
                return ts
            except ValueError:
                return None
        return None


@dataclass(frozen=True)
class QuotedTriple(Term):
    """RDF-star quoted triple (GraphDB 10.x engine surface): a statement
    used AS a term, enabling statement-level annotation. Carried through
    the columnar plan as kind=3 with the canonical N-Triples-star text as
    the lexical form — identity-comparable, join-safe, and decomposable
    (subject/predicate have no whitespace, so the object is the
    unambiguous remainder)."""

    s: Term
    p: Term
    o: Term

    def __str__(self) -> str:
        return f"<< {nt_text(self.s)} {nt_text(self.p)} {nt_text(self.o)} >>"


def nt_text(t: Term) -> str:
    """Canonical N-Triples(-star) text of a term — the serialization quoted
    triples use for lexical identity (escaped, whitespace-normalized, so
    equal triples always serialize equally)."""
    if isinstance(t, IRI):
        return f"<{t.value}>"
    if isinstance(t, BNode):
        return f"_:{t.label}"
    if isinstance(t, QuotedTriple):
        return str(t)
    lit: Literal = t
    lex = (
        lit.lex.replace("\\", "\\\\").replace('"', '\\"')
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    )
    if lit.lang:
        return f'"{lex}"@{lit.lang}'
    if lit.datatype:
        return f'"{lex}"^^<{lit.datatype}>'
    return f'"{lex}"'


def term_to_row(g: str | None, s: Term, p: Term, o: Term) -> tuple:
    """Flatten one statement into the QUAD_SCHEMA row layout."""
    if isinstance(s, QuotedTriple):
        s_lex = str(s)
    else:
        s_lex = s.value if isinstance(s, IRI) else f"_:{s.label}"
    p_lex = p.value  # predicates are always IRIs
    if isinstance(o, IRI):
        return (g, s_lex, p_lex, 0, o.value, None, None, None, None, None)
    if isinstance(o, BNode):
        return (g, s_lex, p_lex, 1, f"_:{o.label}", None, None, None, None, None)
    if isinstance(o, QuotedTriple):
        return (g, s_lex, p_lex, 3, str(o), None, None, None, None, None)
    lit: Literal = o
    num = lit.numeric_value()
    return (
        g, s_lex, p_lex, 2, lit.lex, lit.datatype, lit.lang,
        num, lit.timestamp_value(), lit.boolean_value(),
    )
