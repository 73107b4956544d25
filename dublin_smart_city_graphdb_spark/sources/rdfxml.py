"""RDF/XML ingest (S1 source surface).

The reference's RDF4J REST endpoint accepts ``application/rdf+xml`` on
``/statements`` — the most common RDF wire format after Turtle (the repo's
own init script posts Turtle only, ``init-graphdb.sh:91``, so this is
engine-surface parity with the GraphDB 10.x image selected at
``Dockerfile:2``). Hand-rolled against the public W3C "RDF 1.1 XML Syntax"
spec on stdlib ``xml.etree`` — no external RDF library.

Covered grammar (the practically-used core):

- ``rdf:RDF`` root, or a single node element as the document root,
- node elements: ``rdf:Description`` and typed node elements (the element
  QName becomes an ``rdf:type`` triple),
- node identification: ``rdf:about`` (resolved against ``xml:base``),
  ``rdf:ID`` (→ ``base#ID``), ``rdf:nodeID``, or a fresh blank node,
- property attributes on node elements (non-rdf attrs → plain literals,
  ``rdf:type`` attr → IRI object),
- property elements: ``rdf:resource`` / ``rdf:nodeID`` object refs, typed
  literals via ``rdf:datatype``, plain/lang literals from text content
  (``xml:lang`` inherited through the element stack), nested node
  elements, and property attributes combined with ``rdf:resource`` /
  empty property elements (spec §2.12 — the attrs describe the object),
- ``rdf:parseType="Resource"`` (implicit blank node),
  ``rdf:parseType="Literal"`` (``rdf:XMLLiteral`` of the inner XML),
  ``rdf:parseType="Collection"`` (rdf:first/rest list),
- ``rdf:li`` → ``rdf:_1``, ``rdf:_2``, … per containing node element,
- reification via ``rdf:ID`` on a property element (emits the four
  ``rdf:Statement`` triples).

Documented restriction: ``rdf:aboutEach`` / ``rdf:bagID`` (dropped by the
spec itself) raise. Blank-node labels — fresh AND document-supplied
``rdf:nodeID`` ones — are scoped by ``bnode_prefix``, so two uploads (or
two NDJSON-style shards) can never accidentally merge nodes; RDF4J remaps
bnode ids per upload the same way.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from urllib.parse import urljoin

from dublin_smart_city_graphdb_spark.session import local_df
from dublin_smart_city_graphdb_spark.model.terms import (
    RDF,
    BNode,
    IRI,
    Literal,
    Term,
    term_to_row,
)

RDF_XMLLITERAL = RDF + "XMLLiteral"

_RDF_NS = "{" + RDF + "}"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
_XML_BASE = "{http://www.w3.org/XML/1998/namespace}base"

# attributes that are syntax, never property attributes
_SYNTAX_ATTRS = {
    _RDF_NS + a
    for a in ("about", "ID", "nodeID", "resource", "datatype", "parseType")
}
_FORBIDDEN_ATTRS = {_RDF_NS + a for a in ("aboutEach", "aboutEachPrefix", "bagID")}

_NODEID_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.-]*$")


class RdfXmlError(ValueError):
    pass


class _State:
    def __init__(self, bnode_prefix: str):
        self._prefix = bnode_prefix
        self._fresh = 0
        self._label_map: dict[str, BNode] = {}
        self._li_counters: dict[int, int] = {}
        self.triples: list[tuple[Term, Term, Term]] = []

    def fresh_bnode(self) -> BNode:
        self._fresh += 1
        return BNode(f"{self._prefix}g{self._fresh}")

    def labeled_bnode(self, label: str) -> BNode:
        # document-supplied labels go through the same scope as fresh ones
        # (two uploads both saying rdf:nodeID="b0" must not merge)
        if not _NODEID_RE.match(label):
            raise RdfXmlError(f"invalid rdf:nodeID {label!r}")
        if label not in self._label_map:
            self._label_map[label] = BNode(f"{self._prefix}x{label}")
        return self._label_map[label]

    def next_li(self, node_key: int) -> str:
        n = self._li_counters.get(node_key, 0) + 1
        self._li_counters[node_key] = n
        return f"{RDF}_{n}"

    def emit(self, s: Term, p: Term, o: Term) -> None:
        self.triples.append((s, p, o))


def _qname_iri(tag: str) -> str:
    """ElementTree gives tags as ``{namespace}local`` — the RDF/XML mapping
    is simply concatenation."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    raise RdfXmlError(f"unnamespaced element <{tag}> has no IRI mapping")


def _check_attrs(el: ET.Element) -> None:
    for a in el.attrib:
        if a in _FORBIDDEN_ATTRS:
            raise RdfXmlError(f"{a.split('}')[1]} is not supported (withdrawn from the spec)")


def _resolve(base: str | None, ref: str) -> str:
    if not base:
        return ref
    return urljoin(base, ref)


def _inherited(el: ET.Element, lang: str | None, base: str | None) -> tuple[str | None, str | None]:
    lang = el.get(_XML_LANG, lang)
    base = el.get(_XML_BASE, base)
    return lang, base


def _node_element(el: ET.Element, st: _State, lang: str | None, base: str | None) -> Term:
    """Process a node element, emit its triples, return its subject term."""
    _check_attrs(el)
    lang, base = _inherited(el, lang, base)

    about = el.get(_RDF_NS + "about")
    rid = el.get(_RDF_NS + "ID")
    node_id = el.get(_RDF_NS + "nodeID")
    if sum(x is not None for x in (about, rid, node_id)) > 1:
        raise RdfXmlError("at most one of rdf:about / rdf:ID / rdf:nodeID")
    if about is not None:
        subj: Term = IRI(_resolve(base, about))
    elif rid is not None:
        subj = IRI(_resolve(base, "#" + rid))
    elif node_id is not None:
        subj = st.labeled_bnode(node_id)
    else:
        subj = st.fresh_bnode()

    type_iri = _qname_iri(el.tag)
    if type_iri != RDF + "Description":
        st.emit(subj, IRI(RDF + "type"), IRI(type_iri))

    # property attributes (spec §2.5): non-syntax, non-xml attrs → literals;
    # rdf:type attr → IRI object
    for attr, val in el.attrib.items():
        if attr in _SYNTAX_ATTRS or attr.startswith("{http://www.w3.org/XML/1998/namespace}"):
            continue
        if attr == _RDF_NS + "type":
            st.emit(subj, IRI(RDF + "type"), IRI(_resolve(base, val)))
        elif attr.startswith(_RDF_NS) and attr[len(_RDF_NS):] in ("li",):
            raise RdfXmlError("rdf:li is not allowed as an attribute")
        else:
            st.emit(subj, IRI(_qname_iri(attr)), Literal(val, lang=lang))

    for child in el:
        _property_element(child, subj, st, lang, base)
    return subj


def _reify(st: _State, rid_iri: str, s: Term, p: Term, o: Term) -> None:
    stmt = IRI(rid_iri)
    st.emit(stmt, IRI(RDF + "type"), IRI(RDF + "Statement"))
    st.emit(stmt, IRI(RDF + "subject"), s)
    st.emit(stmt, IRI(RDF + "predicate"), p)
    st.emit(stmt, IRI(RDF + "object"), o)


def _property_element(el: ET.Element, subj: Term, st: _State, lang: str | None, base: str | None) -> None:
    _check_attrs(el)
    lang, base = _inherited(el, lang, base)

    tag_iri = _qname_iri(el.tag)
    if tag_iri == RDF + "li":
        tag_iri = st.next_li(id(subj))
    pred = IRI(tag_iri)

    rid = el.get(_RDF_NS + "ID")
    resource = el.get(_RDF_NS + "resource")
    node_id = el.get(_RDF_NS + "nodeID")
    datatype = el.get(_RDF_NS + "datatype")
    parse_type = el.get(_RDF_NS + "parseType")

    prop_attrs = {
        a: v
        for a, v in el.attrib.items()
        if a not in _SYNTAX_ATTRS
        and not a.startswith("{http://www.w3.org/XML/1998/namespace}")
        and a != _RDF_NS + "ID"
    }

    children = list(el)
    text = (el.text or "").strip() if not children else ""

    if parse_type == "Resource":
        inner = st.fresh_bnode()
        st.emit(subj, pred, inner)
        if rid is not None:
            _reify(st, _resolve(base, "#" + rid), subj, pred, inner)
        for child in el:
            _property_element(child, inner, st, lang, base)
        return
    if parse_type == "Collection":
        items = [_node_element(c, st, lang, base) for c in children]
        if not items:
            obj: Term = IRI(RDF + "nil")
            st.emit(subj, pred, obj)
        else:
            cells = [st.fresh_bnode() for _ in items]
            st.emit(subj, pred, cells[0])
            for i, (cell, item) in enumerate(zip(cells, items)):
                st.emit(cell, IRI(RDF + "first"), item)
                nxt: Term = cells[i + 1] if i + 1 < len(cells) else IRI(RDF + "nil")
                st.emit(cell, IRI(RDF + "rest"), nxt)
            obj = cells[0]
        if rid is not None:
            _reify(st, _resolve(base, "#" + rid), subj, pred, obj)
        return
    if parse_type == "Literal":
        xml_text = (el.text or "") + "".join(
            ET.tostring(c, encoding="unicode") for c in children
        )
        obj = Literal(xml_text, datatype=RDF_XMLLITERAL)
        st.emit(subj, pred, obj)
        if rid is not None:
            _reify(st, _resolve(base, "#" + rid), subj, pred, obj)
        return
    if parse_type is not None:
        # spec: any other parseType value is treated as Literal
        obj = Literal((el.text or ""), datatype=RDF_XMLLITERAL)
        st.emit(subj, pred, obj)
        return

    if children:
        if len(children) != 1 or resource is not None or node_id is not None:
            raise RdfXmlError(
                f"property element <{el.tag}> must contain exactly one node element"
            )
        obj = _node_element(children[0], st, lang, base)
        st.emit(subj, pred, obj)
        if rid is not None:
            _reify(st, _resolve(base, "#" + rid), subj, pred, obj)
        return

    if resource is not None or node_id is not None or prop_attrs:
        if resource is not None and node_id is not None:
            raise RdfXmlError("rdf:resource and rdf:nodeID are mutually exclusive")
        if resource is not None:
            obj = IRI(_resolve(base, resource))
        elif node_id is not None:
            obj = st.labeled_bnode(node_id)
        else:
            obj = st.fresh_bnode()
        st.emit(subj, pred, obj)
        # §2.12: property attributes on an (empty) property element
        # describe the object node
        for attr, val in prop_attrs.items():
            if attr == _RDF_NS + "type":
                st.emit(obj, IRI(RDF + "type"), IRI(_resolve(base, val)))
            else:
                st.emit(obj, IRI(_qname_iri(attr)), Literal(val, lang=lang))
        if rid is not None:
            _reify(st, _resolve(base, "#" + rid), subj, pred, obj)
        return

    # literal property element
    if datatype is not None:
        obj = Literal(el.text or "", datatype=datatype)
    else:
        obj = Literal(el.text or "", lang=lang)
    st.emit(subj, pred, obj)
    if rid is not None:
        _reify(st, _resolve(base, "#" + rid), subj, pred, obj)


def parse_rdfxml(text: str, bnode_prefix: str = "rx") -> list[tuple[Term, Term, Term]]:
    """Parse one RDF/XML document → (s, p, o) triples."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as ex:
        raise RdfXmlError(f"not well-formed XML: {ex}") from ex
    st = _State(bnode_prefix)
    lang = root.get(_XML_LANG)
    base = root.get(_XML_BASE)
    if _qname_iri(root.tag) == RDF + "RDF":
        for child in root:
            _node_element(child, st, lang, base)
    else:
        _node_element(root, st, lang, base)
    return st.triples


def rdfxml_to_rows(
    text: str, graph: str | None = None, bnode_prefix: str = "rx"
) -> list[tuple]:
    """Parse RDF/XML → QUAD_SCHEMA rows (driver-side path, mirrors
    ``turtle_to_rows`` / ``jsonld_to_rows``)."""
    return [
        term_to_row(graph, s, p, o)
        for s, p, o in parse_rdfxml(text, bnode_prefix)
    ]


def read_rdfxml(spark, path: str, graph: str | None = None):
    """Whole-document RDF/XML file → quads DataFrame (driver parse — an
    RDF/XML document is a single XML tree, so it cannot byte-range split;
    bulk pipelines should convert to N-Triples/N-Quads for the
    distributed path in sources/datasource.py)."""
    from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA

    with open(path, encoding="utf-8") as f:
        rows = rdfxml_to_rows(f.read(), graph)
    return local_df(spark, rows, QUAD_SCHEMA)
