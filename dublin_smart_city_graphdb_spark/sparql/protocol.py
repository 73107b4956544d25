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
    if t["kind"] == 3:  # RDF-star quoted triple (CG results-JSON shape)
        return {"type": "triple", "value": t["lex"]}
    out: dict = {"type": "literal", "value": t["lex"]}
    if t["lang"]:
        out["xml:lang"] = t["lang"]
    elif t["dtype"]:
        out["datatype"] = t["dtype"]
    return out


def row_binding(columns: list[str], row) -> dict:
    """One SELECT solution row → its results-JSON binding object
    (unbound vars are simply absent, per spec)."""
    b = {}
    for var in columns:
        tj = _term_json(row[var])
        if tj is not None:
            b[var] = tj
    return b


def rows_to_json(columns: list[str], rows: list) -> dict:
    """SELECT solutions → SPARQL-results-JSON document."""
    if columns == ["ask"]:  # ASK form (engine returns a single boolean col)
        return {"head": {}, "boolean": bool(rows[0]["ask"])}
    return {
        "head": {"vars": list(columns)},
        "results": {"bindings": [row_binding(columns, r) for r in rows]},
    }


def select_result_chunks(df: DataFrame, batch_rows: int = 1024):
    """SELECT-result DataFrame → iterator of results-JSON text chunks, or
    None for the ASK form (single boolean row — buffered is correct).
    Concatenated chunks are byte-identical to
    ``json.dumps(rows_to_json(df.columns, df.collect()))``, but rows
    arrive through ``toLocalIterator`` — one partition resident on the
    driver at a time. Shared by the main query endpoint
    (``Repository.sparql_result_chunks``) and the RDF4J transaction QUERY
    route (VERDICT r8 task 3: that route used to ``collect()`` the whole
    result on the driver, uncapped)."""
    import json as _json

    cols = list(df.columns)
    if cols == ["ask"]:
        return None

    def gen():
        yield (
            '{"head": {"vars": %s}, "results": {"bindings": ['
            % _json.dumps(cols)
        )
        first = True
        buf: list[str] = []
        for row in df.toLocalIterator():
            buf.append(_json.dumps(row_binding(cols, row)))
            if len(buf) >= batch_rows:
                yield ("" if first else ", ") + ", ".join(buf)
                first, buf = False, []
        if buf:
            yield ("" if first else ", ") + ", ".join(buf)
        yield "]}}"

    return gen()


def _nt_escape(col) -> "F.Column":
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", "\\\\n")
    out = F.regexp_replace(out, "\r", "\\\\r")
    out = F.regexp_replace(out, "\t", "\\\\t")
    return out


def _term_nt(t) -> "F.Column":
    """Term struct column → N-Triples lexical form (executor-side)."""
    lit = F.concat(F.lit('"'), _nt_escape(t["lex"]), F.lit('"'))
    lit = (
        F.when(t["lang"].isNotNull(), F.concat(lit, F.lit("@"), t["lang"]))
        .when(
            t["dtype"].isNotNull(),
            F.concat(lit, F.lit("^^<"), t["dtype"], F.lit(">")),
        )
        .otherwise(lit)
    )
    return (
        F.when(t["kind"] == KIND_IRI, F.concat(F.lit("<"), t["lex"], F.lit(">")))
        .when(t["kind"] == KIND_BLANK, t["lex"])  # stored with _: prefix
        .when(t["kind"] == 3, t["lex"])  # RDF-star: lex IS the << ... >> text
        .otherwise(lit)
    )


def construct_to_ntriples(df: DataFrame) -> DataFrame:
    """CONSTRUCT result (s/p/o term-struct columns) → one N-Triples line per
    statement, serialized on executors — the distributed export twin of the
    ingestion parser (round-trips through ``parse_ntriples_lines``)."""
    return df.select(
        F.concat_ws(
            " ", _term_nt(F.col("s")), _term_nt(F.col("p")), _term_nt(F.col("o")),
            F.lit("."),
        ).alias("value")
    )


def line_chunk_iter(
    lines: DataFrame, batch_rows: int = 1024,
    head: str | None = None, tail: str | None = None,
) -> "Iterator[str]":
    """One-column line DataFrame → iterator of newline-terminated text
    chunks via ``toLocalIterator`` — one partition resident on the driver
    at a time, so a 10^8-line export never sits in driver memory as one
    string (VERDICT r7 task 1: the graph-export twin of
    ``Repository.sparql_result_chunks``). Concatenating the chunks is
    byte-identical to ``"\\n".join(values) + "\\n"`` (empty input → empty
    body); ``head``/``tail`` bracket the body for framed formats
    (RDF/XML)."""
    def gen():
        if head is not None:
            yield head + "\n"
        buf: list[str] = []
        for row in lines.toLocalIterator():
            buf.append(row["value"])
            if len(buf) >= batch_rows:
                yield "\n".join(buf) + "\n"
                buf = []
        if buf:
            yield "\n".join(buf) + "\n"
        if tail is not None:
            yield tail + "\n"

    return gen()


def _quad_spo_cols() -> tuple["F.Column", "F.Column", "F.Column"]:
    """Executor-side N-Triples serializations of a quads row's s/p/o."""
    subj = F.when(
        F.col("s").startswith("_:"), F.col("s")
    ).otherwise(F.concat(F.lit("<"), F.col("s"), F.lit(">")))
    pred = F.concat(F.lit("<"), F.col("p"), F.lit(">"))
    lit = F.concat(F.lit('"'), _nt_escape(F.col("o_lex")), F.lit('"'))
    lit = (
        F.when(F.col("o_lang").isNotNull(), F.concat(lit, F.lit("@"), F.col("o_lang")))
        .when(
            F.col("o_dtype").isNotNull(),
            F.concat(lit, F.lit("^^<"), F.col("o_dtype"), F.lit(">")),
        )
        .otherwise(lit)
    )
    obj = (
        F.when(F.col("o_kind") == KIND_IRI,
               F.concat(F.lit("<"), F.col("o_lex"), F.lit(">")))
        .when(F.col("o_kind") == KIND_BLANK, F.col("o_lex"))
        .otherwise(lit)
    )
    return subj, pred, obj


def quads_to_ntriples(quads: DataFrame) -> DataFrame:
    """Quads-table rows → N-Triples lines (default + named graphs flattened;
    use a ``g`` filter first for a graph-scoped export)."""
    subj, pred, obj = _quad_spo_cols()
    return quads.select(
        F.concat_ws(" ", subj, pred, obj, F.lit(".")).alias("value")
    )


def quads_to_nquads(quads: DataFrame) -> DataFrame:
    """Quads-table rows → N-Quads lines: named-graph statements carry their
    ``<g>`` label as the 4th term, default-graph statements serialize as
    plain triples (round-trips through the N-Quads reader)."""
    subj, pred, obj = _quad_spo_cols()
    gterm = F.when(
        F.col("g").isNotNull(), F.concat(F.lit("<"), F.col("g"), F.lit(">"))
    )
    # concat_ws skips NULL columns → default-graph rows get no 4th term
    return quads.select(
        F.concat_ws(" ", subj, pred, obj, gterm, F.lit(".")).alias("value")
    )


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


# ---------------------------------------------------------------------------
# W3C "SPARQL 1.1 Query Results CSV and TSV Formats" (SELECT serialization;
# the other Accept types GraphDB-compatible endpoints serve next to JSON)
# ---------------------------------------------------------------------------

def _bnode_label(lex: str) -> str:
    return lex if lex.startswith("_:") else f"_:{lex}"


def _term_csv(t) -> str:
    """CSV term value: IRIs bare, blank nodes ``_:label``, literals their
    lexical form only (no quotes/datatype/lang) — per the CSV results spec."""
    if t is None or t["kind"] is None:
        return ""
    if t["kind"] == KIND_BLANK:
        return _bnode_label(t["lex"])
    return t["lex"] or ""


def _csv_field(v: str) -> str:
    if any(c in v for c in (',', '"', "\n", "\r")):
        return '"' + v.replace('"', '""') + '"'
    return v


def rows_to_csv(columns: list[str], rows: list) -> str:
    """SELECT solutions → results-CSV document (RFC 4180 quoting, CRLF)."""
    if columns == ["ask"]:  # ASK: single true/false value (not spec'd; GraphDB-style)
        return "ask\r\n%s\r\n" % ("true" if rows[0]["ask"] else "false")
    out = [",".join(_csv_field(c) for c in columns)]
    for r in rows:
        out.append(",".join(_csv_field(_term_csv(r[var])) for var in columns))
    return "\r\n".join(out) + "\r\n"


def _tsv_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace('"', '\\"')
    )


def _term_tsv(t) -> str:
    """TSV term value: full SPARQL syntax — ``<iri>``, ``_:b``, quoted
    literal with ``@lang`` / ``^^<dtype>``."""
    if t is None or t["kind"] is None:
        return ""
    if t["kind"] == KIND_IRI:
        return f"<{t['lex']}>"
    if t["kind"] == KIND_BLANK:
        return _bnode_label(t["lex"])
    lit = f'"{_tsv_escape(t["lex"])}"'
    if t["lang"]:
        return f"{lit}@{t['lang']}"
    if t["dtype"]:
        return f"{lit}^^<{t['dtype']}>"
    return lit


def rows_to_tsv(columns: list[str], rows: list) -> str:
    """SELECT solutions → results-TSV document (vars prefixed ``?``)."""
    if columns == ["ask"]:
        return "?ask\n%s\n" % ("true" if rows[0]["ask"] else "false")
    out = ["\t".join(f"?{c}" for c in columns)]
    for r in rows:
        out.append("\t".join(_term_tsv(r[var]) for var in columns))
    return "\n".join(out) + "\n"


# ---------------------------------------------------------------------------
# W3C "SPARQL Query Results XML Format (Second Edition)" — the protocol's
# default serialization, served by the reference endpoint (README.md:63-65)
# ---------------------------------------------------------------------------

_SPARQL_RESULTS_NS = "http://www.w3.org/2005/sparql-results#"


def _term_xml(t) -> str | None:
    """Binding struct Row → ``<uri>``/``<bnode>``/``<literal>`` element."""
    from xml.sax.saxutils import escape, quoteattr

    if t is None or t["kind"] is None:
        return None
    if t["kind"] == KIND_IRI:
        return f"<uri>{escape(t['lex'])}</uri>"
    if t["kind"] == KIND_BLANK:
        lex = t["lex"]
        label = lex[2:] if lex.startswith("_:") else lex
        return f"<bnode>{escape(label)}</bnode>"
    attrs = ""
    if t["lang"]:
        attrs = f" xml:lang={quoteattr(t['lang'])}"
    elif t["dtype"]:
        attrs = f" datatype={quoteattr(t['dtype'])}"
    return f"<literal{attrs}>{escape(t['lex'] or '')}</literal>"


def rows_to_xml(columns: list[str], rows: list) -> str:
    """SELECT/ASK solutions → SPARQL-results-XML document."""
    from xml.sax.saxutils import quoteattr

    out = [
        '<?xml version="1.0"?>',
        f'<sparql xmlns="{_SPARQL_RESULTS_NS}">',
    ]
    if columns == ["ask"]:  # ASK form
        val = "true" if rows[0]["ask"] else "false"
        out += ["<head/>", f"<boolean>{val}</boolean>", "</sparql>"]
        return "\n".join(out) + "\n"
    out.append(
        "<head>"
        + "".join(f"<variable name={quoteattr(v)}/>" for v in columns)
        + "</head>"
    )
    out.append("<results>")
    for r in rows:
        parts = ["<result>"]
        for var in columns:
            tx = _term_xml(r[var])
            if tx is not None:  # unbound vars are simply absent (spec)
                parts.append(f"<binding name={quoteattr(var)}>{tx}</binding>")
        parts.append("</result>")
        out.append("".join(parts))
    out += ["</results>", "</sparql>"]
    return "\n".join(out) + "\n"


# -- RDF/XML + TriG export (GSP GET content negotiation) ---------------------

def _xml_escape(col) -> "F.Column":
    """XML content/attribute escaping, executor-side."""
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    out = F.regexp_replace(out, '"', "&quot;")
    return out


RDFXML_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
)
RDFXML_FOOTER = "</rdf:RDF>"


def quads_to_rdfxml_fragments(quads: DataFrame) -> DataFrame:
    """Quads-table rows → one ``<rdf:Description …>…</rdf:Description>``
    fragment per statement, serialized on executors. Each property element
    declares its namespace inline (``xmlns:ns0``), so no global prefix
    table is needed and the writer stays a single distributed map; the
    predicate splits at the longest trailing NCName run — statements whose
    predicate has no XML-expressible local name produce NULL fragments the
    caller must check (RDF/XML genuinely cannot express them; the
    N-Triples route always can). Wrap with RDFXML_HEADER/FOOTER."""
    local = F.regexp_extract(F.col("p"), r"([A-Za-z_][A-Za-z0-9_.\-]*)$", 1)
    ns = F.col("p").substr(F.lit(1), F.length(F.col("p")) - F.length(local))
    subj_attr = F.when(
        F.col("s").startswith("_:"),
        F.concat(F.lit('rdf:nodeID="'),
                 _xml_escape(F.col("s").substr(F.lit(3), F.length("s"))),
                 F.lit('"')),
    ).otherwise(
        F.concat(F.lit('rdf:about="'), _xml_escape(F.col("s")), F.lit('"'))
    )
    open_tag = F.concat(
        F.lit("ns0:"), local, F.lit(' xmlns:ns0="'), _xml_escape(ns),
        F.lit('"'),
    )
    obj = (
        F.when(
            F.col("o_kind") == 0,
            F.concat(F.lit('<'), open_tag, F.lit(' rdf:resource="'),
                     _xml_escape(F.col("o_lex")), F.lit('"/>')),
        )
        .when(
            F.col("o_kind") == 1,
            F.concat(F.lit('<'), open_tag, F.lit(' rdf:nodeID="'),
                     _xml_escape(F.col("o_lex").substr(F.lit(3),
                                                       F.length("o_lex"))),
                     F.lit('"/>')),
        )
        .otherwise(
            F.concat(
                F.lit('<'), open_tag,
                F.when(
                    F.col("o_lang").isNotNull(),
                    F.concat(F.lit(' xml:lang="'), F.col("o_lang"),
                             F.lit('"')),
                ).when(
                    F.col("o_dtype").isNotNull(),
                    F.concat(F.lit(' rdf:datatype="'),
                             _xml_escape(F.col("o_dtype")), F.lit('"')),
                ).otherwise(F.lit("")),
                F.lit('>'), _xml_escape(F.col("o_lex")),
                F.lit('</ns0:'), local, F.lit('>'),
            )
        )
    )
    frag = F.concat(
        F.lit('  <rdf:Description '), subj_attr, F.lit('>'),
        obj, F.lit('</rdf:Description>'),
    )
    return quads.select(
        F.when(local != "", frag).alias("value")
    )


def quads_to_trig_lines(quads: DataFrame) -> DataFrame:
    """Quads-table rows → TriG lines: default-graph statements serialize
    bare, named-graph statements as single-statement ``GRAPH <g> { … }``
    blocks — TriG allows a label to recur across blocks, so the export
    stays one distributed map with no grouping shuffle (round-trips
    through the TriG reader)."""
    subj, pred, obj = _quad_spo_cols()
    stmt = F.concat_ws(" ", subj, pred, obj, F.lit("."))
    # graph labels imported from TriG can be blank nodes (stored as
    # '_:label'): emit the bare label — GRAPH <_:x> is not a valid IRIREF
    label = F.when(
        F.col("g").startswith("_:"), F.col("g")
    ).otherwise(F.concat(F.lit("<"), F.col("g"), F.lit(">")))
    return quads.select(
        F.when(
            F.col("g").isNull(), stmt
        ).otherwise(
            F.concat(F.lit("GRAPH "), label, F.lit(" { "), stmt,
                     F.lit(" }"))
        ).alias("value")
    )


#: Driver-side JSON-LD assembly is bounded: the flattened document
#: interleaves graphs/subjects under global sort keys, so it cannot reuse
#: the line-streaming path. Exports past this cap must use the
#: distributed dump formats (N-Quads/TriG via Repository.dump or the
#: streamed statements GET) — the documented redirect, mirroring how
#: GraphDB bounds its JSON-LD writer buffers.
JSONLD_EXPORT_CAP = 1_000_000


def quads_to_jsonld(quads: DataFrame, max_quads: int | None = None) -> str:
    """Quads-table rows → a JSON-LD 1.1 document string (flattened node
    objects, no context). Default-graph nodes sit directly in the
    top-level ``@graph``; each named graph becomes an
    ``{"@id": g, "@graph": [...]}`` entry. Literals map to ``@value``
    (+``@language`` / non-xsd:string ``@type``); IRIs and blank nodes to
    ``{"@id": ...}``. Output is deterministic (graphs, subjects,
    predicates, and values all sorted), so exports are byte-stable
    across partitionings, and round-trips through sources/jsonld.py's
    reader. RDF-star quoted triples have no standard JSON-LD encoding
    and raise. Driver-side assembly — the protocol-response contract
    shared with the other graph exporters (bounded HTTP bodies; bulk
    egress uses the distributed NDJSON/N-Quads paths)."""
    import json

    XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
    proj = quads.select(
        "g", "s", "p", "o_kind", "o_lex", "o_dtype", "o_lang"
    )
    if max_quads is not None:
        rows = proj.limit(max_quads + 1).collect()
        if len(rows) > max_quads:
            raise ValueError(
                f"jsonld export: more than {max_quads} statements — "
                "driver-side JSON-LD assembly is capped; use the "
                "distributed dump path (N-Quads/TriG) for bulk egress"
            )
    else:
        rows = proj.collect()
    tree: dict = {}
    for r in rows:
        if r["o_kind"] == 3:
            raise ValueError(
                "jsonld export: RDF-star quoted triples have no JSON-LD "
                "serialization; request N-Quads or TriG"
            )
        if r["o_kind"] == KIND_LITERAL:
            obj: dict = {"@value": r["o_lex"]}
            if r["o_lang"]:
                obj["@language"] = r["o_lang"]
            elif r["o_dtype"] and r["o_dtype"] != XSD_STRING:
                obj["@type"] = r["o_dtype"]
        else:
            obj = {"@id": r["o_lex"]}
        tree.setdefault(r["g"], {}).setdefault(r["s"], {}).setdefault(
            r["p"], []
        ).append(obj)

    def nodes(subjects: dict) -> list:
        out = []
        for s in sorted(subjects):
            node = {"@id": s}
            for p in sorted(subjects[s]):
                vals = subjects[s][p]
                node[p] = sorted(vals, key=lambda v: json.dumps(
                    v, sort_keys=True))
            out.append(node)
        return out

    top = nodes(tree.get(None, {}))
    for g in sorted(k for k in tree if k is not None):
        top.append({"@id": g, "@graph": nodes(tree[g])})
    return json.dumps({"@graph": top}, indent=1, sort_keys=False)
