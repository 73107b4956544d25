"""W3C SPARQL 1.1 conformance slice (SURVEY §5 item 4).

A DAWG-style manifest runner over the vendored corpus in ``tests/w3c/``:
``manifest.ttl`` (mf/qt vocabulary, parsed with our own Turtle reader)
lists QueryEvaluationTests; each loads its ``qt:data`` graph, runs the
``qt:query`` file through the engine, and compares against the
``mf:result`` SPARQL-results-XML document — as a multiset of solution
mappings, or as an ordered list when the query has ORDER BY. The cases
reproduce the public spec's algebra examples: OPTIONAL scoping
(well-designed patterns), MINUS vs NOT EXISTS (§8.3), FILTER 3-valued
error semantics (§17.2), and the ORDER BY term total order (§15.1).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections import Counter
from pathlib import Path

import pytest

from dublin_smart_city_graphdb_spark.model.schema import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
)
from dublin_smart_city_graphdb_spark.sources.turtle import parse_turtle

W3C = Path(__file__).parent / "w3c"
MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
QT = "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SRNS = "{http://www.w3.org/2005/sparql-results#}"
XMLLANG = "{http://www.w3.org/XML/1998/namespace}lang"


RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"


# Driver-window hygiene (round 12, VERDICT r11 item 6): W3C conformance matrix (462 cases) —
# slow-gate class, excluded from the default suite so the driver's
# verify completes inside its window; run with `-m slow` (the round
# close does).
pytestmark = pytest.mark.slow


def _manifest_maps():
    """manifest.ttl → (single-valued s→{p: o}, multi-valued s→{p: [o,...]})."""
    triples = parse_turtle((W3C / "manifest.ttl").read_text())
    by_sp: dict = {}
    multi: dict = {}
    for s, p, o in triples:
        by_sp.setdefault(s, {})[p.value] = o
        multi.setdefault(s, {}).setdefault(p.value, []).append(o)
    return by_sp, multi


def _graph_data(by_sp, multi, node, ns: str) -> tuple[tuple[str, str], ...]:
    """Collect ``<ns>graphData`` entries of an action/result node:
    each is a bnode with ``<ns>graph <file>`` + ``rdfs:label "graph-iri"``
    (the convention of the public W3C manifests)."""
    out = []
    for gd in multi.get(node, {}).get(ns + "graphData", []):
        props = by_sp[gd]
        out.append((props[ns + "graph"].value, props[RDFS_LABEL].lex))
    return tuple(sorted(out))


def _load_manifest() -> list[tuple[str, str, str, tuple, str, str]]:
    """manifest.ttl → [(test_id, query, data, graph_data, result,
    entailment_regime)]. ``qt:entailmentRegime "RDFS"`` on the action
    evaluates the query against a repository with the corresponding
    ruleset materialized (SPARQL 1.1 Entailment Regimes — GraphDB's
    query-under-inference surface); absent means simple entailment."""
    by_sp, multi = _manifest_maps()
    tests = []
    for s, props in sorted(by_sp.items(), key=lambda kv: str(kv[0])):
        t = props.get(RDF_TYPE)
        if t is None or t.value != MF + "QueryEvaluationTest":
            continue
        action = by_sp[props[MF + "action"]]
        regime = action.get(QT + "entailmentRegime")
        tests.append((
            str(s).rsplit("/", 1)[-1],
            action[QT + "query"].value,
            action[QT + "data"].value,
            _graph_data(by_sp, multi, props[MF + "action"], QT),
            props[MF + "result"].value,
            regime.lex if regime is not None else "",
        ))
    assert tests, "manifest parsed but no QueryEvaluationTest entries found"
    return tests


def _load_syntax_manifest() -> list[tuple[str, str, bool]]:
    """manifest.ttl → [(test_id, query_path, must_parse)] for the
    Positive/NegativeSyntaxTest11 entries (mf:action is the query IRI
    directly, per the W3C syntax-test manifests)."""
    by_sp, _ = _manifest_maps()
    tests = []
    for s, props in sorted(by_sp.items(), key=lambda kv: str(kv[0])):
        t = props.get(RDF_TYPE)
        if t is None:
            continue
        if t.value == MF + "PositiveSyntaxTest11":
            ok = True
        elif t.value == MF + "NegativeSyntaxTest11":
            ok = False
        else:
            continue
        tests.append((
            str(s).rsplit("/", 1)[-1], props[MF + "action"].value, ok,
        ))
    return tests


def _rel(iri: str) -> Path:
    # manifest-relative IRIs resolve against the manifest directory
    return W3C / iri.rsplit("w3c/", 1)[-1].lstrip("/")


def _srx_solutions(path: Path):
    """results-XML → list of frozenset((var, term-tuple))."""
    root = ET.fromstring(path.read_text())
    sols = []
    for res in root.iter(f"{SRNS}result"):
        b = {}
        for binding in res.findall(f"{SRNS}binding"):
            var, term = binding.get("name"), binding[0]
            tag = term.tag.rsplit("}", 1)[-1]
            if tag == "uri":
                b[var] = ("uri", term.text or "")
            elif tag == "bnode":
                b[var] = ("bnode",)  # label-agnostic (bnode isomorphism)
            else:
                b[var] = (
                    "literal", term.text or "",
                    term.get("datatype"), term.get(XMLLANG),
                )
        sols.append(frozenset(b.items()))
    return sols


def _srx_boolean(path: Path):
    """results-XML → True/False for ASK results, None for SELECT results."""
    root = ET.fromstring(path.read_text())
    node = root.find(f"{SRNS}boolean")
    return None if node is None else node.text.strip() == "true"


def _term_tuple(t):
    if t["kind"] == KIND_IRI:
        return ("uri", t["lex"])
    if t["kind"] == KIND_BLANK:
        return ("bnode",)
    assert t["kind"] == KIND_LITERAL
    return ("literal", t["lex"], t["dtype"], t["lang"])


def _row_solution(row, columns):
    b = {}
    for var in columns:
        t = row[var]
        if t is None or t["kind"] is None:
            continue
        b[var] = _term_tuple(t)
    return frozenset(b.items())


def _parsed_term_tuple(term):
    """Turtle-parser term → the same label-agnostic tuple as _term_tuple."""
    from dublin_smart_city_graphdb_spark.model.terms import BNode, IRI, Literal

    if isinstance(term, IRI):
        return ("uri", term.value)
    if isinstance(term, BNode):
        return ("bnode",)
    assert isinstance(term, Literal)
    return ("literal", term.lex, term.datatype, term.lang)


def _expected_graph(path: Path) -> Counter:
    """Expected-result Turtle graph → Counter of label-agnostic triples."""
    return Counter(
        tuple(_parsed_term_tuple(t) for t in triple)
        for triple in parse_turtle(path.read_text())
    )


TESTS = _load_manifest()


@pytest.fixture(scope="module")
def w3c_engine(spark):
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    repos: dict = {}

    rulesets = {
        "": "none",
        "RDFS": "rdfsplus",
        "OWL-Horst": "owl-horst",
        "OWL2-RL": "owl2-rl",
    }

    def repo_for(data_iri: str, graph_data: tuple = (), regime: str = ""):
        key = (data_iri, graph_data, regime)
        if key not in repos:
            r = eng.create_repository(
                f"w3c_{Path(data_iri).stem}_{len(repos)}",
                ruleset=rulesets[regime],
            )
            r.load_turtle(_rel(data_iri).read_text())
            for file_iri, graph_iri in graph_data:
                r.load_turtle(_rel(file_iri).read_text(), graph=graph_iri)
            repos[key] = r
        return repos[key]

    return repo_for


@pytest.mark.parametrize(
    "test_id,query_iri,data_iri,graph_data,result_iri,regime",
    TESTS,
    ids=[t[0] for t in TESTS],
)
def test_w3c_case(w3c_engine, test_id, query_iri, data_iri, graph_data,
                  result_iri, regime):
    repo = w3c_engine(data_iri, graph_data, regime)
    query_text = _rel(query_iri).read_text()
    df = repo.sparql(query_text)
    rows = repo.sparql_collect(query_text)
    if result_iri.endswith(".ttl"):
        # CONSTRUCT (s/p/o term structs) or DESCRIBE (flat quad columns):
        # compare as a label-agnostic RDF graph
        if "o_kind" in df.columns:
            got = Counter(
                (
                    ("bnode",) if r["s"].startswith("_:")
                    else ("uri", r["s"]),
                    ("uri", r["p"]),
                    ("uri", r["o_lex"]) if r["o_kind"] == KIND_IRI
                    else ("bnode",) if r["o_kind"] == KIND_BLANK
                    else ("literal", r["o_lex"], r["o_dtype"], r["o_lang"]),
                )
                for r in rows
            )
        else:
            assert df.columns == ["s", "p", "o"]
            got = Counter(
                (_term_tuple(r["s"]), _term_tuple(r["p"]),
                 _term_tuple(r["o"]))
                for r in rows
            )
        assert got == _expected_graph(_rel(result_iri))
        return
    boolean = _srx_boolean(_rel(result_iri))
    if boolean is not None:  # ASK form
        assert df.columns == ["ask"]
        assert rows[0]["ask"] is boolean
        return
    got = [_row_solution(r, df.columns) for r in rows]
    want = _srx_solutions(_rel(result_iri))
    if "ORDER BY" in query_text.upper():
        assert got == want
    else:
        assert Counter(got) == Counter(want)


def _load_update_manifest() -> list[tuple[str, str, str, tuple, str, tuple]]:
    """manifest.ttl → [(test_id, request, data, graph_data, result_data,
    result_graph_data)] for the UpdateEvaluationTest entries (ut:
    vocabulary: mf:action has ut:request + ut:data + ut:graphData*,
    mf:result is a node with the expected ut:data + ut:graphData*)."""
    by_sp, multi = _manifest_maps()
    tests = []
    for s, props in sorted(by_sp.items(), key=lambda kv: str(kv[0])):
        t = props.get(RDF_TYPE)
        if t is None or t.value != MF + "UpdateEvaluationTest":
            continue
        action = by_sp[props[MF + "action"]]
        result = by_sp[props[MF + "result"]]
        tests.append((
            str(s).rsplit("/", 1)[-1],
            action[UT + "request"].value,
            action[UT + "data"].value,
            _graph_data(by_sp, multi, props[MF + "action"], UT),
            result[UT + "data"].value,
            _graph_data(by_sp, multi, props[MF + "result"], UT),
        ))
    return tests


UT = "http://www.w3.org/2009/sparql/tests/test-update#"
UPDATE_TESTS = _load_update_manifest()


def _load_dataset(repo, data_iri: str, graph_data: tuple) -> None:
    ttl = _rel(data_iri).read_text()
    has_triples = any(
        line.strip() and not line.strip().startswith(("@prefix", "#"))
        for line in ttl.splitlines()
    )
    if has_triples:  # prefix-only document = graph is empty
        repo.load_turtle(ttl)
    for file_iri, graph_iri in graph_data:
        repo.load_turtle(_rel(file_iri).read_text(), graph=graph_iri)


def _quad_multiset(repo) -> Counter:
    """Repository → Counter of label-agnostic (g, s, p, o) quads, so the
    comparison checks GRAPH PLACEMENT, not just the union of statements."""
    rows = repo.quads.collect()
    out: Counter = Counter()
    for r in rows:
        s = ("bnode",) if r["s"].startswith("_:") else ("uri", r["s"])
        if r["o_kind"] == KIND_IRI:
            o = ("uri", r["o_lex"])
        elif r["o_kind"] == KIND_BLANK:
            o = ("bnode",)
        else:
            o = ("literal", r["o_lex"], r["o_dtype"], r["o_lang"])
        out[(r["g"], s, ("uri", r["p"]), o)] += 1
    return out


@pytest.mark.parametrize(
    "test_id,request_iri,data_iri,graph_data,result_iri,result_graph_data",
    UPDATE_TESTS,
    ids=[t[0] for t in UPDATE_TESTS],
)
def test_w3c_update_case(spark, test_id, request_iri, data_iri, graph_data,
                         result_iri, result_graph_data):
    """UPDATE conformance (round 6): load ut:data (+ named ut:graphData),
    apply ut:request, then compare the full QUAD set against the expected
    dataset. Both sides are read back through the SAME loader so term
    normalization is identical by construction."""
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    got_repo = eng.create_repository(f"w3c_u_{test_id}", ruleset="none")
    exp_repo = eng.create_repository(f"w3c_ue_{test_id}", ruleset="none")
    try:
        _load_dataset(got_repo, data_iri, graph_data)
        got_repo.update(_rel(request_iri).read_text())
        _load_dataset(exp_repo, result_iri, result_graph_data)
        assert _quad_multiset(got_repo) == _quad_multiset(exp_repo)
    finally:
        eng.drop_repository(f"w3c_u_{test_id}")
        eng.drop_repository(f"w3c_ue_{test_id}")


SYNTAX_TESTS = _load_syntax_manifest()


@pytest.mark.parametrize(
    "test_id,query_iri,must_parse",
    SYNTAX_TESTS,
    ids=[t[0] for t in SYNTAX_TESTS],
)
def test_w3c_syntax_case(test_id, query_iri, must_parse):
    """Grammar strictness slice: PositiveSyntaxTest11 queries must parse,
    NegativeSyntaxTest11 queries must be rejected (no engine needed)."""
    from dublin_smart_city_graphdb_spark.sparql.parser import parse_query

    text = _rel(query_iri).read_text()
    if must_parse:
        parse_query(text)
    else:
        with pytest.raises(Exception):
            parse_query(text)
