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


def _load_manifest() -> list[tuple[str, str, str, str]]:
    """manifest.ttl → [(test_id, query_path, data_path, result_path)]."""
    triples = parse_turtle((W3C / "manifest.ttl").read_text())
    by_sp: dict = {}
    for s, p, o in triples:
        by_sp.setdefault(s, {})[p.value] = o
    tests = []
    for s, props in sorted(by_sp.items(), key=lambda kv: str(kv[0])):
        t = props.get(RDF_TYPE)
        if t is None or t.value != MF + "QueryEvaluationTest":
            continue
        action = by_sp[props[MF + "action"]]
        tests.append((
            str(s).rsplit("/", 1)[-1],
            action[QT + "query"].value,
            action[QT + "data"].value,
            props[MF + "result"].value,
        ))
    assert tests, "manifest parsed but no QueryEvaluationTest entries found"
    return tests


def _load_syntax_manifest() -> list[tuple[str, str, bool]]:
    """manifest.ttl → [(test_id, query_path, must_parse)] for the
    Positive/NegativeSyntaxTest11 entries (mf:action is the query IRI
    directly, per the W3C syntax-test manifests)."""
    triples = parse_turtle((W3C / "manifest.ttl").read_text())
    by_sp: dict = {}
    for s, p, o in triples:
        by_sp.setdefault(s, {})[p.value] = o
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


def _row_solution(row, columns):
    b = {}
    for var in columns:
        t = row[var]
        if t is None or t["kind"] is None:
            continue
        if t["kind"] == KIND_IRI:
            b[var] = ("uri", t["lex"])
        elif t["kind"] == KIND_BLANK:
            b[var] = ("bnode",)
        else:
            assert t["kind"] == KIND_LITERAL
            b[var] = ("literal", t["lex"], t["dtype"], t["lang"])
    return frozenset(b.items())


TESTS = _load_manifest()


@pytest.fixture(scope="module")
def w3c_engine(spark):
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    repos: dict = {}

    def repo_for(data_iri: str):
        if data_iri not in repos:
            r = eng.create_repository(
                f"w3c_{Path(data_iri).stem}", ruleset="none"
            )
            r.load_turtle(_rel(data_iri).read_text())
            repos[data_iri] = r
        return repos[data_iri]

    return repo_for


@pytest.mark.parametrize(
    "test_id,query_iri,data_iri,result_iri",
    TESTS,
    ids=[t[0] for t in TESTS],
)
def test_w3c_case(w3c_engine, test_id, query_iri, data_iri, result_iri):
    repo = w3c_engine(data_iri)
    query_text = _rel(query_iri).read_text()
    df = repo.sparql(query_text)
    rows = repo.sparql_collect(query_text)
    got = [_row_solution(r, df.columns) for r in rows]
    want = _srx_solutions(_rel(result_iri))
    if "ORDER BY" in query_text.upper():
        assert got == want
    else:
        assert Counter(got) == Counter(want)


def _load_update_manifest() -> list[tuple[str, str, str, str]]:
    """manifest.ttl → [(test_id, request_path, data_path, result_data)]
    for the UpdateEvaluationTest entries (ut: vocabulary: mf:action has
    ut:request + ut:data, mf:result is a node with the expected ut:data)."""
    triples = parse_turtle((W3C / "manifest.ttl").read_text())
    by_sp: dict = {}
    for s, p, o in triples:
        by_sp.setdefault(s, {})[p.value] = o
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
            result[UT + "data"].value,
        ))
    return tests


UT = "http://www.w3.org/2009/sparql/tests/test-update#"
UPDATE_TESTS = _load_update_manifest()


@pytest.mark.parametrize(
    "test_id,request_iri,data_iri,result_iri",
    UPDATE_TESTS,
    ids=[t[0] for t in UPDATE_TESTS],
)
def test_w3c_update_case(spark, test_id, request_iri, data_iri, result_iri):
    """UPDATE conformance (round 6): load ut:data, apply ut:request, then
    compare the full statement set against the expected graph. Both sides
    are read back through the SAME loader + SELECT * path so term
    normalization is identical by construction."""
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    got_repo = eng.create_repository(f"w3c_u_{test_id}", ruleset="none")
    exp_repo = eng.create_repository(f"w3c_ue_{test_id}", ruleset="none")
    try:
        got_repo.load_turtle(_rel(data_iri).read_text())
        got_repo.update(_rel(request_iri).read_text())
        expected_ttl = _rel(result_iri).read_text()
        has_triples = any(
            line.strip() and not line.strip().startswith(("@prefix", "#"))
            for line in expected_ttl.splitlines()
        )
        if has_triples:  # prefix-only document = expected graph is empty
            exp_repo.load_turtle(expected_ttl)
        q = "SELECT ?s ?p ?o WHERE { ?s ?p ?o }"

        def solutions(repo):
            df = repo.sparql(q)
            return Counter(
                _row_solution(r, df.columns) for r in repo.sparql_collect(q)
            )

        assert solutions(got_repo) == solutions(exp_repo)
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
