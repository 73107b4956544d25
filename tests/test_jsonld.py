"""JSON-LD ingest (S1): expanded/flattened/compact forms, value typing,
lists, named graphs, the distributed NDJSON-LD path, and the REST
``application/ld+json`` upload surface the reference endpoint accepts."""

from __future__ import annotations

import json

import pytest

from dublin_smart_city_graphdb_spark.model.terms import (
    RDF,
    XSD,
    BNode,
    IRI,
    Literal,
)
from dublin_smart_city_graphdb_spark.sources.jsonld import (
    JsonLdError,
    parse_jsonld,
)

EX = "http://example.org/"


def triples(text):
    return {(g, s, p, o) for g, s, p, o in parse_jsonld(text)}


def test_expanded_form_node_objects():
    doc = json.dumps([
        {
            "@id": EX + "alice",
            "@type": [EX + "Person"],
            EX + "name": [{"@value": "Alice"}],
            EX + "age": [{"@value": 30}],
        }
    ])
    got = triples(doc)
    s = IRI(EX + "alice")
    assert (None, s, IRI(RDF + "type"), IRI(EX + "Person")) in got
    assert (None, s, IRI(EX + "name"), Literal("Alice")) in got
    assert (None, s, IRI(EX + "age"), Literal("30", XSD + "integer")) in got


def test_compact_form_with_context():
    doc = json.dumps({
        "@context": {
            "name": EX + "name",
            "knows": {"@id": EX + "knows", "@type": "@id"},
            "ex": EX,
            "@base": "http://base.org/",
        },
        "@id": "alice",
        "@type": "ex:Person",
        "name": "Alice",
        "knows": "bob",
    })
    got = triples(doc)
    s = IRI("http://base.org/alice")
    assert (None, s, IRI(RDF + "type"), IRI(EX + "Person")) in got
    assert (None, s, IRI(EX + "name"), Literal("Alice")) in got
    assert (None, s, IRI(EX + "knows"), IRI("http://base.org/bob")) in got


def test_vocab_language_and_typed_values():
    doc = json.dumps({
        "@context": {"@vocab": EX, "@language": "en"},
        "@id": EX + "x",
        "label": "hello",
        "temp": {"@value": "3.14", "@type": "xsd:double"},
        "greeting": {"@value": "bonjour", "@language": "fr"},
        "flag": True,
        "score": 2.5,
    })
    got = {(p.value, o) for _, _, p, o in triples(doc)}
    assert (EX + "label", Literal("hello", None, "en")) in got
    assert (EX + "greeting", Literal("bonjour", None, "fr")) in got
    assert (EX + "flag", Literal("true", XSD + "boolean")) in got
    # JSON double → canonical exponent form, xsd:double
    assert any(
        p == EX + "score" and o.datatype == XSD + "double" for p, o in got
    )


def test_nested_nodes_allocate_bnodes():
    doc = json.dumps({
        "@id": EX + "order1",
        EX + "item": [{EX + "sku": [{"@value": "A-1"}]}],
    })
    got = list(parse_jsonld(doc))
    nested = [o for _, _, p, o in got if p.value == EX + "item"]
    assert len(nested) == 1 and isinstance(nested[0], BNode)
    assert any(
        s == nested[0] and p.value == EX + "sku" for _, s, p, _ in got
    )


def test_list_expands_to_rdf_chain():
    doc = json.dumps({
        "@id": EX + "s",
        EX + "steps": [{"@list": [{"@value": 1}, {"@value": 2}]}],
    })
    got = list(parse_jsonld(doc))
    firsts = [(s, o) for _, s, p, o in got if p.value == RDF + "first"]
    rests = [(s, o) for _, s, p, o in got if p.value == RDF + "rest"]
    assert [o.lex for _, o in firsts] == ["1", "2"]
    assert rests[-1][1] == IRI(RDF + "nil")


def test_flattened_graph_and_named_graph():
    doc = json.dumps({
        "@graph": [
            {"@id": EX + "a", EX + "p": [{"@value": "x"}]},
            {
                "@id": EX + "g1",
                "@graph": [{"@id": EX + "b", EX + "p": [{"@value": "y"}]}],
            },
        ]
    })
    got = triples(doc)
    assert (None, IRI(EX + "a"), IRI(EX + "p"), Literal("x")) in got
    assert (EX + "g1", IRI(EX + "b"), IRI(EX + "p"), Literal("y")) in got


def test_unsupported_keywords_raise():
    with pytest.raises(JsonLdError, match="@reverse"):
        parse_jsonld(json.dumps({"@id": EX + "x", "@reverse": {}}))
    with pytest.raises(JsonLdError, match="remote @context"):
        parse_jsonld(json.dumps({"@context": "http://remote/ctx"}))


def test_distributed_ndjsonld_matches_driver_parse(spark, tmp_path):
    from dublin_smart_city_graphdb_spark.sources.jsonld import (
        read_jsonld_distributed,
    )

    lines = [
        json.dumps({"@id": EX + f"n{i}", EX + "v": [{"@value": i}],
                    EX + "child": [{EX + "leaf": [{"@value": "z"}]}]})
        for i in range(20)
    ]
    p = tmp_path / "bulk.ndjsonld"
    p.write_text("\n".join(lines) + "\n")
    df = read_jsonld_distributed(spark, str(p))
    rows = df.collect()
    # 20 nodes × (v + child + leaf) = 60 statements
    assert len(rows) == 60
    # bnode labels are line-scoped: no collisions across lines
    bnodes = {r.o_lex for r in rows if r.o_kind == 1}
    assert len(bnodes) == 20


def test_engine_jsonld_roundtrip_and_http_upload(spark):
    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.protocol_http import SparqlHttpServer
    import urllib.request

    eng = Engine(spark)
    repo = eng.create_repository("jsonld_rt", ruleset="none")
    n = repo.load_jsonld(json.dumps({
        "@context": {"@vocab": EX},
        "@id": EX + "d1",
        "name": "Dublin",
    }))
    assert n == 1
    got = repo.sparql(
        f"SELECT ?o WHERE {{ <{EX}d1> <{EX}name> ?o }}"
    ).collect()
    assert [r[0]["lex"] for r in got] == ["Dublin"]

    srv = SparqlHttpServer(eng).start()
    try:
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/repositories/jsonld_rt/statements",
            data=json.dumps(
                {"@id": EX + "d2", EX + "name": [{"@value": "Cork"}]}
            ).encode(),
            headers={"Content-Type": "application/ld+json"},
            method="POST",
        )
        assert urllib.request.urlopen(req).status == 204
    finally:
        srv.stop()
    got = repo.sparql(
        f"SELECT ?s WHERE {{ ?s <{EX}name> \"Cork\" }}"
    ).collect()
    assert [r[0]["lex"] for r in got] == [EX + "d2"]


def test_explicit_graph_overrides_embedded_named_graphs():
    """RDF4J semantics: an explicit target context overrides parsed
    contexts, so graph-scoped uploads are true replaces (ADVICE r3)."""
    from dublin_smart_city_graphdb_spark.sources.jsonld import jsonld_to_rows

    doc = json.dumps({
        "@graph": [
            {
                "@id": EX + "g1",
                "@graph": [
                    {"@id": EX + "a", EX + "p": [{"@value": "v"}]}
                ],
            }
        ]
    })
    # no target: the document's own named graph wins
    free = jsonld_to_rows(doc)
    assert {r[0] for r in free} == {EX + "g1"}
    # explicit target: EVERY statement lands in the target graph
    forced = jsonld_to_rows(doc, graph=EX + "target")
    assert {r[0] for r in forced} == {EX + "target"}


def test_explicit_bnode_labels_scoped_per_parse():
    from dublin_smart_city_graphdb_spark.sources.jsonld import jsonld_to_rows

    doc = json.dumps({"@id": "_:b0", EX + "p": [{"@value": "v"}]})
    a = jsonld_to_rows(doc, bnode_prefix="l1")
    b = jsonld_to_rows(doc, bnode_prefix="l2")
    assert a[0][1] != b[0][1], "explicit _:b0 from two parses must not merge"


def test_http_body_never_resolved_as_server_path(spark, tmp_path):
    """A request body equal to an existing server-side path must be parsed
    as CONTENT (and rejected as malformed), never opened and imported
    (ADVICE r3 LFI surface)."""
    import urllib.error
    import urllib.request

    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.protocol_http import SparqlHttpServer

    secret = tmp_path / "secret.ttl"
    secret.write_text(f'<{EX}leak> <{EX}p> "leaked" .')

    eng = Engine(spark)
    repo = eng.create_repository("lfi_guard", ruleset="none")
    srv = SparqlHttpServer(eng).start()
    try:
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/repositories/lfi_guard/statements",
            data=str(secret).encode(),  # body IS a real local path
            headers={"Content-Type": "text/turtle"},
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req)
    finally:
        srv.stop()
    assert repo.sparql(
        f"SELECT ?s WHERE {{ ?s <{EX}p> \"leaked\" }}"
    ).collect() == []
    eng.drop_repository("lfi_guard")


def test_canonical_double_shortest_roundtrip_and_nonfinite():
    """XSD canonical doubles from repr-shortest digits: 17-significant-
    digit values survive, non-finite floats map to XSD lexical forms
    (ADVICE r4)."""
    from dublin_smart_city_graphdb_spark.sources.jsonld import (
        _canonical_double,
    )

    assert _canonical_double(2.5) == "2.5E0"
    assert _canonical_double(100.0) == "1.0E2"
    assert _canonical_double(0.0) == "0.0E0"
    # needs 17 significant digits — %.15E would collapse it
    v = 1.2345678901234567
    assert float(_canonical_double(v).replace("E", "e")) == v
    assert _canonical_double(float("inf")) == "INF"
    assert _canonical_double(float("-inf")) == "-INF"
    assert _canonical_double(float("nan")) == "NaN"
