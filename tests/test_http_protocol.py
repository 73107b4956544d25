"""HTTP SPARQL-protocol facade: replays the reference deployment's exact
call sequence (create repo → POST turtle → count query → test query;
init-graphdb.sh:36-143, README.md:63-78) against our server."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

import pytest

from dublin_smart_city_graphdb_spark.engine import Engine
from dublin_smart_city_graphdb_spark.protocol_http import SparqlHttpServer


@pytest.fixture(scope="module")
def server(spark):
    srv = SparqlHttpServer(Engine(spark)).start()
    yield srv
    srv.stop()


def _url(server, path):
    return f"http://{server.host}:{server.port}{path}"


def _get_json(server, path):
    with urllib.request.urlopen(_url(server, path)) as r:
        return r.status, json.loads(r.read())


def _post(server, path, data: bytes, ctype: str):
    req = urllib.request.Request(
        _url(server, path), data=data, headers={"Content-Type": ctype}
    )
    with urllib.request.urlopen(req) as r:
        body = r.read()
        return r.status, json.loads(body) if body else None


def test_reference_deployment_sequence(server):
    # 1. create repository with the reference's JSON config shape
    #    (init-graphdb.sh:44-72)
    cfg = {
        "id": "dublin_facilities",
        "params": {
            "ruleset": {"value": "none"},
            "queryTimeout": {"value": 30},
        },
    }
    status, body = _post(
        server, "/rest/repositories", json.dumps(cfg).encode(), "application/json"
    )
    assert status == 201 and body == {"id": "dublin_facilities"}

    # 2. repository listing (init-graphdb.sh:38)
    status, repos = _get_json(server, "/rest/repositories")
    assert {"id": "dublin_facilities"} in repos

    # 3. POST Turtle to /statements (init-graphdb.sh:90-93)
    ttl = """@prefix ex: <http://h#> .
    ex:f1 a ex:Facility ; ex:name "Library A" .
    ex:f2 a ex:Facility ; ex:name "Park B" .
    """
    status, _ = _post(
        server,
        "/repositories/dublin_facilities/statements",
        ttl.encode(),
        "text/turtle",
    )
    assert status == 204

    # 4. verification COUNT query (init-graphdb.sh:133-135)
    q = urllib.parse.quote("SELECT (COUNT(*) as ?count) WHERE { ?s ?p ?o }")
    status, doc = _get_json(server, f"/repositories/dublin_facilities?query={q}")
    assert status == 200
    assert doc["results"]["bindings"][0]["count"]["value"] == "4"

    # 5. the README test query shape (README.md:70-78)
    q2 = urllib.parse.quote(
        "PREFIX ex: <http://h#> SELECT ?name WHERE "
        "{ ?f a ex:Facility ; ex:name ?name } ORDER BY ?name LIMIT 10"
    )
    status, doc2 = _get_json(server, f"/repositories/dublin_facilities?query={q2}")
    names = [b["name"]["value"] for b in doc2["results"]["bindings"]]
    assert names == ["Library A", "Park B"]

    # 6. SPARQL Update over POST (form-encoded, engine surface S7)
    upd = urllib.parse.urlencode(
        {"update": 'PREFIX ex: <http://h#> INSERT DATA { ex:f3 ex:name "Pool C" }'}
    )
    status, _ = _post(
        server,
        "/repositories/dublin_facilities/statements",
        upd.encode(),
        "application/x-www-form-urlencoded",
    )
    assert status == 204
    status, doc3 = _get_json(server, f"/repositories/dublin_facilities?query={q}")
    assert doc3["results"]["bindings"][0]["count"]["value"] == "5"


def test_error_paths(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get_json(server, "/repositories/nope?query=SELECT%20*%20WHERE%20%7B%7D")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e2:
        _get_json(server, "/repositories/dublin_facilities")
    assert e2.value.code == 400


def test_csv_tsv_content_negotiation(server):
    """W3C results-CSV / results-TSV via the Accept header (S4 depth)."""
    # reuse the repo created by the sequence test; create one defensively
    cfg = {"id": "csvrepo", "params": {"ruleset": {"value": "none"}}}
    _post(server, "/rest/repositories", json.dumps(cfg).encode(), "application/json")
    ttl = """
        @prefix ex: <http://x#> .
        ex:a ex:name "Alpha, \\"quoted\\"" ; ex:rank 3 .
    """
    _post(server, "/repositories/csvrepo/statements", ttl.encode(), "text/turtle")
    q = urllib.parse.quote(
        "SELECT ?s ?name ?rank WHERE { ?s <http://x#name> ?name ; "
        "<http://x#rank> ?rank }"
    )

    def fetch(accept):
        req = urllib.request.Request(
            _url(server, f"/repositories/csvrepo?query={q}"),
            headers={"Accept": accept},
        )
        with urllib.request.urlopen(req) as r:
            return r.headers.get("Content-Type"), r.read().decode()

    ctype, body = fetch("text/csv")
    assert ctype == "text/csv"
    lines = body.strip().split("\r\n")
    assert lines[0] == "s,name,rank"
    # IRI bare; comma+quote field RFC4180-quoted; plain lexical rank
    assert lines[1] == 'http://x#a,"Alpha, ""quoted""",3'

    ctype, body = fetch("text/tab-separated-values")
    assert ctype == "text/tab-separated-values"
    lines = body.strip().split("\n")
    assert lines[0] == "?s\t?name\t?rank"
    assert lines[1].startswith('<http://x#a>\t"Alpha, \\"quoted\\""\t')
    assert '"3"^^<http://www.w3.org/2001/XMLSchema#integer>' in lines[1]

    # default stays results-JSON
    ctype, body = fetch("application/sparql-results+json")
    assert ctype == "application/sparql-results+json"
    assert json.loads(body)["head"]["vars"] == ["s", "name", "rank"]


def test_xml_content_negotiation(server):
    """W3C results-XML (the protocol default the reference endpoint serves,
    README.md:63-65): bindings round-trip incl. xml:lang and datatype."""
    import xml.etree.ElementTree as ET

    cfg = {"id": "xmlrepo", "params": {"ruleset": {"value": "none"}}}
    _post(server, "/rest/repositories", json.dumps(cfg).encode(), "application/json")
    ttl = """
        @prefix ex: <http://x#> .
        ex:a ex:label "Baile Atha Cliath"@ga ; ex:rank 3 ; ex:note "a<b&c" .
    """
    _post(server, "/repositories/xmlrepo/statements", ttl.encode(), "text/turtle")
    q = urllib.parse.quote(
        "SELECT ?s ?label ?rank ?note WHERE { ?s <http://x#label> ?label ; "
        "<http://x#rank> ?rank ; <http://x#note> ?note }"
    )
    req = urllib.request.Request(
        _url(server, f"/repositories/xmlrepo?query={q}"),
        headers={"Accept": "application/sparql-results+xml"},
    )
    with urllib.request.urlopen(req) as r:
        ctype, body = r.headers.get("Content-Type"), r.read().decode()
    assert ctype == "application/sparql-results+xml"

    ns = {"sr": "http://www.w3.org/2005/sparql-results#"}
    root = ET.fromstring(body)
    assert [v.get("name") for v in root.findall("sr:head/sr:variable", ns)] == [
        "s", "label", "rank", "note",
    ]
    results = root.findall("sr:results/sr:result", ns)
    assert len(results) == 1
    terms = {
        b.get("name"): b[0] for b in results[0].findall("sr:binding", ns)
    }
    assert terms["s"].tag.endswith("uri") and terms["s"].text == "http://x#a"
    assert terms["label"].get(
        "{http://www.w3.org/XML/1998/namespace}lang"
    ) == "ga"
    assert terms["label"].text == "Baile Atha Cliath"
    assert terms["rank"].get("datatype") == (
        "http://www.w3.org/2001/XMLSchema#integer"
    )
    assert terms["rank"].text == "3"
    assert terms["note"].text == "a<b&c"  # escaping round-trips

    # ASK over XML
    qa = urllib.parse.quote("ASK { ?s <http://x#rank> ?r }")
    req = urllib.request.Request(
        _url(server, f"/repositories/xmlrepo?query={qa}"),
        headers={"Accept": "application/sparql-results+xml"},
    )
    with urllib.request.urlopen(req) as r:
        root = ET.fromstring(r.read().decode())
    assert root.find("sr:boolean", ns).text == "true"


def test_construct_served_as_ntriples(server):
    """CONSTRUCT/DESCRIBE return an RDF graph: a graph Accept type gets
    N-Triples that round-trip through the engine's own parser."""
    cfg = {"id": "ntrepo", "params": {"ruleset": {"value": "none"}}}
    _post(server, "/rest/repositories", json.dumps(cfg).encode(), "application/json")
    ttl = """
        @prefix ex: <http://x#> .
        ex:a ex:knows ex:b . ex:b ex:label "B node"@en .
    """
    _post(server, "/repositories/ntrepo/statements", ttl.encode(), "text/turtle")
    q = urllib.parse.quote(
        "CONSTRUCT { ?s <http://x#linked> ?o . } WHERE { ?s <http://x#knows> ?o }"
    )
    req = urllib.request.Request(
        _url(server, f"/repositories/ntrepo?query={q}"),
        headers={"Accept": "application/n-triples"},
    )
    with urllib.request.urlopen(req) as r:
        ctype, body = r.headers.get("Content-Type"), r.read().decode()
    assert ctype == "application/n-triples"
    assert body.strip() == "<http://x#a> <http://x#linked> <http://x#b> ."

    from dublin_smart_city_graphdb_spark.sources.turtle import parse_turtle

    triples = parse_turtle(body)  # N-Triples is a Turtle subset
    assert len(triples) == 1


def test_delete_repository(spark, tmp_path):
    """DELETE /rest/repositories/{id}: catalog entry and warehouse
    directory go away, a second DELETE 404s (idempotent surface), and the
    name is immediately reusable with fresh state."""
    import os
    import urllib.error

    wh = str(tmp_path / "wh")
    eng = Engine(spark, warehouse=wh)
    srv = SparqlHttpServer(eng).start()
    try:
        r = eng.create_repository("todelete", ruleset="none")
        r.load_turtle('@prefix ex: <http://x#> .\nex:a ex:p "v" .')
        assert os.path.isdir(os.path.join(wh, "todelete"))

        req = urllib.request.Request(
            _url(srv, "/rest/repositories/todelete"), method="DELETE"
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 204
        assert eng.list_repositories() == []
        assert not os.path.exists(os.path.join(wh, "todelete"))

        try:
            urllib.request.urlopen(
                urllib.request.Request(
                    _url(srv, "/rest/repositories/todelete"), method="DELETE"
                )
            )
            raise AssertionError("second DELETE should 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        fresh = eng.create_repository("todelete", ruleset="none")
        assert fresh.count() == 0
    finally:
        srv.stop()


def test_statements_resource_size_export_clear(spark):
    """The RDF4J-style statements resource: GET /size (plain-text count),
    GET /statements (N-Triples / N-Quads export, graph-scoped via
    ?context=), DELETE /statements (clear all or one graph)."""
    eng = Engine(spark)
    srv = SparqlHttpServer(eng).start()
    try:
        r = eng.create_repository("stmts", ruleset="none")
        r.load_turtle('@prefix ex: <http://x#> .\nex:a ex:p "v" .')
        r.load_turtle('@prefix ex: <http://x#> .\nex:b ex:p "w" .', graph="http://g#1")

        with urllib.request.urlopen(_url(srv, "/repositories/stmts/size")) as resp:
            assert resp.read().decode() == "2"

        with urllib.request.urlopen(
            urllib.request.Request(
                _url(srv, "/repositories/stmts/statements"),
                headers={"Accept": "application/n-quads"},
            )
        ) as resp:
            body = resp.read().decode()
            assert resp.headers.get("Content-Type", "").startswith("application/n-quads")
            assert '<http://x#a> <http://x#p> "v" .' in body
            assert '<http://x#b> <http://x#p> "w" <http://g#1> .' in body

        with urllib.request.urlopen(
            _url(srv, "/repositories/stmts/statements?context=http%3A%2F%2Fg%231")
        ) as resp:
            body = resp.read().decode()
            assert "x#b" in body and "x#a" not in body

        req = urllib.request.Request(
            _url(srv, "/repositories/stmts/statements?context=http%3A%2F%2Fg%231"),
            method="DELETE",
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 204
        assert r.count() == 1

        req = urllib.request.Request(
            _url(srv, "/repositories/stmts/statements"), method="DELETE"
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 204
        assert r.count() == 0
    finally:
        srv.stop()


def test_graph_store_protocol_lifecycle(server):
    """W3C SPARQL 1.1 Graph Store HTTP Protocol on the RDF4J path:
    PUT replaces a named graph, GET exports it, POST merges, DELETE drops —
    the whole lifecycle over the wire."""
    engine_repo = "gsp_repo"
    _post(
        server, "/rest/repositories",
        json.dumps({"id": engine_repo, "params": {"ruleset": {"value": "none"}}}).encode(),
        "application/json",
    )
    gsp = f"/repositories/{engine_repo}/rdf-graphs/service"
    g = urllib.parse.quote("http://g/one", safe="")

    def put(ttl, q):
        req = urllib.request.Request(
            _url(server, f"{gsp}?{q}"), data=ttl.encode(),
            headers={"Content-Type": "text/turtle"}, method="PUT",
        )
        with urllib.request.urlopen(req) as r:
            return r.status

    def get(q):
        with urllib.request.urlopen(_url(server, f"{gsp}?{q}")) as r:
            return r.status, r.read().decode()

    # PUT: create the named graph
    assert put("<urn:a> <urn:p> <urn:b> .", f"graph={g}") == 204
    status, body = get(f"graph={g}")
    assert status == 200 and "<urn:a> <urn:p> <urn:b> ." in body

    # POST: merge another triple in
    req = urllib.request.Request(
        _url(server, f"{gsp}?graph={g}"),
        data=b"<urn:c> <urn:p> <urn:d> .",
        headers={"Content-Type": "text/turtle"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 204
    _, body = get(f"graph={g}")
    assert "<urn:a>" in body and "<urn:c>" in body

    # PUT again: REPLACES (the old triples are gone)
    assert put("<urn:e> <urn:p> <urn:f> .", f"graph={g}") == 204
    _, body = get(f"graph={g}")
    assert "<urn:e>" in body and "<urn:a>" not in body

    # default graph is separate
    assert put("<urn:x> <urn:p> <urn:y> .", "default") == 204
    _, body = get("default")
    assert "<urn:x>" in body and "<urn:e>" not in body

    # DELETE drops only the named graph
    req = urllib.request.Request(
        _url(server, f"{gsp}?graph={g}"), method="DELETE"
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 204
    _, body = get(f"graph={g}")
    assert body.strip() == ""
    _, body = get("default")
    assert "<urn:x>" in body


def test_transaction_protocol_lifecycle(server):
    """RDF4J transaction REST: POST creates, PUT?action=ADD/QUERY buffer
    and read-your-writes, COMMIT publishes atomically, DELETE rolls back."""
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "txn_http", "params": {"ruleset": {"value": "none"}}}).encode(),
        "application/json",
    )

    def begin():
        req = urllib.request.Request(
            _url(server, "/repositories/txn_http/transactions"), data=b"",
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 201
            return r.headers["Location"]

    def put(loc, q, data=b""):
        req = urllib.request.Request(
            _url(server, f"{loc}?{q}"), data=data,
            headers={"Content-Type": "text/turtle"}, method="PUT",
        )
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()

    loc = begin()
    st, _ = put(loc, "action=ADD", b"<urn:t1> <urn:p> <urn:o> .")
    assert st == 200
    # read-your-writes inside the txn
    q = urllib.parse.quote("SELECT ?s WHERE { ?s <urn:p> <urn:o> }")
    st, body = put(loc, f"action=QUERY&query={q}")
    assert st == 200
    assert "urn:t1" in body.decode()
    # not visible outside yet
    with urllib.request.urlopen(
        _url(server, f"/repositories/txn_http?query={q}")
    ) as r:
        assert "urn:t1" not in r.read().decode()
    # commit publishes
    st, _ = put(loc, "action=COMMIT")
    assert st == 200
    with urllib.request.urlopen(
        _url(server, f"/repositories/txn_http?query={q}")
    ) as r:
        assert "urn:t1" in r.read().decode()

    # rollback path
    loc2 = begin()
    put(loc2, "action=ADD", b"<urn:t2> <urn:p> <urn:o> .")
    req = urllib.request.Request(_url(server, loc2), method="DELETE")
    with urllib.request.urlopen(req) as r:
        assert r.status == 204
    with urllib.request.urlopen(
        _url(server, f"/repositories/txn_http?query={q}")
    ) as r:
        assert "urn:t2" not in r.read().decode()


def test_protocol_version_and_namespaces(server):
    """RDF4J client-bootstrap resources: GET /protocol and the per-repo
    namespaces table (PUT/GET/LIST/DELETE)."""
    with urllib.request.urlopen(_url(server, "/protocol")) as r:
        assert r.read().decode() == "12"
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "ns_repo", "params": {"ruleset": {"value": "none"}}}).encode(),
        "application/json",
    )
    base = "/repositories/ns_repo/namespaces"
    req = urllib.request.Request(
        _url(server, f"{base}/ex"), data=b"http://example.org/", method="PUT"
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 204
    with urllib.request.urlopen(_url(server, f"{base}/ex")) as r:
        assert r.read().decode() == "http://example.org/"
    status, doc = _get_json(server, base)
    assert status == 200
    assert doc["results"]["bindings"][0]["prefix"]["value"] == "ex"
    req = urllib.request.Request(_url(server, f"{base}/ex"), method="DELETE")
    with urllib.request.urlopen(req) as r:
        assert r.status == 204
    status, doc = _get_json(server, base)
    assert doc["results"]["bindings"] == []


def test_infer_false_excludes_inferred_statements(server):
    """RDF4J infer=false (GraphDB's 'include inferred' toggle): the same
    query over an rdfsplus repository drops entailed triples when the
    client opts out."""
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "inf_repo", "params": {"ruleset": {"value": "rdfsplus"}}}).encode(),
        "application/json",
    )
    ttl = (
        "@prefix ex: <http://i#> .\n"
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "ex:hasType rdfs:domain ex:Thing .\n"
        "ex:a ex:hasType ex:t1 .\n"
    )
    _post(server, "/repositories/inf_repo/statements", ttl.encode(), "text/turtle")
    q = urllib.parse.quote(
        "SELECT ?s WHERE { ?s a <http://i#Thing> }"
    )
    with urllib.request.urlopen(
        _url(server, f"/repositories/inf_repo?query={q}")
    ) as r:
        assert "http://i#a" in r.read().decode()  # rdfs2 entailment visible
    with urllib.request.urlopen(
        _url(server, f"/repositories/inf_repo?query={q}&infer=false")
    ) as r:
        assert "http://i#a" not in r.read().decode()


def test_cli_init_and_query(spark, tmp_path, capsys):
    """The CLI replays the reference's operational flow in-process:
    init (create + load + COUNT verification) then query."""
    from dublin_smart_city_graphdb_spark.__main__ import main

    ttl = tmp_path / "d.ttl"
    ttl.write_text("@prefix ex: <http://c#> . ex:a ex:p ex:b . ex:b ex:p ex:c .")
    wh = str(tmp_path / "wh")
    rc = main([
        "--warehouse", wh,
        "init", "--repo", "cli_repo", "--ruleset", "none",
        "--data", str(ttl),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "loaded 2 statements" in out
    assert "holds 2 statements" in out

    # a separate invocation finds the repository through the warehouse
    rc = main([
        "--warehouse", wh,
        "query", "--repo", "cli_repo",
        "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }",
    ])
    assert rc == 0
    assert '"2"' in capsys.readouterr().out


def test_contexts_listing(server):
    """RDF4J GET /repositories/{r}/contexts: distinct named graphs as a
    one-var result set; the default graph and urn:inferred are not
    contexts."""
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "ctx_repo", "params": {}}).encode(),
        "application/json",
    )
    trig = b"""
        @prefix ex: <http://x#> .
        ex:a ex:p ex:b .
        GRAPH ex:g1 { ex:c ex:p ex:d . }
        GRAPH ex:g2 { ex:e ex:p ex:f . }
    """
    _post(server, "/repositories/ctx_repo/statements", trig,
          "application/trig")
    status, doc = _get_json(server, "/repositories/ctx_repo/contexts")
    assert status == 200
    assert doc["head"]["vars"] == ["contextID"]
    got = [b["contextID"]["value"] for b in doc["results"]["bindings"]]
    assert got == ["http://x#g1", "http://x#g2"]
    assert all(
        b["contextID"]["type"] == "uri" for b in doc["results"]["bindings"]
    )


def test_gsp_get_rdfxml_roundtrip(server):
    """GSP GET with Accept: application/rdf+xml serializes the graph as
    RDF/XML that our own RDF/XML reader parses back to the identical
    statement set (typed, tagged and plain literals, IRI and bnode
    objects)."""
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "xml_export", "params": {}}).encode(),
        "application/json",
    )
    ttl = b"""
        @prefix ex: <http://x#> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        ex:a ex:knows ex:b .
        ex:a ex:name "Al<ice> & co"@en .
        ex:b ex:age "30"^^xsd:integer .
        ex:b ex:near _:spot .
    """
    _post(server, "/repositories/xml_export/statements", ttl, "text/turtle")
    req = urllib.request.Request(
        _url(server, "/repositories/xml_export/statements"),
        headers={"Accept": "application/rdf+xml"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.headers.get_content_type() == "application/rdf+xml"
        body = r.read().decode()
    from dublin_smart_city_graphdb_spark.sources.rdfxml import rdfxml_to_rows

    got = {
        (s, p, k, lex, dt, lang)
        for (_, s, p, k, lex, dt, lang, *_rest) in rdfxml_to_rows(body)
    }
    # bnode labels are re-scoped on parse; compare label-insensitively
    norm = {
        (("_:" if s.startswith("_:") else s if True else s), p, k,
         ("_:" if str(lex).startswith("_:") else lex), dt, lang)
        for (s, p, k, lex, dt, lang) in got
    }
    assert (
        "http://x#a", "http://x#knows", 0, "http://x#b", None, None
    ) in norm
    assert (
        "http://x#a", "http://x#name", 2, "Al<ice> & co", None, "en"
    ) in norm
    assert (
        "http://x#b", "http://x#age", 2, "30",
        "http://www.w3.org/2001/XMLSchema#integer", None,
    ) in norm
    assert ("http://x#b", "http://x#near", 1, "_:", None, None) in norm


def test_gsp_get_trig_roundtrip(server):
    """GSP GET with Accept: application/trig emits per-statement GRAPH
    blocks our TriG reader parses back with the same graph placement."""
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "trig_export", "params": {}}).encode(),
        "application/json",
    )
    trig = b"""
        @prefix ex: <http://x#> .
        ex:a ex:p ex:b .
        GRAPH ex:g1 { ex:c ex:p ex:d . }
    """
    _post(server, "/repositories/trig_export/statements", trig,
          "application/trig")
    req = urllib.request.Request(
        _url(server, "/repositories/trig_export/statements"),
        headers={"Accept": "application/trig"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.headers.get_content_type() == "application/trig"
        body = r.read().decode()
    # default-graph statement serializes bare; the named statement keeps
    # its block (this route exports the whole repository)
    assert "<http://x#a> <http://x#p> <http://x#b> ." in body
    assert "GRAPH <http://x#g1> { <http://x#c> <http://x#p> <http://x#d> . }" in body
    # graph-scoped export carries only the addressed block
    req2 = urllib.request.Request(
        _url(server,
             "/repositories/trig_export/statements?context=%3Chttp://x%23g1%3E"),
        headers={"Accept": "application/trig"},
    )
    with urllib.request.urlopen(req2) as r:
        body2 = r.read().decode()
    assert "GRAPH <http://x#g1> { <http://x#c> <http://x#p> <http://x#d> . }" in body2


def test_cli_init_with_custom_rules_file(spark, tmp_path, capsys):
    """--ruleset custom --rules-file loads blank-line-separated CONSTRUCT
    rules (the .pie-file operational flow) and materializes at init."""
    from dublin_smart_city_graphdb_spark.__main__ import main

    ttl = tmp_path / "d.ttl"
    ttl.write_text(
        "@prefix ex: <http://c#> . ex:n ex:parent ex:p . ex:p ex:brother ex:u ."
    )
    rules = tmp_path / "rules.pie.rq"
    rules.write_text(
        "PREFIX ex: <http://c#>\n"
        "CONSTRUCT { ?n ex:uncle ?u } WHERE "
        "{ ?n ex:parent ?p . ?p ex:brother ?u }\n"
        "\n"
        "PREFIX ex: <http://c#>\n"
        "CONSTRUCT { ?u ex:nephew ?n } WHERE { ?n ex:uncle ?u }\n"
    )
    wh = str(tmp_path / "wh")
    rc = main([
        "--warehouse", wh,
        "init", "--repo", "cli_rules", "--ruleset", "custom",
        "--rules-file", str(rules), "--data", str(ttl),
    ])
    assert rc == 0
    capsys.readouterr()
    rc = main([
        "--warehouse", wh,
        "query", "--repo", "cli_rules",
        "PREFIX ex: <http://c#> SELECT ?n WHERE { ?u ex:nephew ?n }",
    ])
    assert rc == 0
    assert "http://c#n" in capsys.readouterr().out


def test_construct_served_as_rdfxml(server):
    """CONSTRUCT results honor Accept: application/rdf+xml; the emitted
    document re-parses with the engine's RDF/XML reader."""
    cfg = {"id": "cx_xml", "params": {"ruleset": {"value": "none"}}}
    _post(server, "/rest/repositories", json.dumps(cfg).encode(),
          "application/json")
    _post(server, "/repositories/cx_xml/statements",
          b"@prefix ex: <http://x#> . ex:a ex:knows ex:b .", "text/turtle")
    q = urllib.parse.quote(
        "PREFIX ex: <http://x#> CONSTRUCT { ?x ex:linked ?y } "
        "WHERE { ?x ex:knows ?y }"
    )
    req = urllib.request.Request(
        _url(server, f"/repositories/cx_xml?query={q}"),
        headers={"Accept": "application/rdf+xml"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.headers.get_content_type() == "application/rdf+xml"
        body = r.read().decode()
    from dublin_smart_city_graphdb_spark.sources.rdfxml import rdfxml_to_rows

    rows = rdfxml_to_rows(body)
    assert [(s, p, lex) for (_, s, p, _k, lex, *_r) in rows] == [
        ("http://x#a", "http://x#linked", "http://x#b")
    ]


def test_unknown_rdf_content_type_is_415(server):
    """A PRESENT but unrecognized Content-Type on a GSP upload answers
    415 Unsupported Media Type (RDF4J parity), not a Turtle parse 400
    (ADVICE r4). Missing Content-Type still defaults to Turtle."""
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "ct415", "params": {"ruleset": {"value": "none"}}}).encode(),
        "application/json",
    )
    gsp = "/repositories/ct415/rdf-graphs/service"
    g = urllib.parse.quote("http://g/ct", safe="")

    def post_ct(data: bytes, ctype: str | None, method="POST"):
        headers = {"Content-Type": ctype} if ctype else {}
        req = urllib.request.Request(
            _url(server, f"{gsp}?graph={g}"), data=data, headers=headers,
            method=method,
        )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status
        except urllib.error.HTTPError as e:
            return e.code

    assert post_ct(b"<urn:a> <urn:p> <urn:b> .", "application/octet-stream") == 415
    assert post_ct(b"<urn:a> <urn:p> <urn:b> .", "application/octet-stream", "PUT") == 415
    # untyped upload still defaults to Turtle (RDF4J behaviour);
    # urllib injects a default Content-Type, so go down to http.client
    import http.client

    conn = http.client.HTTPConnection(server.host, server.port)
    conn.putrequest("POST", f"{gsp}?graph={g}")
    body = b"<urn:a> <urn:p> <urn:b> ."
    conn.putheader("Content-Length", str(len(body)))
    conn.endheaders()
    conn.send(body)
    assert conn.getresponse().status == 204
    conn.close()


def test_nquads_upload_roundtrip(server):
    """application/n-quads on /statements: per-line graph labels land as
    named graphs."""
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "nqrepo", "params": {"ruleset": {"value": "none"}}}).encode(),
        "application/json",
    )
    nq = (
        b"<urn:s1> <urn:p> <urn:o1> <urn:graph:one> .\n"
        b"<urn:s2> <urn:p> \"lit\" .\n"
    )
    status, _ = _post(
        server, "/repositories/nqrepo/statements", nq, "application/n-quads"
    )
    assert status == 204
    q = urllib.parse.quote(
        "SELECT ?s WHERE { GRAPH <urn:graph:one> { ?s ?p ?o } }"
    )
    status, doc = _get_json(server, f"/repositories/nqrepo?query={q}")
    assert status == 200
    assert [b["s"]["value"] for b in doc["results"]["bindings"]] == ["urn:s1"]
    q2 = urllib.parse.quote('SELECT ?s WHERE { ?s ?p "lit" }')
    status, doc2 = _get_json(server, f"/repositories/nqrepo?query={q2}")
    assert [b["s"]["value"] for b in doc2["results"]["bindings"]] == ["urn:s2"]


def test_explain_endpoint(server):
    """GET /repositories/{r}/explain?query=... returns the physical plan
    Spark will execute (the query-plan inspection surface)."""
    eng = server.engine
    if "explain_repo" not in eng.list_repositories():
        r = eng.create_repository("explain_repo", ruleset="none")
        r.load_turtle_text(
            "@prefix ex: <http://e/> . ex:a ex:p ex:b . ex:b ex:p ex:c ."
        )
    q = urllib.parse.quote("SELECT ?s ?o WHERE { ?s <http://e/p> ?o }")
    with urllib.request.urlopen(
        _url(server, f"/repositories/explain_repo/explain?query={q}")
    ) as resp:
        assert resp.status == 200
        ctype = resp.headers.get("Content-Type", "")
        plan = resp.read().decode()
    assert "text/plain" in ctype
    assert "Physical Plan" in plan or "Scan" in plan
    # missing query parameter is a clean 400
    try:
        urllib.request.urlopen(
            _url(server, "/repositories/explain_repo/explain")
        )
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as ex:
        assert ex.code == 400
    # a malformed query is a clean 400, not a 500
    bad = urllib.parse.quote("SELECT WHERE {{{")
    try:
        urllib.request.urlopen(
            _url(server, f"/repositories/explain_repo/explain?query={bad}")
        )
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as ex:
        assert ex.code == 400


def test_statements_export_jsonld_roundtrip(server):
    """Statements GET with Accept: application/ld+json (VERDICT r6 task
    3): the export round-trips through our own JSON-LD reader to the
    identical statement set — typed/tagged/plain literals, IRI objects,
    and named-graph placement via @graph entries."""
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "jsonld_export", "params": {}}).encode(),
        "application/json",
    )
    trig = b"""
        @prefix ex: <http://x#> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        ex:a ex:knows ex:b .
        ex:a ex:name "Alice"@en .
        ex:b ex:age "30"^^xsd:integer .
        ex:b ex:note "plain" .
        GRAPH ex:g1 { ex:c ex:p ex:d . }
    """
    _post(server, "/repositories/jsonld_export/statements", trig,
          "application/trig")
    req = urllib.request.Request(
        _url(server, "/repositories/jsonld_export/statements"),
        headers={"Accept": "application/ld+json"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.headers.get_content_type() == "application/ld+json"
        body = r.read().decode()
    doc = json.loads(body)
    assert "@graph" in doc

    # reload the export into a fresh repository via the JSON-LD reader
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "jsonld_back", "params": {}}).encode(),
        "application/json",
    )
    _post(server, "/repositories/jsonld_back/statements", body.encode(),
          "application/ld+json")

    def dump(repo):
        req = urllib.request.Request(
            _url(server, f"/repositories/{repo}/statements"),
            headers={"Accept": "application/n-quads"},
        )
        with urllib.request.urlopen(req) as r:
            return set(line for line in r.read().decode().splitlines()
                       if line.strip())

    assert dump("jsonld_back") == dump("jsonld_export")


def test_construct_served_as_jsonld(server):
    """CONSTRUCT with Accept: application/ld+json returns the graph as a
    JSON-LD document (query-endpoint negotiation, not just GSP)."""
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "jsonld_q", "params": {}}).encode(),
        "application/json",
    )
    _post(server, "/repositories/jsonld_q/statements",
          b"@prefix ex: <http://x#> . ex:a ex:p ex:b .", "text/turtle")
    q = urllib.parse.quote(
        "PREFIX ex: <http://x#> CONSTRUCT { ?s ex:q ?o } "
        "WHERE { ?s ex:p ?o }"
    )
    req = urllib.request.Request(
        _url(server, f"/repositories/jsonld_q?query={q}"),
        headers={"Accept": "application/ld+json"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.headers.get_content_type() == "application/ld+json"
        doc = json.loads(r.read().decode())
    assert doc["@graph"] == [
        {"@id": "http://x#a", "http://x#q": [{"@id": "http://x#b"}]}
    ]


def test_large_select_streams_without_content_length(server):
    """VERDICT r6 task 5: a SELECT result past the buffer threshold goes
    out as a STREAMED body (no Content-Length, Connection: close) that is
    byte-identical to the buffered results-JSON serializer; a small
    SELECT keeps the Content-Length path."""
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "stream_t", "params": {}}).encode(),
        "application/json",
    )
    ttl = "@prefix ex: <http://s#> .\n" + "\n".join(
        f'ex:n{i} ex:val "{i}" .' for i in range(5000)
    )
    _post(server, "/repositories/stream_t/statements", ttl.encode(),
          "text/turtle")
    q = urllib.parse.quote(
        "PREFIX ex: <http://s#> SELECT ?s ?v WHERE { ?s ex:val ?v } "
        "ORDER BY ?s"
    )
    with urllib.request.urlopen(
        urllib.request.Request(_url(server, f"/repositories/stream_t?query={q}"))
    ) as r:
        assert r.headers.get("Content-Length") is None  # streamed
        assert r.headers.get_content_type() == "application/sparql-results+json"
        body = r.read().decode()
    doc = json.loads(body)
    assert len(doc["results"]["bindings"]) == 5000
    # byte-identical to the buffered serializer
    repo = server.engine._repos["stream_t"]
    buffered, _ = repo.sparql_serialized(
        "PREFIX ex: <http://s#> SELECT ?s ?v WHERE { ?s ex:val ?v } "
        "ORDER BY ?s"
    )
    assert body == buffered
    # small result: Content-Length present (buffered path)
    q2 = urllib.parse.quote(
        "PREFIX ex: <http://s#> SELECT ?v WHERE { ex:n7 ex:val ?v }"
    )
    with urllib.request.urlopen(
        urllib.request.Request(_url(server, f"/repositories/stream_t?query={q2}"))
    ) as r:
        assert r.headers.get("Content-Length") is not None
        assert json.loads(r.read())["results"]["bindings"] == [
            {"v": {"type": "literal", "value": "7"}}
        ]


def test_midstream_failure_aborts_connection(server, monkeypatch):
    """ADVICE r7: an iterator failure AFTER the streaming switch must
    abort the connection — never write a second status line + JSON error
    into the middle of the partially-streamed body."""
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "abort_t", "params": {}}).encode(),
        "application/json",
    )
    repo = server.engine._repos["abort_t"]

    def bad_chunks(query, include_inferred=False):
        def gen():
            for _ in range(10):  # past STREAM_BUFFER_CHUNKS → streaming
                yield "x" * 64
            raise RuntimeError("executor lost mid-stream")
        return gen()

    monkeypatch.setattr(repo, "sparql_result_chunks", bad_chunks)
    q = urllib.parse.quote("SELECT ?s WHERE { ?s ?p ?o }")
    with urllib.request.urlopen(
        urllib.request.Request(_url(server, f"/repositories/abort_t?query={q}"))
    ) as r:
        assert r.status == 200           # streaming had already begun
        body = r.read()                  # terminated by connection close
    assert b"error" not in body          # no JSON error spliced in
    assert b"HTTP/1.0 400" not in body   # no second status line
    assert body == b"x" * 64 * 10        # exactly the streamed chunks


def _graph_fixture(server, name, n=5000):
    _post(
        server, "/rest/repositories",
        json.dumps({"id": name, "params": {}}).encode(),
        "application/json",
    )
    ttl = "@prefix ex: <http://s#> .\n" + "\n".join(
        f'ex:n{i} ex:val "{i}" .' for i in range(n)
    )
    _post(server, f"/repositories/{name}/statements", ttl.encode(),
          "text/turtle")
    return server.engine._repos[name]


def test_construct_ntriples_streams_byte_identical(server):
    """VERDICT r7 task 1: a large CONSTRUCT served as N-Triples goes out
    STREAMED (no Content-Length) and byte-identical to the buffered
    serializer; small results keep the Content-Length path."""
    repo = _graph_fixture(server, "gstream_t")
    query = (
        "PREFIX ex: <http://s#> CONSTRUCT { ?s ex:copy ?v } "
        "WHERE { ?s ex:val ?v }"
    )
    q = urllib.parse.quote(query)
    req = urllib.request.Request(
        _url(server, f"/repositories/gstream_t?query={q}"),
        headers={"Accept": "application/n-triples"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.headers.get("Content-Length") is None  # streamed
        assert r.headers.get_content_type() == "application/n-triples"
        body = r.read().decode()
    buffered, _ = repo.sparql_serialized(
        query, accept="application/n-triples"
    )
    assert body == buffered
    assert body.count("\n") == 5000
    # small result keeps Content-Length
    q2 = urllib.parse.quote(
        "PREFIX ex: <http://s#> CONSTRUCT { ?s ex:one ?v } "
        'WHERE { ex:n7 ex:val ?v . BIND(ex:n7 AS ?s) }'
    )
    req2 = urllib.request.Request(
        _url(server, f"/repositories/gstream_t?query={q2}"),
        headers={"Accept": "application/n-triples"},
    )
    with urllib.request.urlopen(req2) as r:
        assert r.headers.get("Content-Length") is not None


def test_construct_rdfxml_streams_byte_identical(server):
    repo = _graph_fixture(server, "gstream_xml", n=4800)
    query = (
        "PREFIX ex: <http://s#> CONSTRUCT { ?s ex:copy ?v } "
        "WHERE { ?s ex:val ?v }"
    )
    q = urllib.parse.quote(query)
    req = urllib.request.Request(
        _url(server, f"/repositories/gstream_xml?query={q}"),
        headers={"Accept": "application/rdf+xml"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.headers.get("Content-Length") is None
        body = r.read().decode()
    buffered, _ = repo.sparql_serialized(query, accept="application/rdf+xml")
    assert body == buffered
    assert body.rstrip().endswith("</rdf:RDF>")


def test_statements_export_streams_byte_identical(server):
    """GET /statements for N-Triples/N-Quads/TriG streams past the
    buffer threshold, byte-identical to the buffered join."""
    from dublin_smart_city_graphdb_spark.sparql.protocol import (
        quads_to_nquads,
        quads_to_ntriples,
        quads_to_trig_lines,
    )

    repo = _graph_fixture(server, "gstream_st")
    for accept, fn in [
        ("application/n-triples", quads_to_ntriples),
        ("application/n-quads", quads_to_nquads),
        ("application/trig", quads_to_trig_lines),
    ]:
        req = urllib.request.Request(
            _url(server, "/repositories/gstream_st/statements"),
            headers={"Accept": accept},
        )
        with urllib.request.urlopen(req) as r:
            assert r.headers.get("Content-Length") is None, accept
            assert r.headers.get_content_type() == accept
            body = r.read().decode()
        lines = [x["value"] for x in fn(repo.quads).collect()]
        assert body == "\n".join(lines) + ("\n" if lines else ""), accept


def test_gsp_export_streams(server):
    repo = _graph_fixture(server, "gstream_gsp")
    req = urllib.request.Request(
        _url(server,
             "/repositories/gstream_gsp/rdf-graphs/service?default"),
        headers={"Accept": "application/n-triples"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.headers.get("Content-Length") is None
        body = r.read().decode()
    assert body.count("\n") == 5000
    assert repo is not None


def test_rdfxml_inexpressible_predicate_still_406(server):
    """The RDF/XML inexpressible-predicate probe runs BEFORE the status
    line even on the streamed path."""
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "gstream_bad", "params": {}}).encode(),
        "application/json",
    )
    # predicate ends in '/', no XML local name
    nt = "<http://s#a> <http://s#p/> <http://s#b> .\n" * 1
    _post(server, "/repositories/gstream_bad/statements",
          nt.encode(), "application/n-triples")
    req = urllib.request.Request(
        _url(server, "/repositories/gstream_bad/statements"),
        headers={"Accept": "application/rdf+xml"},
    )
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected 406")
    except urllib.error.HTTPError as e:
        assert e.code == 406


def test_jsonld_export_cap_413(server, monkeypatch):
    """JSON-LD driver-side assembly is capped: past the cap the export
    answers 413 with a pointer to the distributed dump path."""
    from dublin_smart_city_graphdb_spark.sparql import protocol as P

    _graph_fixture(server, "gstream_ld", n=50)
    monkeypatch.setattr(P, "JSONLD_EXPORT_CAP", 10)
    req = urllib.request.Request(
        _url(server, "/repositories/gstream_ld/statements"),
        headers={"Accept": "application/ld+json"},
    )
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected 413")
    except urllib.error.HTTPError as e:
        assert e.code == 413
        assert b"dump" in e.read()


def test_txn_query_streams_byte_identical(server):
    """VERDICT r8 task 3: a large SELECT inside an RDF4J transaction goes
    out STREAMED (no Content-Length — the route used to collect() the
    whole result on the driver, uncapped) and byte-identical to the
    buffered results-JSON serializer; small results and ASK keep the
    Content-Length path."""
    repo = _graph_fixture(server, "txn_stream", n=5000)

    req = urllib.request.Request(
        _url(server, "/repositories/txn_stream/transactions"), data=b"",
    )
    with urllib.request.urlopen(req) as r:
        loc = r.headers["Location"]

    def put(q, data=b""):
        preq = urllib.request.Request(
            _url(server, f"{loc}?{q}"), data=data,
            headers={"Content-Type": "text/turtle"}, method="PUT",
        )
        return urllib.request.urlopen(preq)

    # buffered statements become part of the snapshot the stream reads
    put("action=ADD", b'<http://s#extra> <http://s#val> "extra" .').close()
    query = (
        "PREFIX ex: <http://s#> SELECT ?s ?v WHERE { ?s ex:val ?v } "
        "ORDER BY ?s"
    )
    with put(f"action=QUERY&query={urllib.parse.quote(query)}") as r:
        assert r.status == 200
        assert r.headers.get("Content-Length") is None  # streamed
        assert r.headers.get_content_type() == (
            "application/sparql-results+json"
        )
        body = r.read().decode()
    doc = json.loads(body)
    assert len(doc["results"]["bindings"]) == 5001  # snapshot incl. ADD
    # byte-identical to the buffered serializer over the SAME snapshot
    from dublin_smart_city_graphdb_spark.sparql.protocol import rows_to_json

    tx = repo.begin()
    tx.add_turtle('<http://s#extra> <http://s#val> "extra" .')
    df = tx.query(query)
    assert body == json.dumps(rows_to_json(df.columns, df.collect()))
    tx.rollback()
    # small SELECT stays buffered (Content-Length present)
    small = "PREFIX ex: <http://s#> SELECT ?v WHERE { ex:n7 ex:val ?v }"
    with put(f"action=QUERY&query={urllib.parse.quote(small)}") as r:
        assert r.headers.get("Content-Length") is not None
    # ASK keeps the boolean-document form
    ask = "PREFIX ex: <http://s#> ASK { ex:n7 ex:val ?v }"
    with put(f"action=QUERY&query={urllib.parse.quote(ask)}") as r:
        assert r.headers.get("Content-Length") is not None
        assert json.loads(r.read())["boolean"] is True


def test_gsp_indirect_graph_edge_cases(server):
    """W3C GSP indirect-identification edges (VERDICT r10 #4): a graph
    IRI whose encoded form carries '?', '&' and '#' round-trips through
    the ?graph= parameter; ?graph together with ?default is rejected as
    ambiguous (400); an unsupported payload type is 415; an empty-body
    PUT REPLACES the graph with nothing (clears it); HEAD answers like
    GET without a body; and RDF4J's empty-graph-as-200 convention holds
    for never-created graphs."""
    _post(
        server, "/rest/repositories",
        json.dumps({"id": "gsp_edge", "params": {}}).encode(),
        "application/json",
    )
    gsp = "/repositories/gsp_edge/rdf-graphs/service"
    enc = urllib.parse.quote("http://ex/g?x=1&y=2#frag", safe="")

    def req(method, path, data=None, ctype=None):
        headers = {"Content-Type": ctype} if ctype else {}
        r = urllib.request.Request(
            _url(server, path), data=data, headers=headers, method=method
        )
        try:
            with urllib.request.urlopen(r) as resp:
                return resp.status, resp.read().decode()
        except urllib.error.HTTPError as e:
            return e.code, e.read().decode()

    # pathological graph IRI round-trips
    st, _ = req("PUT", f"{gsp}?graph={enc}",
                b"<urn:a> <urn:p> <urn:b> .", "text/turtle")
    assert st == 204
    st, body = req("GET", f"{gsp}?graph={enc}")
    assert st == 200 and "<urn:a> <urn:p> <urn:b> ." in body

    # graph + default together: ambiguous → 400
    st, _ = req("GET", f"{gsp}?graph={enc}&default")
    assert st == 400
    st, _ = req("PUT", f"{gsp}?graph={enc}&default",
                b"<urn:x> <urn:p> <urn:y> .", "text/turtle")
    assert st == 400

    # unsupported payload type → 415, store untouched
    st, _ = req("PUT", f"{gsp}?graph={enc}", b"junk", "application/pdf")
    assert st == 415
    _, body = req("GET", f"{gsp}?graph={enc}")
    assert "<urn:a>" in body

    # malformed body → 400, and the graph is NOT left cleared (the dry
    # parse runs before the destructive CLEAR)
    st, _ = req("PUT", f"{gsp}?graph={enc}",
                b"<urn:broken <urn:p> .", "text/turtle")
    assert st == 400
    _, body = req("GET", f"{gsp}?graph={enc}")
    assert "<urn:a>" in body

    # empty-body PUT replaces with nothing (clears)
    st, _ = req("PUT", f"{gsp}?graph={enc}", b"", "text/turtle")
    assert st == 204
    st, body = req("GET", f"{gsp}?graph={enc}")
    assert st == 200 and body.strip() == ""

    # HEAD: 2xx + headers, no body (clients probe without an export)
    r = urllib.request.Request(
        _url(server, f"{gsp}?default"), method="HEAD"
    )
    with urllib.request.urlopen(r) as resp:
        assert resp.status == 200
        assert resp.read() == b""
        assert "text/turtle" in resp.headers.get("Content-Type", "")

    # never-created graph: RDF4J convention — 200 with an empty document
    st, body = req("GET", f"{gsp}?graph=http%3A%2F%2Fex%2Fnever")
    assert st == 200 and body.strip() == ""
