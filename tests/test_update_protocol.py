"""SPARQL Update (SURVEY §2.1 S7), results-JSON serialization (S4), and
FROM/FROM NAMED dataset selection (§2.6 F6)."""

from __future__ import annotations

import pytest

from dublin_smart_city_graphdb_spark.engine import Engine

P = "PREFIX ex: <http://u#>\n"


@pytest.fixture()
def repo(spark):
    eng = Engine(spark)
    r = eng.create_repository(f"upd_{id(spark) % 97}", ruleset="none")
    # start fresh each test: repository object is cached per name
    r._quads = None
    r.load_turtle("""
        @prefix ex: <http://u#> .
        ex:a ex:p ex:b .
        ex:a ex:name "Alice" .
        ex:b ex:name "Bob" .
    """)
    return r


def lex_set(rows, var):
    return {r[var].lex for r in rows}


def test_insert_data(repo):
    repo.update(P + 'INSERT DATA { ex:c ex:name "Cara" . ex:c ex:p ex:a . }')
    rows = repo.sparql_collect(P + "SELECT ?x WHERE { ?x ex:name ?n }")
    assert lex_set(rows, "x") == {"http://u#a", "http://u#b", "http://u#c"}


def test_insert_data_idempotent_set_semantics(repo):
    before = repo.count()
    repo.update(P + 'INSERT DATA { ex:a ex:name "Alice" . }')
    assert repo.count() == before  # RDF graphs are sets


def test_delete_data(repo):
    repo.update(P + 'DELETE DATA { ex:a ex:name "Alice" . }')
    rows = repo.sparql_collect(P + "SELECT ?x WHERE { ?x ex:name ?n }")
    assert lex_set(rows, "x") == {"http://u#b"}


def test_delete_insert_where(repo):
    repo.update(P + """
        DELETE { ?x ex:name ?n }
        INSERT { ?x ex:label ?n }
        WHERE { ?x ex:name ?n }
    """)
    assert repo.sparql_collect(P + "SELECT ?x WHERE { ?x ex:name ?n }") == []
    rows = repo.sparql_collect(P + "SELECT ?x ?n WHERE { ?x ex:label ?n }")
    assert lex_set(rows, "n") == {"Alice", "Bob"}


def test_delete_where_shorthand(repo):
    repo.update(P + "DELETE WHERE { ex:a ?p ?o }")
    rows = repo.sparql_collect("SELECT ?s WHERE { ?s ?p ?o }")
    assert lex_set(rows, "s") == {"http://u#b"}


def test_insert_where_into_graph(repo):
    repo.update(P + """
        INSERT { GRAPH ex:g1 { ?x ex:copied ?n } }
        WHERE { ?x ex:name ?n }
    """)
    rows = repo.sparql_collect(
        P + "SELECT ?x WHERE { GRAPH ex:g1 { ?x ex:copied ?n } }"
    )
    assert lex_set(rows, "x") == {"http://u#a", "http://u#b"}


def test_clear_graph_and_all(repo):
    repo.update(P + "INSERT DATA { GRAPH ex:g1 { ex:z ex:p ex:w } }")
    repo.update(P + "CLEAR GRAPH ex:g1")
    assert repo.sparql_collect(
        P + "SELECT ?s WHERE { GRAPH ex:g1 { ?s ?p ?o } }"
    ) == []
    assert repo.count() == 3  # default graph untouched
    repo.update("CLEAR ALL")
    assert repo.count() == 0


def test_clear_default_keeps_named(repo):
    repo.update(P + "INSERT DATA { GRAPH ex:g1 { ex:z ex:p ex:w } }")
    repo.update("CLEAR DEFAULT")
    assert repo.count() == 1
    rows = repo.sparql_collect(P + "SELECT ?s WHERE { GRAPH ex:g1 { ?s ?p ?o } }")
    assert lex_set(rows, "s") == {"http://u#z"}


def test_copy_move_add(repo):
    repo.update(P + """
        INSERT DATA { GRAPH ex:src { ex:1 ex:v "a" } GRAPH ex:dst { ex:2 ex:v "b" } }
    """)
    repo.update(P + "COPY GRAPH ex:src TO GRAPH ex:dst")
    rows = repo.sparql_collect(P + "SELECT ?s WHERE { GRAPH ex:dst { ?s ?p ?o } }")
    assert lex_set(rows, "s") == {"http://u#1"}  # dst replaced
    repo.update(P + "ADD GRAPH ex:src TO GRAPH ex:dst")
    repo.update(P + "MOVE GRAPH ex:src TO GRAPH ex:tmp")
    assert repo.sparql_collect(
        P + "SELECT ?s WHERE { GRAPH ex:src { ?s ?p ?o } }"
    ) == []
    rows = repo.sparql_collect(P + "SELECT ?s WHERE { GRAPH ex:tmp { ?s ?p ?o } }")
    assert lex_set(rows, "s") == {"http://u#1"}


def test_load_into_graph(repo, tmp_path):
    f = tmp_path / "extra.ttl"
    f.write_text('@prefix ex: <http://u#> .\nex:ld ex:name "Loaded" .\n')
    repo.update(f"LOAD <file://{f}> INTO GRAPH <http://u#lg>")
    rows = repo.sparql_collect(
        P + "SELECT ?s WHERE { GRAPH <http://u#lg> { ?s ex:name ?n } }"
    )
    assert lex_set(rows, "s") == {"http://u#ld"}
    with pytest.raises(FileNotFoundError):
        repo.update("LOAD <file:///nonexistent.ttl>")
    repo.update("LOAD SILENT <file:///nonexistent.ttl>")  # no raise


def test_with_graph(repo):
    repo.update(P + "INSERT DATA { GRAPH ex:wg { ex:x ex:age 9 } }")
    repo.update(P + """
        WITH ex:wg DELETE { ?s ex:age ?a } INSERT { ?s ex:age 10 } WHERE { ?s ex:age ?a }
    """)
    rows = repo.sparql_collect(
        P + "SELECT ?a WHERE { GRAPH ex:wg { ex:x ex:age ?a } }"
    )
    assert [r["a"].lex for r in rows] == ["10"]


def test_update_reruns_inference(spark):
    eng = Engine(spark)
    r = eng.create_repository("upd_inf", ruleset="rdfsplus")
    r.load_turtle("""
        @prefix ex: <http://u#> .
        @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        ex:hasType rdfs:domain ex:Facility .
    """)
    r.update(P + "INSERT DATA { ex:new ex:hasType ex:Park . }")
    rows = r.sparql_collect(P + "SELECT ?f WHERE { ?f a ex:Facility }")
    assert lex_set(rows, "f") == {"http://u#new"}


# -- results JSON (S4) -------------------------------------------------------

def test_sparql_results_json(repo):
    doc = repo.sparql_json(
        P + 'SELECT ?x ?n WHERE { ?x ex:name ?n . FILTER(?n = "Alice") }'
    )
    assert doc["head"]["vars"] == ["x", "n"]
    [b] = doc["results"]["bindings"]
    assert b["x"] == {"type": "uri", "value": "http://u#a"}
    assert b["n"] == {"type": "literal", "value": "Alice"}


def test_sparql_results_json_typed_and_lang(spark):
    eng = Engine(spark)
    r = eng.create_repository("json_t", ruleset="none")
    r.load_turtle('@prefix ex: <http://u#> .\nex:a ex:v 5 .\nex:a ex:l "hi"@en .')
    doc = r.sparql_json(P + "SELECT ?v ?l WHERE { ex:a ex:v ?v ; ex:l ?l }")
    [b] = doc["results"]["bindings"]
    assert b["v"]["datatype"].endswith("integer")
    assert b["l"]["xml:lang"] == "en"


def test_sparql_results_json_ask_and_unbound(repo):
    assert repo.sparql_json(P + "ASK { ex:a ex:p ex:b }") == {
        "head": {}, "boolean": True,
    }
    doc = repo.sparql_json(
        P + "SELECT ?x ?m WHERE { ?x ex:p ?y . OPTIONAL { ?x ex:missing ?m } }"
    )
    [b] = doc["results"]["bindings"]
    assert "m" not in b  # unbound var absent from binding (spec)


# -- FROM / FROM NAMED (F6) --------------------------------------------------

@pytest.fixture()
def dataset_repo(spark):
    eng = Engine(spark)
    r = eng.create_repository("ds_repo", ruleset="none")
    r._quads = None
    r.load_turtle("@prefix ex: <http://u#> .\nex:d ex:v 1 .")
    r.load_turtle("@prefix ex: <http://u#> .\nex:g1 ex:v 2 .", graph="http://u#G1")
    r.load_turtle("@prefix ex: <http://u#> .\nex:g2 ex:v 3 .", graph="http://u#G2")
    return r


def test_no_dataset_union_default(dataset_repo):
    rows = dataset_repo.sparql_collect("SELECT ?s WHERE { ?s <http://u#v> ?o }")
    assert len(rows) == 3  # GraphDB-style union default graph


def test_from_restricts_default(dataset_repo):
    rows = dataset_repo.sparql_collect(
        "SELECT ?s FROM <http://u#G1> WHERE { ?s <http://u#v> ?o }"
    )
    assert lex_set(rows, "s") == {"http://u#g1"}


def test_from_named_restricts_graph(dataset_repo):
    rows = dataset_repo.sparql_collect(
        "SELECT ?g ?s FROM NAMED <http://u#G2> WHERE { GRAPH ?g { ?s ?p ?o } }"
    )
    assert lex_set(rows, "g") == {"http://u#G2"}
    # FROM without FROM NAMED: GRAPH ranges over nothing
    rows2 = dataset_repo.sparql_collect(
        "SELECT ?g FROM <http://u#G1> WHERE { GRAPH ?g { ?s ?p ?o } }"
    )
    assert rows2 == []


# -- transactions (RDF4J model: buffered ops, atomic commit) -----------------

def test_transaction_isolation_and_atomic_commit(spark):
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    r = eng.create_repository("txn_iso", ruleset="none")
    r.load_turtle("@prefix ex: <http://t#> . ex:a ex:p ex:b .")

    tx = r.begin()
    tx.add_turtle("@prefix ex: <http://t#> . ex:c ex:p ex:d .")
    tx.delete_turtle("@prefix ex: <http://t#> . ex:a ex:p ex:b .")

    # read-your-writes inside the transaction ...
    in_tx = tx.query(
        "PREFIX ex: <http://t#> SELECT ?s WHERE { ?s ex:p ?o }"
    ).collect()
    assert sorted(row[0].lex for row in in_tx) == ["http://t#c"]
    # ... but NOTHING visible outside before commit
    outside = r.sparql_collect(
        "PREFIX ex: <http://t#> SELECT ?s WHERE { ?s ex:p ?o }"
    )
    assert sorted(row[0].lex for row in outside) == ["http://t#a"]

    tx.commit()
    after = r.sparql_collect(
        "PREFIX ex: <http://t#> SELECT ?s WHERE { ?s ex:p ?o }"
    )
    assert sorted(row[0].lex for row in after) == ["http://t#c"]
    with pytest.raises(ValueError, match="no longer open"):
        tx.add_turtle("@prefix ex: <http://t#> . ex:e ex:p ex:f .")


def test_transaction_rollback_discards_everything(spark):
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    r = eng.create_repository("txn_rb", ruleset="none")
    r.load_turtle("@prefix ex: <http://t#> . ex:a ex:p ex:b .")
    tx = r.begin()
    tx.update('INSERT DATA { <urn:x> <urn:p> "v" }')
    tx.rollback()
    assert r.count() == 1


def test_load_from_http_url(spark, tmp_path):
    """SPARQL 1.1 LOAD with an http source fetches the remote document
    into the target graph; SILENT on a dead endpoint is a no-op."""
    import functools
    import threading
    from http.server import HTTPServer, SimpleHTTPRequestHandler

    from dublin_smart_city_graphdb_spark.engine import Engine

    (tmp_path / "remote.ttl").write_text(
        "@prefix ex: <http://r#> . ex:a ex:p ex:b . ex:c ex:p ex:d ."
    )
    handler = functools.partial(
        SimpleHTTPRequestHandler, directory=str(tmp_path)
    )
    httpd = HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/remote.ttl"
        eng = Engine(spark)
        r = eng.create_repository("load_http", ruleset="none")
        r.update(f"LOAD <{url}> INTO GRAPH <http://g/remote>")
        rows = r.sparql_collect(
            "SELECT ?s WHERE { GRAPH <http://g/remote> { ?s ?p ?o } }"
        )
        assert len(rows) == 2
        # SILENT failure: no-op
        r.update("LOAD SILENT <http://127.0.0.1:9/nope.ttl>")
        assert r.count() == 2
        # non-SILENT failure raises
        with pytest.raises(ValueError, match="LOAD failed"):
            r.update("LOAD <http://127.0.0.1:9/nope.ttl>")
    finally:
        httpd.shutdown()
        httpd.server_close()
