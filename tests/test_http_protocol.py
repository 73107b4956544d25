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
