"""Repository dump/restore (VERDICT r4 task 8): GraphDB-style full-repo
export (distributed N-Quads incl. the inferred-graph marker + config
JSON) and exact recreation."""

from __future__ import annotations

import json

import pytest

from dublin_smart_city_graphdb_spark.engine import Engine
from dublin_smart_city_graphdb_spark.model.schema import INFERRED_GRAPH

EX = "http://d.org/"

DATA = f"""
@prefix ex: <{EX}> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
ex:worksFor rdfs:domain ex:Person .
ex:alice ex:worksFor ex:acme ; ex:name "Alice" .
ex:bob ex:knows ex:alice .
"""

QUERY = f"""
SELECT ?s WHERE {{ ?s a <{EX}Person> }} ORDER BY ?s
"""


def _results(repo):
    return [tuple(t["lex"] for t in r) for r in repo.sparql(QUERY).collect()]


def test_dump_drop_restore_equivalence(spark, tmp_path):
    eng = Engine(spark)
    repo = eng.create_repository("dump_src", ruleset="rdfsplus",
                                 query_timeout=17.5)
    repo.load_turtle_text(DATA)
    repo.load_turtle_text(
        f'<{EX}g1> <{EX}p> "in-graph" .', graph=EX + "namedg"
    )
    before = _results(repo)
    assert before == [(EX + "alice",)]  # inferred via rdfs:domain
    n_before = repo.count()
    n_inferred = repo.quads.filter(f"g = '{INFERRED_GRAPH}'").count()
    assert n_inferred > 0

    dest = str(tmp_path / "dump")
    info = eng.dump_repository("dump_src", dest)
    assert info["statements"] == n_before
    cfg = json.load(open(f"{dest}/config.json"))
    assert cfg["query_timeout"] == 17.5 and cfg["ruleset"] == "rdfsplus"

    eng.drop_repository("dump_src")
    assert "dump_src" not in eng.list_repositories()

    restored = eng.restore_repository("dump_src", dest)
    assert restored.count() == n_before
    # the inferred closure came from the dump, not a re-run
    assert restored.quads.filter(
        f"g = '{INFERRED_GRAPH}'"
    ).count() == n_inferred
    assert _results(restored) == before
    assert restored.config["query_timeout"] == 17.5
    # named graph survived
    got = restored.sparql(
        f'SELECT ?s WHERE {{ GRAPH <{EX}namedg> {{ ?s ?p "in-graph" }} }}'
    ).collect()
    assert [r[0]["lex"] for r in got] == [EX + "g1"]
    # restoring over a live repository refuses
    with pytest.raises(ValueError):
        eng.restore_repository("dump_src", dest)
    eng.drop_repository("dump_src")


def test_cli_dump_restore(spark, tmp_path, capsys):
    from dublin_smart_city_graphdb_spark.__main__ import main

    wh = str(tmp_path / "wh")
    data = tmp_path / "d.ttl"
    data.write_text(DATA)
    assert main(["--warehouse", wh, "init", "--repo", "r1",
                 "--ruleset", "rdfsplus", "--data", str(data)]) == 0
    dest = str(tmp_path / "dump")
    assert main(["--warehouse", wh, "dump", "--repo", "r1",
                 "--dest", dest]) == 0
    out = capsys.readouterr().out
    assert "dumped" in out
    assert main(["--warehouse", wh, "restore", "--repo", "r2",
                 "--src", dest]) == 0
    out = capsys.readouterr().out
    assert "restored 'r2'" in out
    eng = Engine(spark, warehouse=wh)
    assert sorted(eng.list_repositories()) == ["r1", "r2"]
    assert eng.repository("r2").count() == eng.repository("r1").count()
    eng.drop_repository("r1")
    eng.drop_repository("r2")
