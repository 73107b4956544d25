"""N-Triples export round-trip, warehouse persistence across engine
restarts, and the reference's 30s query-timeout enforcement."""

from __future__ import annotations

import time

import pytest

from dublin_smart_city_graphdb_spark.engine import Engine
from dublin_smart_city_graphdb_spark.sources.turtle import parse_ntriples_lines
from dublin_smart_city_graphdb_spark.sparql.protocol import (
    construct_to_ntriples,
    quads_to_ntriples,
)

TTL = """
@prefix ex: <http://nt#> .
ex:a ex:knows ex:b .
ex:a ex:name "Al\\"ice\\nsmith"@en .
ex:b ex:age 30 .
_:bn ex:p ex:a .
"""


def test_ntriples_export_roundtrip(spark):
    eng = Engine(spark)
    repo = eng.create_repository("nt_export", ruleset="none")
    repo.load_turtle(TTL)
    lines = [r["value"] for r in quads_to_ntriples(repo.quads).collect()]
    assert len(lines) == 4
    reparsed = list(parse_ntriples_lines(iter(lines)))
    original = {tuple(r) for r in repo.quads.collect()}
    assert {tuple(r) for r in reparsed} == original


def test_construct_export(spark):
    eng = Engine(spark)
    repo = eng.create_repository("nt_construct", ruleset="none")
    repo.load_turtle(TTL)
    df = repo.sparql(
        "PREFIX ex: <http://nt#> "
        "CONSTRUCT { ?x ex:linked ?y } WHERE { ?x ex:knows ?y }"
    )
    lines = [r["value"] for r in construct_to_ntriples(df).collect()]
    assert lines == ["<http://nt#a> <http://nt#linked> <http://nt#b> ."]


def test_warehouse_persists_across_engine_restart(spark, tmp_path):
    wh = str(tmp_path / "wh")
    eng1 = Engine(spark, warehouse=wh)
    r1 = eng1.create_repository("persistent", ruleset="none", query_timeout=12.5)
    r1.load_turtle(TTL)
    assert r1.count() == 4

    # a NEW engine over the same warehouse sees the repository, its config,
    # and its statements (the reference's idempotent re-init path,
    # init-graphdb.sh:145-154)
    eng2 = Engine(spark, warehouse=wh)
    assert eng2.list_repositories() == ["persistent"]
    r2 = eng2.repository("persistent")
    assert r2.config["query_timeout"] == 12.5
    assert r2.count() == 4
    rows = r2.sparql_collect(
        "SELECT ?o WHERE { <http://nt#a> <http://nt#knows> ?o }"
    )
    assert [r["o"].lex for r in rows] == ["http://nt#b"]


def test_query_timeout_cancels(spark):
    eng = Engine(spark)
    repo = eng.create_repository("timeout_repo", ruleset="none")
    # ~300 triples, 4 fully-unbound patterns: deliberately slow through ROW
    # explosion (300^4 ≈ 8·10^9 cross-joined rows), NOT partition
    # explosion — a long chain of unbound patterns over a multi-partition
    # store used to build a CartesianRDD with ~10^8 Partition objects
    # (gigabytes of driver heap the cancelled job kept pinned, poisoning
    # the shared suite JVM until a later test OOM'd); the compiler now
    # caps cartesian partition products, and this test's slowness no
    # longer depends on that pathology.
    repo.load_turtle(
        "@prefix ex: <http://t#> .\n"
        + "\n".join(f"ex:s{i} ex:p{i % 7} ex:o{i} ." for i in range(300))
    )
    slow = """
        SELECT (COUNT(*) AS ?n) WHERE {
          ?a ?p1 ?b . ?c ?p2 ?d . ?e ?p3 ?f . ?g ?p4 ?h .
        }
    """
    t0 = time.time()
    try:
        with pytest.raises(TimeoutError):
            repo.sparql_collect(slow, timeout=2)
        assert time.time() - t0 < 30
    finally:
        # belt-and-braces: never let a straggler task wedge the shared JVM
        spark.sparkContext.cancelAllJobs()


def test_nquads_roundtrip(spark, tmp_path):
    """N-Quads bulk load → GRAPH-scoped query → N-Quads export → reload:
    graph labels survive the full cycle."""
    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.sparql.protocol import quads_to_nquads

    nq = tmp_path / "data.nq"
    nq.write_text(
        '<http://x#a> <http://x#p> "v1" <http://g#one> .\n'
        '<http://x#a> <http://x#p> "v2"@en <http://g#two> .\n'
        '<http://x#a> <http://x#q> <http://x#b> .\n'  # default graph
        '_:b0 <http://x#p> "3"^^<http://www.w3.org/2001/XMLSchema#integer> <http://g#one> .\n'
    )
    eng = Engine(spark)
    repo = eng.create_repository("nq", ruleset="none")
    repo.load_nquads(str(nq))

    rows = repo.sparql_collect(
        "SELECT ?g ?o WHERE { GRAPH ?g { <http://x#a> <http://x#p> ?o } }"
    )
    got = sorted((r["g"]["lex"], r["o"]["lex"]) for r in rows)
    assert got == [("http://g#one", "v1"), ("http://g#two", "v2")]

    # default-graph statement must NOT appear under GRAPH ?g
    assert all(g.startswith("http://g#") for g, _ in got)

    exported = sorted(r["value"] for r in quads_to_nquads(repo.quads).collect())
    assert '<http://x#a> <http://x#p> "v1" <http://g#one> .' in exported
    assert '<http://x#a> <http://x#q> <http://x#b> .' in exported  # no 4th term

    # reload the export into a fresh repo → identical statement set
    nq2 = tmp_path / "rt.nq"
    nq2.write_text("\n".join(exported) + "\n")
    repo2 = eng.create_repository("nq2", ruleset="none")
    repo2.load_nquads(str(nq2))
    assert repo2.count() == repo.count()


def test_store_compaction(spark, tmp_path):
    """Small-file compaction: many appended files per predicate partition
    collapse to the stats-derived target count; statements and predicate
    stats are unchanged."""
    import os

    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    repo = eng.create_repository("cmp", ruleset="none")
    for i in range(6):  # 6 appends → ≥6 files per touched partition
        repo.load_turtle(
            f'@prefix ex: <http://c#> . ex:s{i} ex:p "v{i}" ; ex:q {i} .'
        )
    store = repo._store
    before_files = sum(
        1 for _, _, names in os.walk(store.path)
        for f in names if f.endswith(".parquet")
    )
    before_rows = sorted(repo.quads.collect())
    before_stats = store.predicate_stats()

    after_files = store.compact()
    repo._quads = store.read()

    assert after_files < before_files
    assert after_files == 2  # one right-sized file per predicate
    assert sorted(repo.quads.collect()) == before_rows
    assert store.predicate_stats() == before_stats
    # the swap left no temp/backup directories behind
    parent = os.path.dirname(store.path)
    assert not [e for e in os.listdir(parent) if e.endswith((".old", ".compacting"))]


def test_store_backed_inference_and_update_rewrite(spark, tmp_path):
    """Overwriting the quad store from a plan that READS the same store
    (inference re-materialization, SPARQL UPDATE rewrites) must not delete
    the source files under the running job — regression for the
    write-aside-and-swap path in QuadStore.write(mode='overwrite')."""
    wh = str(tmp_path / "wh")
    eng = Engine(spark, warehouse=wh)
    r = eng.create_repository("rw", ruleset="rdfsplus")
    # first load: append + full materialization over the store
    r.load_turtle(
        "@prefix ex: <http://x#> .\n"
        "ex:knows a <http://www.w3.org/2002/07/owl#SymmetricProperty> .\n"
        "ex:a ex:knows ex:b .\n"
    )
    inferred = r.sparql_collect(
        "SELECT ?s WHERE { <http://x#b> <http://x#knows> ?s }"
    )
    assert [x["s"].lex for x in inferred] == ["http://x#a"]
    # incremental append over the store-backed repo
    r.load_turtle("@prefix ex: <http://x#> .\nex:c ex:knows ex:a .\n")
    assert (
        len(r.sparql_collect("SELECT ?s ?o WHERE { ?s <http://x#knows> ?o }"))
        == 4
    )
    # full re-materialization (store → plan → overwrite same store)
    r.materialize_inference()
    # UPDATE rewrite (anti-join over the store → overwrite same store)
    r.update("DELETE WHERE { <http://x#c> ?p ?o }")
    rows = r.sparql_collect("SELECT ?s ?o WHERE { ?s <http://x#knows> ?o }")
    assert {(x["s"].lex, x["o"].lex) for x in rows} >= {
        ("http://x#a", "http://x#b"),
        ("http://x#b", "http://x#a"),
    }
    assert all(x["s"].lex != "http://x#c" for x in rows)


def test_gzip_ntriples_bulk_load(spark, tmp_path):
    """Compressed N-Triples feeds load through the same distributed reader
    (spark.read.text decodes .gz transparently) — the common wire format
    for bulk RDF dumps. Gzip is non-splittable, so one file = one task:
    bulk dumps should ship as many .gz parts, each a parallel unit."""
    import gzip

    nt = tmp_path / "bulk.nt.gz"
    lines = "".join(
        f'<http://x#s{i}> <http://x#p> "{i}"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        for i in range(100)
    )
    with gzip.open(nt, "wt") as f:
        f.write(lines)
    eng = Engine(spark)
    r = eng.create_repository("gz", ruleset="none")
    r.load_ntriples(str(nt))
    assert r.count() == 100
    rows = r.sparql_collect(
        "SELECT (SUM(?v) AS ?total) WHERE { ?s <http://x#p> ?v }"
    )
    assert rows[0]["total"].lex == "4950"
