"""RFC 3986 reference resolution for IRI()/URI() and parsed IRIREFs
(ADVICE r4): the §5.4 reference-resolution examples, run against both the
pure-Python resolver (parser path) and the JVM Column twin (IRI()/URI()
runtime path).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dublin_smart_city_graphdb_spark.model.terms import resolve_iri
from dublin_smart_city_graphdb_spark.sparql.exprs import _resolve_against_base

BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4.1 (normal) + §5.4.2 (abnormal) examples.
VECTORS = [
    ("g:h", "g:h"),
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
]


@pytest.mark.parametrize("ref,expected", VECTORS)
def test_python_resolver(ref, expected):
    assert resolve_iri(BASE, ref) == expected


def test_column_resolver_matches_rfc_vectors(spark):
    df = spark.createDataFrame(
        [(r,) for r, _ in VECTORS], "ref string"
    ).withColumn("out", _resolve_against_base(F.col("ref"), BASE))
    got = {r["ref"]: r["out"] for r in df.collect()}
    for ref, expected in VECTORS:
        assert got[ref] == expected, f"ref={ref!r}"


def test_base_without_trailing_slash_in_query(spark, tmp_path):
    """End-to-end: BASE not ending in '/' or '#' must resolve by RFC
    merge (drop the last segment), not concat."""
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    repo = eng.create_repository("iri_base_test", ruleset="empty")
    rows = repo.sparql(
        'BASE <http://example.org/dir/doc>\n'
        'SELECT ?x ?y ?z WHERE { BIND(IRI("other") AS ?x) '
        'BIND(IRI("../up") AS ?y) BIND(IRI("/abs") AS ?z) }'
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["x"]["lex"] == "http://example.org/dir/other"
    assert r["y"]["lex"] == "http://example.org/up"
    assert r["z"]["lex"] == "http://example.org/abs"
    eng.drop_repository("iri_base_test")
