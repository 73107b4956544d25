"""PySpark Python DataSource for RDF: `spark.read.format("rdf")` must load
Turtle / N-Triples / N-Quads into QUAD_SCHEMA with the same results as the
imperative loaders, and split large line-delimited files into byte-range
partitions that cover every line exactly once."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dublin_smart_city_graphdb_spark.sources import datasource as ds
from dublin_smart_city_graphdb_spark.sources.datasource import register_rdf_source

TTL = """@prefix ex: <http://d#> .
ex:a ex:p ex:b ; ex:n 5 .
ex:b ex:label "caf\\u00e9"@fr .
"""


@pytest.fixture(scope="module")
def registered(spark):
    register_rdf_source(spark)
    return spark


def test_turtle_file_reads_to_quads(registered, tmp_path):
    p = tmp_path / "g.ttl"
    p.write_text(TTL)
    df = registered.read.format("rdf").option("path", str(p)).load()
    assert df.count() == 3
    assert df.filter(F.col("o_lang") == "fr").count() == 1
    # shadow column populated for the numeric literal
    assert df.filter(F.col("o_num") == 5).count() == 1


def test_ntriples_with_graph_option(registered, tmp_path):
    p = tmp_path / "d.nt"
    p.write_text(
        "<urn:a> <urn:p> <urn:b> .\n"
        '<urn:a> <urn:q> "x" .\n'
    )
    df = (
        registered.read.format("rdf")
        .option("path", str(p))
        .option("graph", "http://g/feed")
        .load()
    )
    assert df.count() == 2
    assert df.filter(F.col("g") == "http://g/feed").count() == 2


def test_nquads_graph_labels(registered, tmp_path):
    p = tmp_path / "d.nq"
    p.write_text(
        "<urn:a> <urn:p> <urn:b> <http://g/one> .\n"
        "<urn:c> <urn:p> <urn:d> .\n"
    )
    df = registered.read.format("rdf").option("path", str(p)).load()
    assert df.filter(F.col("g") == "http://g/one").count() == 1
    assert df.filter(F.col("g").isNull()).count() == 1


def test_directory_of_mixed_files(registered, tmp_path):
    (tmp_path / "a.ttl").write_text("@prefix e: <http://d#> . e:x e:p e:y .")
    (tmp_path / "b.nt").write_text("<urn:m> <urn:p> <urn:n> .\n")
    df = registered.read.format("rdf").option("path", str(tmp_path)).load()
    assert df.count() == 2


def test_byte_range_split_covers_every_line_once(registered, tmp_path, monkeypatch):
    """Force tiny splits: N lines over many byte-range partitions must
    produce exactly N rows (boundary lines neither lost nor doubled)."""
    n = 500
    p = tmp_path / "big.nt"
    p.write_text(
        "".join(f"<urn:s{i}> <urn:p> <urn:o{i}> .\n" for i in range(n))
    )
    monkeypatch.setattr(ds, "_SPLIT_BYTES", 256)
    df = registered.read.format("rdf").option("path", str(p)).load()
    reader = ds.RdfReader({"path": str(p)})
    assert len(reader.partitions()) > 10  # genuinely split
    assert df.count() == n
    assert df.select("s").distinct().count() == n
