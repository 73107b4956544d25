"""Columnar schemas: the canonical ``quads`` table and the binding struct.

``QUAD_SCHEMA`` matches FIXTURES.md §A exactly: one row per RDF statement,
object flattened with typed shadow columns (``o_num``/``o_ts``/``o_bool``)
populated at load so FILTER comparisons run JVM-side without per-query
casting (mirrors the reference's numeric-range filter,
``facilities.ttl:216-217``).

``TERM_FIELDS`` is the per-variable struct the SPARQL compiler carries
through joins: term identity is (kind, lex, dtype, lang); num/ts/bool are
derived shadow values. At cluster scale a dictionary-encoded term id would
shrink shuffle width further; the struct keeps round 1 simple and the join
keys are already narrow (kind+lex).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DecimalType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

KIND_IRI = 0
KIND_BLANK = 1
KIND_LITERAL = 2
KIND_TRIPLE = 3  # RDF-star quoted triple (lex = canonical N-Triples-star text)

QUAD_SCHEMA = StructType(
    [
        StructField("g", StringType(), True),
        StructField("s", StringType(), False),
        StructField("p", StringType(), False),
        StructField("o_kind", ByteType(), False),
        StructField("o_lex", StringType(), False),
        StructField("o_dtype", StringType(), True),
        StructField("o_lang", StringType(), True),
        StructField("o_num", DecimalType(38, 10), True),
        StructField("o_ts", TimestampType(), True),
        StructField("o_bool", BooleanType(), True),
    ]
)

# Field order of every variable-binding struct column in compiled plans.
TERM_FIELDS = ("kind", "lex", "dtype", "lang", "num", "ts", "bool")

TERM_STRUCT = StructType(
    [
        StructField("kind", ByteType(), True),
        StructField("lex", StringType(), True),
        StructField("dtype", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("num", DecimalType(38, 10), True),
        StructField("ts", TimestampType(), True),
        StructField("bool", BooleanType(), True),
    ]
)

INFERRED_GRAPH = "urn:inferred"
