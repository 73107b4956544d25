"""Adversarial edge-case corpus for the text/curation operators.

The driver's oracle gate runs over well-behaved synthetic documents; this
suite re-runs the same Spark-vs-DuckDB comparison over a corpus built to
hit the boundaries — empty text, one word, all stopwords, heavy
repetition, unicode, punctuation-only — so divergent NULL/empty handling
between the engines (or a crash) surfaces here, not at scale.
"""

from __future__ import annotations

import duckdb
import pytest

from dublin_smart_city_graphdb_spark import harness
from tools.check_oracle import TABLES, compare

EDGE_DOCS = [
    # (doc_id, text, lang, source, n_chars) — n_chars mirrors len(text)
    (0, "", "en", "src0", 0),
    (1, "word", "en", "src0", 4),
    (2, "the a of and to in", "en", "src1", 18),          # all stopwords
    (3, "x " * 49 + "x", "en", "src1", 99),                # one word repeated
    (4, "a b a b a b a b a b", "en", "src2", 19),          # repeated bigram
    (5, "naïve café über déjà-vu", "fr", "src2", 23),      # non-ascii
    (6, "!!! ??? ... ---", "en", "src3", 15),              # no alpha at all
    (7, "the quick brown fox jumps over the lazy dog again and again", "en",
     "src3", 60),
    (8, "single", "en", "src4", 6),
    (9, "tab\tand  double  spaces", "en", "src4", 23),     # odd whitespace
]

# Ops whose only input is the documents table and whose oracle is total
# (defined for every document, including empty/degenerate ones).
EDGE_OPS = [
    "dedup_exact",
    "text_quality",
    "text_tokens",
    "text_fingerprint",
    "text_langid",
    "text_repetition",
    "text_unigram_logprob",
    "corpus_filter_rules",
    "corpus_mix_report",
    "dedup_simhash",
    "dedup_minhash_sig",
    "dedup_ngram_jaccard",
]


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    docs = spark.createDataFrame(
        EDGE_DOCS, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    docs.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            con.execute(
                "CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{edge_sf_dir}/documents.parquet/*.parquet')"
            )
    return con


@pytest.mark.parametrize("name", EDGE_OPS)
def test_edge_corpus_matches_oracle(spark, edge_sf_dir, edge_duck, name):
    q = harness.REGISTRY[name]
    # raw_fn: the plan cache must not leak plans across the real/edge dirs
    # (it keys on sf_dir, so using the cached fn would also be safe — raw
    # keeps the test independent of cache policy).
    ok, msg, _ = compare(name, spark, edge_duck, edge_sf_dir, q.raw_fn, q.oracle)
    assert ok, f"{name}: {msg}"


EDGE_EMB_OPS = ["embed_quantize_int8", "embedding_cosine_pairs", "kmeans_embeddings"]


@pytest.fixture(scope="module")
def edge_emb_dir(spark, tmp_path_factory):
    """Edge embeddings: a zero vector (scale 0 → NULL quantization), an
    exact-duplicate pair (cosine ties at 1.0), a constant vector, and a
    handful of regulars — 64-dim float32 like the driver testdata."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        ArrayType, FloatType, IntegerType, LongType, StructField, StructType,
    )

    d = tmp_path_factory.mktemp("edge_emb")
    dim = 64

    def vec(seed):
        return [((seed * 31 + i * 7) % 13 - 6) / 7.0 for i in range(dim)]

    rows = [
        (0, [0.0] * dim, 0),            # zero vector
        (1, vec(3), 1),
        (2, vec(3), 1),                  # exact duplicate of 1 (cosine 1.0)
        (3, [0.5] * dim, 2),             # constant vector
        (4, vec(9), 0),
        (5, [-x for x in vec(9)], 2),    # antipode of 4 (cosine -1.0)
    ]
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ])
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def edge_emb_duck(edge_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{edge_emb_dir}/embeddings.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EDGE_EMB_OPS)
def test_edge_embeddings_match_oracle(spark, edge_emb_dir, edge_emb_duck, name):
    q = harness.REGISTRY[name]
    ok, msg, _ = compare(
        name, spark, edge_emb_duck, edge_emb_dir, q.raw_fn, q.oracle
    )
    assert ok, f"{name}: {msg}"
