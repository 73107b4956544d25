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
    res = compare(name, spark, edge_duck, edge_sf_dir, q.raw_fn, q.oracle)
    assert res.ok, f"{name}: {res.msg}"


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
    res = compare(
        name, spark, edge_emb_duck, edge_emb_dir, q.raw_fn, q.oracle
    )
    assert res.ok, f"{name}: {res.msg}"


EDGE_EVENT_OPS = [
    "events_tumbling",
    "events_sessionize",
    "events_sessionize_bucketed",
    "events_quantiles",
    "events_rolling_avg",
    "events_asof_join",
    "events_asof_join_bucketed",
    "events_range_join",
    "events_anomaly_zscore",
    "events_json_props",
    "events_top_users_hourly",
]


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory):
    """Edge events: same-timestamp ties (same user), a constant-valued
    event type (variance 0 → z-score division hazard), a single-event
    user, non-integral and malformed JSON props, and a session exactly at
    the 30-min gap boundary."""
    import datetime as dt

    d = tmp_path_factory.mktemp("edge_events")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (0, at(0), 1, "view", 10.0, '{"k": 1}'),
        (1, at(0), 1, "view", 20.0, '{"k": 2}'),       # tie: same user+ts
        (2, at(0), 1, "purchase", 5.0, '{"k": 3}'),    # purchase at tie ts
        (3, at(1800), 1, "view", 30.0, '{"k": 4}'),    # exactly the 30-min gap
        (4, at(1801), 1, "purchase", 6.0, None),       # null props
        (5, at(3600), 2, "constant", 7.0, '{"k": 1.5}'),   # non-integral k
        (6, at(3700), 2, "constant", 7.0, '{"k": "x"}'),   # non-numeric k
        (7, at(3800), 2, "constant", 7.0, "not json"),     # malformed props
        (8, at(7200), 3, "error", 100.0, '{"k": 0}'),  # single-event user
        (9, at(7500), 3, "view", -50.0, '{}'),         # negative value, no k
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_events_duck(edge_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{edge_events_dir}/events.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EDGE_EVENT_OPS)
def test_edge_events_match_oracle(spark, edge_events_dir, edge_events_duck, name):
    q = harness.REGISTRY[name]
    res = compare(
        name, spark, edge_events_duck, edge_events_dir, q.raw_fn, q.oracle
    )
    assert res.ok, f"{name}: {res.msg}"
