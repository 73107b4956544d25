"""LLM-training-data-pipeline extension queries (SURVEY.md §7 M8).

Deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force cosine top-k), text analysis
(language-ID, quality scoring, token counting, fingerprinting), and batch
analogs of the streaming window operators, over the driver's ``documents`` /
``embeddings`` / ``events`` tables.

Determinism strategy for oracle parity: all hashing is MD5 (bit-identical in
Spark and DuckDB) with the first 15 hex digits parsed as a 60-bit integer —
``conv(substr(md5(x),1,15),16,10)`` in Spark ≡ ``('0x'||substr(md5(x),1,15))
::BIGINT`` in DuckDB. Floating-point similarity scores are computed in double
precision and rounded to 6 dp on both sides.

Scale notes: every dedup operator is shuffle-bounded by (shingle|band|token,
doc) pairs — no O(n²) all-pairs stage. Candidate generation is blocking-based
(shared shingle / LSH band / query-set restriction), the standard web-scale
dedup shape (cf. Spark MLlib's public MinHashLSH, re-expressed here as pure
DataFrame ops so the DuckDB oracle can mirror the exact semantics).
"""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from dublin_smart_city_graphdb_spark.harness.registry import load, load_events, register


def _hash60_spark(expr: str) -> str:
    """Spark SQL fragment: deterministic 60-bit integer hash of a string."""
    return f"CAST(conv(substr(md5(CAST({expr} AS BINARY)), 1, 15), 16, 10) AS BIGINT)"


def _hash60_duck(expr: str) -> str:
    """DuckDB fragment computing the identical 60-bit hash."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy on normalized text (SURVEY §7 dedup #1)
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    """
    SELECT md5(lower(trim(text))) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(lower(trim(text)))
    """,
    doc="Exact dedup: normalize → md5 → groupBy(hash); keep min doc_id. One "
        "shuffle on the 128-bit hash; map-side partial agg collapses "
        "duplicates before the shuffle at scale.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.trim(F.col("text"))).cast("binary"))
    return d.groupBy(h.alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


# ---------------------------------------------------------------------------
# Shingling helpers (word k-grams; shared by MinHash and Jaccard dedup)
# ---------------------------------------------------------------------------

def _arr_let(arr, body):
    """Single-evaluation let binding for an array Column consumed inside
    a higher-order-function lambda. HOFs run INTERPRETED (never
    whole-stage codegen), and interpreted evaluation is a pure tree
    walk: an array expression referenced inside a per-element lambda is
    re-evaluated ON EVERY ELEMENT — ``element_at(hs, i)`` with ``hs`` a
    derived array recomputes the whole array per shingle, turning an
    O(tokens) map-side pass into O(tokens²) per document. Routing the
    array through a one-element ``transform`` makes every reference a
    lambda-variable access — a leaf. Measured on the sf0.1 shingle
    pass: 2.3–27 s → 0.33 s, bit-identical output. (Same trick as the
    geo kernels' ``_let`` in sparql/extensions.py.)"""
    return F.get(F.transform(F.array(arr), body), 0)


def _shingle_arr(k: int):
    """Column expr: distinct word-k-gram shingle array for ``text``.
    The word array is let-bound (``_arr_let``) so the per-shingle slice
    reads an evaluated array instead of re-splitting the text per
    shingle."""
    return _arr_let(
        F.split(F.col("text"), " "),
        lambda w: F.when(
            F.size(w) >= k,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - (k - 1)),
                    lambda i: F.concat_ws(" ", F.slice(w, i, k)),
                )
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def _shingle_hash_arr(k: int):
    """Column expr: distinct 64-bit-hashed word-k-gram shingles for
    ``text``. Each word is xxhash64'd ONCE, then each k-gram hashes the k
    word-hash longs (fixed-width input) — no shingle strings are ever
    built and no word is string-hashed k times. Equality matches string
    shingles exactly (words cannot contain the separator) up to 64-bit
    hash collisions (~n²/2⁶⁴). The word-hash array is let-bound
    (``_arr_let``): without it the interpreter re-evaluated the whole
    split+hash array per shingle — the O(tokens²) trap measured at
    2.3–27 s vs 0.33 s on the sf0.1 shingle pass."""
    return _arr_let(
        F.transform(F.split(F.col("text"), " "), lambda x: F.xxhash64(x)),
        lambda hs: F.when(
            F.size(hs) >= k,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(hs) - (k - 1)),
                    lambda i: F.xxhash64(
                        *[F.element_at(hs, i + j) for j in range(k)]
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    )


def _bigram_structs():
    """(w1, w2) struct array over ``text``, let-bound (``_arr_let``): the
    token array evaluates once per document; the unbound form re-split
    the text per bigram under interpreted HOF evaluation — the same
    O(tokens²) trap as the shingle helpers."""
    return _arr_let(
        F.split(F.col("text"), " "),
        lambda ts: F.transform(
            F.sequence(F.lit(0), F.size(ts) - 2),
            lambda i: F.struct(
                F.get(ts, i).alias("w1"),
                F.get(ts, i + 1).alias("w2"),
            ),
        ),
    )


def _docs_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents scan, spread across the cluster. Shingling is a
    higher-order-function expression (interpreted, not codegen), so its
    map-side cost is real — but a small SF ships as ONE parquet file, which
    Spark reads as one task. Round-robin the tiny (doc_id, text) rows first
    so the shingle compute uses every core; at scale the scan already has
    many splits and this repartition is AQE-coalesced noise next to the
    groupBy shuffles that follow."""
    d = load(spark, sf_dir, "documents")
    return d.repartition(spark.sparkContext.defaultParallelism)


def _shingles_df(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """(doc_id, shingle): distinct word-k-gram shingles per document."""
    return _docs_parallel(spark, sf_dir).select(
        "doc_id", F.explode(_shingle_arr(k)).alias("shingle")
    )


# All ordered (doc_a < doc_b) pairs from a bucket's doc list ``ds``.
_PAIR_EXPLODE = (
    "flatten(transform(ds, a -> transform(filter(ds, b -> b > a), "
    "b -> named_struct('doc_a', a, 'doc_b', b))))"
)

# Ratio-pruned variant for size-packed ids (low 20 bits = shingle count):
# J >= 0.1 implies |A∩B|/max <= min/max, so any surviving pair satisfies
# max(|A|,|B|) <= 10*min(|A|,|B|) — emit only those, killing the skew-heavy
# tail of pairs a common shingle would otherwise generate between tiny and
# huge documents before the pair shuffle ever sees them.
_PAIR_EXPLODE_RATIO = (
    "flatten(transform(ds, a -> transform(filter(ds, b -> b > a AND "
    "greatest(b % 1048576, a % 1048576) <= "
    "10 * least(b % 1048576, a % 1048576)), "
    "b -> named_struct('doc_a', a, 'doc_b', b))))"
)

# Hot-bucket re-spread (round 12, guide §2.5): the in-bucket O(|bucket|²)
# pair scan of a banded-dedup bucket runs inside ONE task — fine for the
# 64-bit band keys' usual tiny buckets, a straggler (and eventually an OOM)
# for a pathological hot band value at 100 TB. Past _BUCKET_SPREAD members,
# a bucket's a-side is sliced into _BUCKET_CHUNK-sized chunks that are
# round-robin repartitioned before the scan, so the quadratic work spreads
# across the cluster. Chunking partitions the a-side positions exactly, so
# the emitted pair multiset is IDENTICAL to the single-task scan. Both
# thresholds are env-tunable (cluster operators size them to executor
# memory); the defaults keep every sf0.1 bucket (top observed: 2,566
# members) on the unchanged single-task path.
_BUCKET_SPREAD = int(os.environ.get("SPARK_GRAFT_BUCKET_SPREAD", "4096"))
_BUCKET_CHUNK = int(os.environ.get("SPARK_GRAFT_BUCKET_CHUNK", "1024"))


def _bucket_pairs(
    grouped: DataFrame, pair_expr: str,
    spread: int | None = None, chunk: int | None = None,
) -> DataFrame:
    """Exploded candidate pairs (column ``pr``) from bucket rows carrying a
    member list ``ds`` (size(ds) > 1 pre-filtered). ``pair_expr`` must be a
    ``flatten(transform(ds, a -> ...))`` template; the hot-bucket branch
    rewrites only the OUTER ``transform(ds,`` to a chunk slice. The two
    branches share the grouping exchange (ReusedExchange), and the big
    branch is empty — zero extra rows shuffled — until a bucket actually
    exceeds the spread threshold."""
    spread = _BUCKET_SPREAD if spread is None else spread
    chunk = _BUCKET_CHUNK if chunk is None else chunk
    small = grouped.filter(F.size("ds") <= spread).select(
        F.explode(F.expr(pair_expr)).alias("pr")
    )
    chunked = pair_expr.replace(
        "transform(ds,",
        f"transform(slice(ds, ci * {chunk} + 1, {chunk}),",
        1,
    )
    big = (
        grouped.filter(F.size("ds") > spread)
        .select(
            "*",  # keep the bucket key columns — pair templates may read them
            F.explode(
                F.expr(f"sequence(0, (size(ds) - 1) div {chunk})")
            ).alias("ci"),
        )
        .repartition(grouped.sparkSession.sparkContext.defaultParallelism)
        .select(F.explode(F.expr(chunked)).alias("pr"))
    )
    return small.unionByName(big)


def _shingles_cte(k: int) -> str:
    """DuckDB CTE body producing table ``sh(doc_id, shingle)``."""
    return f"""
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+{k - 1}], ' ') AS shingle
        FROM words, UNNEST(range(1, len(w) - {k - 2})) AS t(i)
        WHERE len(w) >= {k}
    )"""


# ---------------------------------------------------------------------------
# MinHash signatures (k=8 seeded md5 "permutations"; SURVEY §7 dedup #2)
# ---------------------------------------------------------------------------

_MINHASH_K = 8

# 8 independent 32-bit hash lanes from just TWO md5 evaluations per shingle
# (lanes 0-3 slice md5(shingle), lanes 4-7 slice md5('x:'||shingle)): md5 is
# the per-shingle hot cost, so this is 4x less hashing than 8 seeded md5s.
# 32 bits/lane keeps min-collisions across docs negligible while the banded
# key (2 lanes = 64 bits) stays selective.


def _mh_spark(j: int) -> str:
    seed = "shingle" if j < 4 else "concat('x:', shingle)"
    pos = 1 + 8 * (j % 4)
    return f"CAST(conv(substr(md5(CAST({seed} AS BINARY)), {pos}, 8), 16, 10) AS BIGINT)"


def _mh_duck(j: int) -> str:
    seed = "shingle" if j < 4 else "'x:' || shingle"
    pos = 1 + 8 * (j % 4)
    return f"('0x' || substr(md5({seed}), {pos}, 8))::BIGINT"


_minhash_mins_duck = ",\n           ".join(
    f"MIN({_mh_duck(j)}) AS mh{j}" for j in range(_MINHASH_K)
)

_MINHASH_SIG_SQL = f"""
    WITH {_shingles_cte(5)}
    SELECT doc_id,
           {_minhash_mins_duck}
    FROM sh GROUP BY doc_id
"""


@register(
    "dedup_minhash_sig",
    _MINHASH_SIG_SQL,
    doc="MinHash signatures: per doc, min of 8 32-bit md5-derived hash lanes "
        "over 5-word shingles (two md5s per shingle, sliced). One shuffle "
        "(groupBy doc_id); constant signature width → linear in corpus size.",
)
def dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles_df(spark, sf_dir, 5)
    aggs = [F.min(F.expr(_mh_spark(j))).alias(f"mh{j}") for j in range(_MINHASH_K)]
    return sh.groupBy("doc_id").agg(*aggs)


# ---------------------------------------------------------------------------
# MinHash-LSH candidate pairs: 4 bands × 2 rows (SURVEY §7 dedup #2, LSH)
# ---------------------------------------------------------------------------

_N_BANDS = 4

_band_selects_duck = "\n        UNION ALL\n".join(
    f"        SELECT doc_id, {b} AS band_idx, "
    f"CAST(mh{2 * b} AS VARCHAR) || ':' || CAST(mh{2 * b + 1} AS VARCHAR) AS band_val FROM sig"
    for b in range(_N_BANDS)
)

_MINHASH_PAIRS_SQL = f"""
    WITH {_shingles_cte(5)},
    sig AS (
        SELECT doc_id,
               {_minhash_mins_duck}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
{_band_selects_duck}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
"""


@register(
    "dedup_minhash_pairs",
    _MINHASH_PAIRS_SQL,
    doc="MinHash-LSH: signatures banded 4×2; docs sharing any band bucket "
        "become candidate pairs. The self-join is on (band_idx, band_val) — "
        "bucket-local, never all-pairs; skewed buckets are handled by AQE "
        "skew-join splitting at scale.",
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = dedup_minhash_sig(spark, sf_dir)
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                ":", F.col(f"mh{2 * b}").cast("string"), F.col(f"mh{2 * b + 1}").cast("string")
            ).alias("band_val"),
        )
        for b in range(_N_BANDS)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_val").alias("band_val"))
    # Bucket-grouped pair generation instead of a self-join: the signature
    # subtree is evaluated ONCE (a self-join would recompute it per side),
    # and the only shuffles are groupBy(bucket) + distinct. Buckets are tiny
    # by construction (64-bit band key); a hot bucket past the spread
    # threshold re-spreads through _bucket_pairs' chunked branch (guide
    # §2.5) instead of running its quadratic scan in one task.
    grouped = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter(F.size("ds") > 1)
    )
    return (
        _bucket_pairs(grouped, _PAIR_EXPLODE)
        .select(F.col("pr.doc_a").alias("doc_a"), F.col("pr.doc_b").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Dedup cluster assignment: connected components over the LSH pair graph
# (the keep-one-per-cluster step of a web-scale dedup pipeline)
# ---------------------------------------------------------------------------

_CLUSTERS_SQL = f"""
    WITH RECURSIVE {_shingles_cte(5)},
    sig AS (
        SELECT doc_id,
               {_minhash_mins_duck}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
{_band_selects_duck}
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    lbl AS (SELECT u AS doc_id, MIN(v) AS mn FROM reach GROUP BY u)
    SELECT d.doc_id,
           CAST(COALESCE(LEAST(l.doc_id, l.mn), d.doc_id) AS BIGINT) AS cluster_id
    FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id
"""


@register(
    "dedup_clusters",
    _CLUSTERS_SQL,
    doc="Dedup cluster assignment: hash-min connected components "
        "(graph/closure.py) over the MinHash-LSH candidate-pair graph; every "
        "document gets cluster_id = min doc_id of its near-dup component "
        "(singletons keep their own id). O(log n) min-propagation rounds, "
        "one node-id shuffle each — the distributed-CC shape that survives "
        "100 TB, oracle-checked against a recursive-CTE closure.",
    cache_plan=False,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.graph.closure import connected_components

    pairs = dedup_minhash_pairs(spark, sf_dir)
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.join(labels, docs.doc_id == labels.id, "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("cluster_id")
    )


_HOPS_SQL = f"""
    WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({_MINHASH_PAIRS_SQL})),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    lbl AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
            FROM reach GROUP BY u),
    canon AS (SELECT DISTINCT cluster_id AS node FROM lbl),
    -- bounded BFS: components are near-dup cliques/chains, diameter far
    -- below 16; the bound only caps the recursion, MIN(d) is exact
    bfs(node, d) AS (
        SELECT node, 0 FROM canon
        UNION
        SELECT e.v, b.d + 1 FROM bfs b JOIN edges e ON b.node = e.u
        WHERE b.d < 16
    )
    SELECT l.doc_id, l.cluster_id, CAST(MIN(b.d) AS BIGINT) AS hops
    FROM lbl l JOIN bfs b ON b.node = l.doc_id
    GROUP BY l.doc_id, l.cluster_id
"""


@register(
    "dedup_cluster_hops",
    _HOPS_SQL,
    doc="Near-dup neighbourhood radius: for every document in a non-"
        "singleton LSH component, the BFS hop distance to the component's "
        "canonical (min doc_id) — 0 for the canonical itself, 1 for its "
        "direct near-dups, 2+ for transitive chain members (the signal a "
        "curation pipeline uses to distrust long-chain transitive "
        "near-dup merges). Multi-source BFS (graph/closure.py:bfs_hops): "
        "semi-naive frontier expansion, one keyed join per level, deltas "
        "checkpointed, O(diameter) rounds; oracle is a bounded-depth "
        "recursive CTE over the same pair graph.",
    cache_plan=False,
)
def dedup_cluster_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.graph.closure import (
        bfs_hops,
        connected_components,
    )

    pairs = dedup_minhash_pairs(spark, sf_dir)
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    sources = labels.select(F.col("component")).distinct()
    hops = bfs_hops(sym, sources, src="u", dst="v")
    return labels.join(hops, "id").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        "hops",
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard dedup (3-word shingles, blocked by shared shingle)
# ---------------------------------------------------------------------------

_JACCARD_SQL = f"""
    WITH {_shingles_cte(3)},
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(CAST(i.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_common) >= 0.1
"""


@register(
    "dedup_ngram_jaccard",
    _JACCARD_SQL,
    doc="n-gram Jaccard near-dup: 3-word shingles; candidate pairs share ≥1 "
        "shingle (blocking join — the only shuffle is on the shingle key); "
        "J = |∩| / (|A|+|B|−|∩|) ≥ 0.1.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-pass: |A| (the doc's distinct-shingle count) rides along with
    # every exploded shingle, through the bucket, and out with each candidate
    # pair — no second documents scan, no size joins. It travels PACKED into
    # the doc id (id<<20 | n_sh, n_sh < 2^20 ≫ the shingle count of any real
    # document) so the bucket stage stays on collect_list<long>'s flat
    # primitive fast path, and pair ordering on the packed key is doc-id
    # ordering. Shuffles: groupBy(shingle) + groupBy(pair), nothing else.
    #
    # Plan-shape trap (measured 5×): packing must happen in a SEPARATE select
    # below the explode — fused into the same select, Catalyst places the
    # Project above the Generate and re-evaluates the whole shingle
    # expression per exploded row instead of per document.
    # Hashed shingles (_shingle_hash_arr): the map side never builds shingle
    # strings, and the shuffle key is 8 bytes instead of ~20+ chars.
    arr = _shingle_hash_arr(3)
    base = _docs_parallel(spark, sf_dir).select(
        (F.shiftleft(F.col("doc_id"), 20) + F.size(arr)).alias("packed"), "text"
    )
    sh = base.select("packed", F.explode(arr).alias("shingle"))
    # _PAIR_EXPLODE_RATIO: candidate pairs whose packed sizes differ >10×
    # cannot reach J >= 0.1, so they are never emitted — prunes the
    # skewed-bucket pair explosion ahead of the pair groupBy shuffle.
    grouped = (
        sh.groupBy("shingle")
        .agg(F.collect_list("packed").alias("ds"))
        .filter(F.size("ds") > 1)
    )
    inter = (
        _bucket_pairs(grouped, _PAIR_EXPLODE_RATIO)
        .groupBy(F.col("pr.doc_a").alias("pa"), F.col("pr.doc_b").alias("pb"))
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        (F.col("pa") % (1 << 20)) + (F.col("pb") % (1 << 20)) - F.col("n_common")
    )
    return (
        inter.filter(jac >= 0.1)
        .select(
            F.shiftright(F.col("pa"), 20).alias("doc_a"),
            F.shiftright(F.col("pb"), 20).alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash fingerprints (32-bit, over distinct tokens; SURVEY §7 dedup #3)
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 32

_bit_sums_duck = ",\n           ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(_SIMHASH_BITS)
)
_bit_combine = " + ".join(
    f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMHASH_BITS)
)

_SIMHASH_SQL = f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, t
        FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents)
    ),
    hashed AS (SELECT doc_id, {_hash60_duck('t')} AS h FROM toks),
    bitsums AS (
        SELECT doc_id,
           {_bit_sums_duck}
        FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({_bit_combine} AS BIGINT) AS simhash
    FROM bitsums
"""


@register(
    "dedup_simhash",
    _SIMHASH_SQL,
    doc="SimHash: 32-bit fingerprint; bit b = sign of Σ±1 over distinct-token "
        "60-bit hashes. Single groupBy(doc_id) shuffle; near-dups then cluster "
        "by Hamming distance on the fingerprint (constant-width key).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("t")
    )
    hashed = toks.select("doc_id", F.expr(_hash60_spark("t")).alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(_SIMHASH_BITS)
    ]
    bitsums = hashed.groupBy("doc_id").agg(*bit_sums)
    combine = None
    for b in range(_SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        combine = term if combine is None else combine + term
    return bitsums.select("doc_id", combine.cast("long").alias("simhash"))


# ---------------------------------------------------------------------------
# SimHash near-dup pairs via band blocking (completes the SimHash dedup
# family: fingerprints → candidate pairs → exact Hamming verify)
# ---------------------------------------------------------------------------

_SIMHASH_BANDS = 4  # 4 bands × 8 bits; Hamming ≤ 3 < bands ⇒ exact recall

_SIMHASH_PAIRS_SQL = f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM ({_SIMHASH_SQL}) a JOIN ({_SIMHASH_SQL}) b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@register(
    "dedup_simhash_pairs",
    _SIMHASH_PAIRS_SQL,
    doc="SimHash near-dup pairs, Hamming ≤ 3. Candidates come from band "
        "blocking — 4 bands × 8 bits; by pigeonhole, ≤ 3 differing bits "
        "leave at least one band identical, so the blocked plan has EXACT "
        "recall (the oracle's quadratic self-join proves it). Fingerprints "
        "ride packed into the doc id through collect_list's primitive fast "
        "path, same trick as the Jaccard pipeline; shuffles: the signature "
        "groupBy + groupBy(band) + the pair distinct. The oracle is O(n²) — "
        "fine for DuckDB at gate scale, the banded plan is the 100 TB shape. "
        "Packing bound: shiftleft(doc_id, 32) needs doc_id < 2^31 to stay "
        "non-negative in a signed long (ids beyond that: carry doc_id as a "
        "separate column, costing the struct slow path).",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = dedup_simhash(spark, sf_dir)
    packed = sig.select(
        (F.shiftleft(F.col("doc_id"), _SIMHASH_BITS) + F.col("simhash")).alias("pk"),
        "simhash",
    )
    band_width = _SIMHASH_BITS // _SIMHASH_BANDS
    bands = packed.select(
        "pk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.shiftright(F.col("simhash"), j * band_width)
                        .bitwiseAND((1 << band_width) - 1)
                        .alias("v"),
                    )
                    for j in range(_SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    )
    # The Hamming≤3 verify runs INSIDE the bucket lambda: the full
    # fingerprint rides in the packed id's low 32 bits, so a popcount on
    # the xor decides each pair before anything leaves the bucket task.
    # Band values are heavily skewed on real corpora (similar docs share
    # band bytes — measured at sf0.1: 8.9M candidate pairs from 5,000
    # docs, top bucket 2,566 members), and the old shape shuffled every
    # candidate into the distinct before filtering; verifying in-bucket
    # shuffles only the true near-dup pairs (guide: filter before the
    # exchange). The bucket-local pair scan stays O(|bucket|²) popcounts
    # — 8-byte xors, orders of magnitude cheaper than shuffling the pairs.
    # Cross-band dedup also happens IN the lambda: a Hamming≤3 pair
    # usually agrees on several bands (measured 2.2 band-copies per pair
    # at sf0.1), so each pair is emitted only from its FIRST agreeing
    # band — the emit condition requires every lower band of a^b to be
    # nonzero. Together the two in-lambda checks turn the old
    # explode-8.9M → shuffle → distinct → filter pipeline into an exact
    # map-side emission of the 2.1M result pairs with NO pair exchange
    # at all (the remaining exchanges are the signature groupBy and the
    # band groupBy).
    mask = (1 << _SIMHASH_BITS) - 1
    bw = band_width
    first_band = " AND ".join(
        f"(band.j < {j + 1} OR "
        f"(((a & {mask}) ^ (b & {mask})) >> {bw * j}) & {(1 << bw) - 1} != 0)"
        for j in range(_SIMHASH_BANDS - 1)
    )
    pair_explode_hamming = (
        "flatten(transform(ds, a -> transform(filter(ds, b -> b > a AND "
        f"bit_count((a & {mask}) ^ (b & {mask})) <= 3 AND {first_band}), "
        "b -> named_struct('doc_a', a, 'doc_b', b))))"
    )
    grouped = (
        bands.groupBy("band")
        .agg(F.collect_list("pk").alias("ds"))
        .filter(F.size("ds") > 1)
    )
    cand = _bucket_pairs(grouped, pair_explode_hamming).select(
        F.col("pr.doc_a").alias("pa"), F.col("pr.doc_b").alias("pb")
    )
    hamming = F.bit_count(
        (F.col("pa").bitwiseAND(mask)).bitwiseXOR(F.col("pb").bitwiseAND(mask))
    )
    return cand.select(
        F.shiftright(F.col("pa"), _SIMHASH_BITS).alias("doc_a"),
        F.shiftright(F.col("pb"), _SIMHASH_BITS).alias("doc_b"),
        hamming.cast("int").alias("hamming"),
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (SURVEY §7 dedup #5 / similarity search)
# ---------------------------------------------------------------------------

def _dot_duck(a: str, b: str) -> str:
    """DuckDB double-precision dot product, index-lambda form — mirrors the
    sequential fold order of Spark's ``aggregate(zip_with(...))`` (DuckDB's
    ``list_cosine_similarity`` computes in float32 and diverges at ~1e-7)."""
    return (
        f"list_sum(list_transform(range(1, len({a}.embedding) + 1), "
        f"i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE)))"
    )


def _cos_duck(a: str, b: str) -> str:
    return (
        f"ROUND(({_dot_duck(a, b)}) / "
        f"(sqrt({_dot_duck(a, a)}) * sqrt({_dot_duck(b, b)})), 6)"
    )


_COSINE_PAIRS_SQL = f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_cos_duck('a', 'b')} AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 50
      AND {_cos_duck('a', 'b')} >= 0.35
"""

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def _with_norm(df: DataFrame, vec: str, out: str) -> DataFrame:
    return df.withColumn(out, F.expr(f"sqrt({_DOT.format(a=vec, b=vec)})"))


def _seq_dot(a, b):
    """Sequential-fold double dot product, vectorized over rows.

    ``np.cumsum`` adds strictly left-to-right, which is bit-identical to both
    Spark's ``aggregate(zip_with(...))`` fold and DuckDB's ``list_sum`` (a
    BLAS ``dot``/pairwise sum is NOT — it reorders additions and the oracle
    hash would drift in the last ulp). ``a``: (B, D) float64, ``b``: (D,) or
    (B, D) float64 → (B,) float64."""
    import numpy as np

    return np.cumsum(a * b, axis=-1)[..., -1]


def _ann_scan(
    corpus: DataFrame,
    queries_local: list[tuple[int, "object"]],
    bucket_of=None,
):
    """One vectorized corpus pass scoring every (query, corpus row) pair.

    The classic scatter-gather ANN serving plan: the handful of query vectors
    is collected driver-side and ships inside the task closure (a broadcast
    of a few KB); the corpus — the 100 TB side — is read ONCE, scored in
    Arrow-batched numpy (a (B,D)×(D,) product per query instead of a
    per-row interpreted HOF fold), and never shuffled. Only the scored
    (query_id, neighbor_id, cosine_raw) rows leave the scan, and the
    per-query top-k / threshold that follows is a reduction over ≤ B·|Q|
    small rows. ``bucket_of(E) -> (B,) int`` optionally restricts candidates
    to bucket-equal pairs (LSH); cosine doubles are bit-identical to the
    expression path, so downstream F.round semantics are unchanged."""
    import numpy as np
    import pandas as pd

    qids = [int(q) for q, _ in queries_local]
    qvecs = [np.asarray(v, dtype=np.float64) for _, v in queries_local]
    qnorms = [float(np.sqrt(_seq_dot(v[None, :], v)[0])) for v in qvecs]
    qbuckets = None
    if bucket_of is not None:
        qbuckets = [int(bucket_of(v[None, :])[0]) for v in qvecs]

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            E = np.array([np.asarray(v) for v in pdf["embedding"]], dtype=np.float64)
            norms = np.sqrt(_seq_dot(E, E))
            cbuckets = bucket_of(E) if bucket_of is not None else None
            out_q, out_n, out_c = [], [], []
            for j, (qid, qv) in enumerate(zip(qids, qvecs)):
                mask = ids != qid
                if cbuckets is not None:
                    mask &= cbuckets == qbuckets[j]
                if not mask.any():
                    continue
                cos = _seq_dot(E[mask], qv) / (qnorms[j] * norms[mask])
                out_q.append(np.full(int(mask.sum()), qid, dtype=np.int64))
                out_n.append(ids[mask])
                out_c.append(cos)
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine_raw": np.concatenate(out_c),
                    }
                )

    return corpus.select("vec_id", "embedding").mapInPandas(
        score, "query_id long, neighbor_id long, cosine_raw double"
    )


def _collect_queries(e: DataFrame, upto: int) -> list[tuple[int, "object"]]:
    rows = e.filter(F.col("vec_id") < upto).select("vec_id", "embedding").collect()
    return [(r["vec_id"], r["embedding"]) for r in rows]


@register(
    "embedding_cosine_pairs",
    _COSINE_PAIRS_SQL,
    doc="Embedding near-dup: cosine ≥ 0.35 between a query subset (vec_id<50) "
        "and the corpus. Brute-force with broadcast query side — the exact "
        "baseline the LSH/IVF path is validated against.",
)
def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    scored = _ann_scan(e, _collect_queries(e, 50))
    return (
        scored.filter(F.col("neighbor_id") > F.col("query_id"))
        .withColumn("cosine", F.round(F.col("cosine_raw"), 6))
        .filter(F.col("cosine") >= 0.35)
        .select(
            F.col("query_id").alias("vec_a"),
            F.col("neighbor_id").alias("vec_b"),
            "cosine",
        )
    )


# ---------------------------------------------------------------------------
# Brute-force cosine top-k ANN baseline (SURVEY §7 similarity search)
# ---------------------------------------------------------------------------

_ANN_SQL = f"""
    SELECT * FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_cos_duck('a', 'b')} AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_cos_duck('a', 'b')} DESC, b.vec_id
               ) AS rk
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 10
    ) WHERE rk <= 5
"""


@register(
    "ann_cosine_topk",
    _ANN_SQL,
    doc="Similarity search: exact top-5 cosine neighbors for 10 query "
        "vectors. Broadcast queries × corpus scan + per-query top-k (window "
        "on rounded score, vec_id tiebreak). At 100 TB the same plan holds "
        "with the corpus partition-pruned by an IVF cell column.",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    scored = _ann_scan(e, _collect_queries(e, 10))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("cosine", F.round(F.col("cosine_raw"), 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN: random-hyperplane signatures (the 100 TB scale path —
# candidates come from one equi-join on an 8-bit bucket key instead of a
# full corpus × queries product; SURVEY §7 similarity #2)
# ---------------------------------------------------------------------------

_LSH_PLANES = 8
_EMB_DIM = 64


def _plane_weight(j: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-1, 1] — derived
    from md5 so Spark and the DuckDB oracle embed IDENTICAL plane literals."""
    import hashlib

    h = int(hashlib.md5(f"plane{j}:{d}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


_PLANES = [
    [_plane_weight(j, d) for d in range(_EMB_DIM)] for j in range(_LSH_PLANES)
]


def _lsh_bucket_spark():
    """8-bit bucket: bit j = sign of <embedding, plane_j> (double, in array
    order — bit-identical to the DuckDB formulation)."""
    bits = None
    for j, w in enumerate(_PLANES):
        arr = "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in w) + ")"
        dot = F.expr(_DOT.format(a="embedding", b=arr))
        bit = F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits


def _lsh_bucket_duck(prefix: str) -> str:
    parts = []
    for j, w in enumerate(_PLANES):
        lit = "[" + ", ".join(repr(x) for x in w) + "]"
        dot = (
            f"list_sum(list_transform(range(1, {_EMB_DIM + 1}), "
            f"i -> CAST({prefix}embedding[i] AS DOUBLE) * ({lit})[i]))"
        )
        parts.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(parts)


_LSH_TOPK_SQL = f"""
    WITH b AS (
        SELECT vec_id, embedding, {_lsh_bucket_duck('')} AS bucket
        FROM embeddings
    ),
    cand AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_cos_duck('q', 'c')} AS cosine
        FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cosine, rk FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS rk FROM cand
    ) WHERE rk <= 5
"""


def _lsh_bucket_numpy(E):
    """(B, D) float64 → (B,) int bucket; bit j = sign of the SEQUENTIAL dot
    with plane j — the same fold order as the SQL formulations, so a dot that
    lands exactly on 0.0 gets the same bit everywhere."""
    import numpy as np

    buckets = np.zeros(E.shape[0], dtype=np.int64)
    for j, w in enumerate(_PLANES):
        plane = np.asarray(w, dtype=np.float64)
        buckets += (_seq_dot(E, plane) >= 0).astype(np.int64) << j
    return buckets


@register(
    "ann_lsh_topk",
    _LSH_TOPK_SQL,
    doc="ANN via random-hyperplane LSH: 8 sign bits → bucket; candidates "
        "share a bucket (computed vectorized inside the single corpus scan — "
        "no corpus × queries product), exact cosine re-rank inside the "
        "bucket. The approximate scale path next to ann_cosine_topk's exact "
        "baseline.",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    scored = _ann_scan(e, _collect_queries(e, 10), bucket_of=_lsh_bucket_numpy)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("cosine", F.round(F.col("cosine_raw"), 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


_SEMANTIC_PAIRS_SQL = f"""
    SELECT p.vec_a, p.vec_b, p.cosine,
           da.source AS source_a, db.source AS source_b,
           da.lang AS lang_a, db.lang AS lang_b
    FROM ({_COSINE_PAIRS_SQL}) p
    JOIN documents da ON da.doc_id = p.vec_a
    JOIN documents db ON db.doc_id = p.vec_b
"""


@register(
    "dedup_semantic_pairs",
    _SEMANTIC_PAIRS_SQL,
    doc="Cross-modal near-dup triage: embedding-cosine candidate pairs "
        "(vec_id aligns with doc_id in the driver testdata) joined back to "
        "document metadata — the table a curation reviewer actually reads "
        "(does this near-dup cross sources? languages?). The pair side is "
        "orders of magnitude smaller than the corpus, so the metadata "
        "lookups are two equi-joins on doc_id that AQE broadcasts; the "
        "corpus is never re-scored.",
)
def dedup_semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = embedding_cosine_pairs(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    da = d.select(
        F.col("doc_id").alias("vec_a"),
        F.col("source").alias("source_a"),
        F.col("lang").alias("lang_a"),
    )
    db = d.select(
        F.col("doc_id").alias("vec_b"),
        F.col("source").alias("source_b"),
        F.col("lang").alias("lang_b"),
    )
    return (
        pairs.join(da, "vec_a")
        .join(db, "vec_b")
        .select(
            "vec_a", "vec_b", "cosine",
            "source_a", "source_b", "lang_a", "lang_b",
        )
    )


_RECALL_SQL = f"""
    SELECT e.query_id,
           COUNT(*) AS n_exact,
           COUNT(l.neighbor_id) AS n_hit,
           ROUND(CAST(COUNT(l.neighbor_id) AS DOUBLE) / COUNT(*), 6) AS recall
    FROM ({_ANN_SQL}) e
    LEFT JOIN ({_LSH_TOPK_SQL}) l
      ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
    GROUP BY e.query_id
"""


@register(
    "ann_recall_eval",
    _RECALL_SQL,
    doc="Recall@5 of the LSH path against the exact brute-force baseline, "
        "per query — the evaluation loop every approximate index needs "
        "before it replaces the exact one in production. Both sides are "
        "the already-oracled top-k plans; the comparison is a left-semi "
        "hit count per query (integers, then one exact IEEE division). "
        "At 100 TB both sides are precomputed result tables and this is "
        "a tiny join on (query, neighbor).",
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    lsh = ann_lsh_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        exact.join(lsh, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    totals = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return totals.join(hits, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        F.round(
            F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_exact"), 6
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# IVF-bucketed ANN: nearest-centroid cells + nprobe=2 (SURVEY §7 similarity —
# the partition-pruning scale path: at 100 TB the corpus is PARTITIONED BY
# cell on disk, so a query reads nprobe/n_cells of the data; here the cell
# assignment + probe are expressed as DataFrame ops with a full SQL oracle)
# ---------------------------------------------------------------------------

_IVF_CELLS = 16
_IVF_NPROBE = 2


def _ivf_centroid(c: int) -> list[float]:
    """Deterministic pseudo-random centroid — md5-derived like the LSH
    planes, so Spark and DuckDB embed IDENTICAL coordinate literals."""
    import hashlib

    out = []
    for d in range(_EMB_DIM):
        h = int(hashlib.md5(f"ivf{c}:{d}".encode()).hexdigest()[:15], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return out


_CENTROIDS = [_ivf_centroid(c) for c in range(_IVF_CELLS)]


def _ivf_dots_duck() -> str:
    """UNION ALL of per-centroid dot products — (vec_id, cell, dot)."""
    branches = []
    for c, w in enumerate(_CENTROIDS):
        lit = "[" + ", ".join(repr(x) for x in w) + "]"
        dot = (
            f"list_sum(list_transform(range(1, {_EMB_DIM + 1}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit})[i]))"
        )
        branches.append(f"SELECT vec_id, {c} AS cell, {dot} AS dot FROM embeddings")
    return "\n        UNION ALL\n        ".join(branches)


_IVF_TOPK_SQL = f"""
    WITH dots AS (
        {_ivf_dots_duck()}
    ),
    ranked AS (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rk
        FROM dots
    ),
    corpus_cell AS (SELECT vec_id, cell FROM ranked WHERE rk = 1),
    query_cells AS (SELECT vec_id, cell FROM ranked
                    WHERE rk <= {_IVF_NPROBE} AND vec_id < 10),
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM query_cells q JOIN corpus_cell c ON q.cell = c.cell
        WHERE q.vec_id <> c.vec_id
    ),
    scored AS (
        SELECT cand.query_id, cand.neighbor_id, {_cos_duck('a', 'b')} AS cosine
        FROM cand
        JOIN embeddings a ON a.vec_id = cand.query_id
        JOIN embeddings b ON b.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rk FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS rk FROM scored
    ) WHERE rk <= 5
"""


def _ivf_cells_df(e: DataFrame) -> DataFrame:
    """(vec_id, cell, rk): centroid-affinity ranking per vector. The dot
    array is built once per vector inside the Generate (posexplode), never
    per output row."""
    dots = []
    for w in _CENTROIDS:
        arr = "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in w) + ")"
        dots.append(F.expr(_DOT.format(a="embedding", b=arr)))
    exploded = e.select(
        "vec_id", F.posexplode(F.array(*dots)).alias("cell", "dot")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("dot"), F.asc("cell"))
    return exploded.select("vec_id", "cell", F.row_number().over(w).alias("rk"))


@register(
    "ann_ivf_topk",
    _IVF_TOPK_SQL,
    doc="ANN via IVF cells: every vector is assigned its nearest of 16 "
        "deterministic centroids (one posexplode + per-vector top-1 — the "
        "map-side O(n·C) assignment); queries probe their best 2 cells and "
        "re-rank exact cosine inside them. At scale the corpus is "
        "partitionBy(cell) on disk and the probe is partition pruning — "
        "reading nprobe/16 of the data instead of a full scan.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    cells = _ivf_cells_df(e)
    corpus_cell = cells.filter(F.col("rk") == 1).select(
        F.col("vec_id").alias("neighbor_id"), "cell"
    )
    query_cells = cells.filter(
        (F.col("rk") <= _IVF_NPROBE) & (F.col("vec_id") < 10)
    ).select(F.col("vec_id").alias("query_id"), "cell")
    cand = (
        F.broadcast(query_cells)
        .join(corpus_cell, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = _with_norm(
        e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("emb_q")),
        "emb_q",
        "norm_q",
    )
    c = _with_norm(
        e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("emb_c")),
        "emb_c",
        "norm_c",
    )
    dot = F.expr(_DOT.format(a="emb_q", b="emb_c"))
    cos = F.round(dot / (F.col("norm_q") * F.col("norm_c")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn("cosine", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


# ---------------------------------------------------------------------------
# k-means training (2 Lloyd iterations from the deterministic IVF centroids —
# the centroid-training counterpart of ann_ivf_topk's cell probing)
# ---------------------------------------------------------------------------

def _km_values() -> str:
    rows = []
    for c, w in enumerate(_CENTROIDS):
        lit = "[" + ", ".join(repr(x) for x in w) + "]"
        rows.append(f"({c}, CAST({lit} AS DOUBLE[]))")
    return ",\n            ".join(rows)


def _km_score(centroid: str) -> str:
    dot = (
        f"list_sum(list_transform(range(1, {_EMB_DIM + 1}), "
        f"i -> CAST(e.embedding[i] AS DOUBLE) * {centroid}[i]))"
    )
    self_dot = (
        f"list_sum(list_transform(range(1, {_EMB_DIM + 1}), "
        f"i -> {centroid}[i] * {centroid}[i]))"
    )
    return f"{dot} - {self_dot} / 2"


_KMEANS_SQL = f"""
    WITH init(cell, centroid) AS (
        VALUES {_km_values()}
    ),
    s1 AS (
        SELECT e.vec_id, c.cell, {_km_score('c.centroid')} AS score
        FROM embeddings e, init c
    ),
    a1 AS (
        SELECT vec_id, cell AS cluster FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY score DESC, cell) AS rk FROM s1
        ) WHERE rk = 1
    ),
    d1 AS (
        SELECT a1.cluster, i,
               ROUND(CAST(SUM(CAST(e.embedding[i] AS DECIMAL(27,12))) AS DOUBLE)
                     / COUNT(*), 9) AS m
        FROM a1 JOIN embeddings e USING (vec_id), UNNEST(range(1, {_EMB_DIM + 1})) t(i)
        GROUP BY a1.cluster, i
    ),
    c1 AS (SELECT cluster AS cell, list(m ORDER BY i) AS centroid FROM d1 GROUP BY cluster),
    s2 AS (
        SELECT e.vec_id, c.cell, {_km_score('c.centroid')} AS score
        FROM embeddings e, c1 c
    ),
    a2 AS (
        SELECT vec_id, cell AS cluster FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY score DESC, cell) AS rk FROM s2
        ) WHERE rk = 1
    )
    SELECT vec_id, CAST(cluster AS INTEGER) AS cluster FROM a2
"""


@register(
    "kmeans_embeddings",
    _KMEANS_SQL,
    doc="k-means training: 2 Lloyd iterations from 16 deterministic "
        "centroids. Per round: broadcast k×d centroids into a scored "
        "crossJoin + per-vector top-1 (assignment), then one (cluster, dim) "
        "shuffle of decimal-exact partial sums (means) — the corpus is "
        "never collected, so the same plan trains on 100 TB. Oracle mirrors "
        "both rounds via chained CTEs.",
    cache_plan=False,
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.operators.kmeans import kmeans

    e = load(spark, sf_dir, "embeddings")
    return kmeans(spark, e, _CENTROIDS, iterations=2)


# ---------------------------------------------------------------------------
# Text analysis: language ID (stopword n-gram heuristic; SURVEY §7 text #1)
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "las", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


_langid_counts_duck = ",\n           ".join(
    f"len(list_filter(string_split(text, ' '), t -> t IN ({_in_list(ws)}))) AS {lang}_cnt"
    for lang, ws in _STOPWORDS.items()
)

_LANGID_SQL = f"""
    WITH counted AS (
        SELECT doc_id, lang,
           {_langid_counts_duck}
        FROM documents
    )
    SELECT doc_id, lang,
           CASE
             WHEN en_cnt >= de_cnt AND en_cnt >= es_cnt AND en_cnt >= fr_cnt AND en_cnt > 0 THEN 'en'
             WHEN de_cnt >= es_cnt AND de_cnt >= fr_cnt AND de_cnt > 0 THEN 'de'
             WHEN es_cnt >= fr_cnt AND es_cnt > 0 THEN 'es'
             WHEN fr_cnt > 0 THEN 'fr'
             ELSE 'und'
           END AS pred_lang,
           en_cnt, de_cnt, es_cnt, fr_cnt
    FROM counted
"""


@register(
    "text_langid",
    _LANGID_SQL,
    doc="Language-ID heuristic: per-language stopword token counts, argmax "
        "with fixed priority (en>de>es>fr), 'und' when all zero. Pure "
        "JVM-side array ops — no UDF in the hot path.",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    counted = d.select(
        "doc_id",
        "lang",
        *[
            F.expr(
                f"size(filter(split(text, ' '), t -> t IN ({_in_list(ws)})))"
            ).alias(f"{lang}_cnt")
            for lang, ws in _STOPWORDS.items()
        ],
    )
    pred = (
        F.when(
            (F.col("en_cnt") >= F.col("de_cnt"))
            & (F.col("en_cnt") >= F.col("es_cnt"))
            & (F.col("en_cnt") >= F.col("fr_cnt"))
            & (F.col("en_cnt") > 0),
            "en",
        )
        .when(
            (F.col("de_cnt") >= F.col("es_cnt"))
            & (F.col("de_cnt") >= F.col("fr_cnt"))
            & (F.col("de_cnt") > 0),
            "de",
        )
        .when((F.col("es_cnt") >= F.col("fr_cnt")) & (F.col("es_cnt") > 0), "es")
        .when(F.col("fr_cnt") > 0, "fr")
        .otherwise("und")
    )
    return counted.select(
        "doc_id", "lang", pred.alias("pred_lang"), "en_cnt", "de_cnt", "es_cnt", "fr_cnt"
    )


# ---------------------------------------------------------------------------
# Text analysis: quality scoring (SURVEY §7 text #2)
# ---------------------------------------------------------------------------

_QUALITY_SQL = """
    WITH base AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               n_chars,
               length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS n_stop
        FROM documents
    )
    SELECT doc_id, n_tokens, n_alpha,
           -- NULLIF: an empty document has n_chars = 0; the ratio is NULL,
           -- not a divide-by-zero (Spark ANSI mode would throw)
           ROUND(CAST(n_alpha AS DOUBLE) / NULLIF(n_chars, 0), 6) AS alpha_ratio,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
           ROUND(LEAST(1.0, n_tokens / 100.0) * 0.5
                 + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.5, 6) AS quality_score
    FROM base
"""


@register(
    "text_quality",
    _QUALITY_SQL,
    doc="Quality scoring: token count, alpha ratio, stopword ratio → "
        "composite score (length-capped + stopword density), all JVM-side.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        "n_chars",
        F.length(F.regexp_replace(F.col("text"), "[^a-z]", "")).alias("n_alpha"),
        F.expr(
            "size(filter(split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'to', 'in')))"
        ).alias("n_stop"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "n_alpha",
        F.round(
            F.col("n_alpha").cast("double") / F.expr("nullif(n_chars, 0)"), 6
        ).alias("alpha_ratio"),
        F.round(F.col("n_stop").cast("double") / F.col("n_tokens"), 6).alias("stopword_ratio"),
        F.round(
            F.least(F.lit(1.0), F.col("n_tokens") / 100.0) * 0.5
            + (F.col("n_stop").cast("double") / F.col("n_tokens")) * 0.5,
            6,
        ).alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# Text analysis: token counting (whitespace + regex alpha runs + BPE-ish est.)
# ---------------------------------------------------------------------------

_TOKENS_SQL = """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_runs,
           -- length(), not strlen(): DuckDB strlen counts BYTES, Spark
           -- length() counts characters (differs on non-ASCII text)
           CAST(list_sum(list_transform(string_split(text, ' '),
                t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_subword_est
    FROM documents
"""


@register(
    "text_tokens",
    _TOKENS_SQL,
    doc="Token counting: whitespace tokens, regex alpha-run tokens, and a "
        "BPE-ish ceil(len/4) subword estimate — all vectorized builtins.",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
        F.expr("regexp_count(text, '[a-z]+')").cast("long").alias("n_alpha_runs"),
        F.expr(
            "CAST(aggregate(transform(split(text, ' '), t -> CAST(ceil(length(t) / 4.0) AS BIGINT)), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT)"
        ).alias("n_subword_est"),
    )


# ---------------------------------------------------------------------------
# Text analysis: document fingerprinting (SURVEY §7 text #4)
# ---------------------------------------------------------------------------

_FINGERPRINT_SQL = f"""
    WITH norm AS (
        SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text
        FROM documents
    )
    SELECT doc_id, md5(norm_text) AS fingerprint,
           {_hash60_duck('norm_text')} % 1024 AS bucket
    FROM norm
"""


@register(
    "text_fingerprint",
    _FINGERPRINT_SQL,
    doc="Document fingerprint: whitespace-normalized md5 + 60-bit hash bucket "
        "(content-addressed partitioning key for incremental dedup at scale).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return d.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("fingerprint"),
        (F.expr(_hash60_spark("trim(regexp_replace(lower(text), '\\\\s+', ' '))")) % 1024).alias(
            "bucket"
        ),
    )


# ---------------------------------------------------------------------------
# Corpus curation: stratified sampling, redaction, shard packing — the
# select / clean / lay-out stages of a training-data pipeline
# ---------------------------------------------------------------------------

_PROBES = [
    "the quick brown fox jumps over",
    "row fast merge batch part value",
    "spark shuffle partition broadcast join key",
]

_probe_shingles = sorted(
    {
        " ".join(p.split(" ")[i : i + 5])
        for p in _PROBES
        for i in range(len(p.split(" ")) - 4)
    }
)

_DECONTAM_SQL = f"""
    WITH {_shingles_cte(5)},
    hits AS (
        SELECT doc_id, COUNT(*) AS n_hits
        FROM sh
        WHERE shingle IN ({", ".join("'" + s + "'" for s in _probe_shingles)})
        GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
           h.doc_id IS NOT NULL AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


@register(
    "decontaminate_probe",
    _DECONTAM_SQL,
    doc="Benchmark decontamination: flag documents sharing any 5-gram with "
        "a probe (eval-set) text. The probe shingle set broadcasts as a "
        "literal IN-list (a broadcast join at real probe sizes); matching "
        "is a map-side filter on the exploded shingles + one doc_id "
        "aggregation — no all-pairs stage, same blocking shape as the "
        "dedup family.",
)
def decontaminate_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles_df(spark, sf_dir, 5)
    hits = (
        sh.filter(F.col("shingle").isin(_probe_shingles))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.join(hits.withColumnRenamed("doc_id", "h_id"),
                  d.doc_id == F.col("h_id"), "left").select(
        "doc_id",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        F.col("h_id").isNotNull().alias("contaminated"),
    )


_SAMPLE_SQL = f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_hash60_duck("'sample:' || CAST(doc_id AS VARCHAR)")} % 100
          < CASE WHEN lang = 'en' THEN 50 ELSE 10 END
"""


@register(
    "sample_stratified",
    _SAMPLE_SQL,
    doc="Deterministic stratified sampling: keep-rate per language stratum "
        "(50% en, 10% other) decided by a content-addressed hash of the doc "
        "id — reproducible across runs/engines, no shuffle at all (pure "
        "map-side filter, prunable at the scan).",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 50).otherwise(10)
    keep = F.expr(_hash60_spark("concat('sample:', CAST(doc_id AS STRING))")) % 100 < rate
    return d.filter(keep).select("doc_id", "lang", "source")


_REDACT_SQL = r"""
    SELECT doc_id,
           regexp_replace(
               regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
               '\d{3}-\d{3,4}-\d{4}', '<PHONE>', 'g') AS clean_text,
           len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+')) AS n_emails
    FROM documents
"""


@register(
    "text_redact",
    _REDACT_SQL,
    doc="PII-style redaction: email/phone patterns replaced with typed "
        "placeholder tokens + per-doc match counts. JVM-side regexp_replace "
        "(whole-stage codegen), zero shuffles.",
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), "[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"),
        r"\d{3}-\d{3,4}-\d{4}",
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        F.expr("regexp_count(text, '[a-z0-9.]+@[a-z0-9.]+')")
        .cast("long")
        .alias("n_emails"),
    )


_SHARDS_SQL = """
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST((cum_tokens - 1) // 10000 AS BIGINT) AS shard
    FROM packed
"""


_N_SHARD_BUCKETS = 32


@register(
    "shard_by_token_budget",
    _SHARDS_SQL,
    doc="Training-shard layout: documents packed into ~10k-token shards by "
        "running token count in doc_id order. Distributed two-pass prefix "
        "sum: doc_id-range buckets → per-bucket token totals (one tiny "
        "collect, |buckets| rows) → driver prefix offsets → broadcast "
        "offset map → per-bucket local running sum. No single-partition "
        "window anywhere; the only per-row shuffle is hashpartitioning on "
        "the bucket key, so the plan is embarrassingly parallel at 100 TB "
        "(at that scale the equal-width doc_id ranges become equi-depth "
        "boundaries from approxQuantile, same two jobs).",
)
def shard_by_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    lo, hi = toks.agg(F.min("doc_id"), F.max("doc_id")).first()
    if lo is None:  # empty corpus: no shards to assign
        return toks.select(
            "doc_id", "n_tokens", F.lit(None).cast("long").alias("shard")
        )
    width = max(1, (hi - lo) // _N_SHARD_BUCKETS + 1)
    bucket = F.floor((F.col("doc_id") - F.lit(lo)) / F.lit(width)).cast("long")
    # Pass 1: per-bucket totals — |buckets| rows, a bounded scatter-gather
    # like the ANN query collect, never O(corpus).
    totals = (
        toks.groupBy(bucket.alias("bucket"))
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    )
    offsets: dict = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["bucket"]):
        offsets[row["bucket"]] = acc
        acc += row["total"]
    off_map = F.create_map(
        *[F.lit(v) for kv in sorted(offsets.items()) for v in kv]
    )
    # Pass 2: running sum is local to each bucket (hash exchange on the
    # bucket key, ~|corpus|/|buckets| rows per task), shifted by the
    # bucket's global prefix offset.
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        toks.withColumn("bucket", bucket)
        .select(
            "doc_id",
            "n_tokens",
            F.floor(
                (F.sum("n_tokens").over(w) + off_map[F.col("bucket")] - 1)
                / 10000
            )
            .cast("long")
            .alias("shard"),
        )
    )


# ---------------------------------------------------------------------------
# Events: batch analogs of the streaming windows (SURVEY §7 streaming)
# ---------------------------------------------------------------------------

@register(
    "events_tumbling",
    """
    SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 900000000) * 900 AS bucket_start_s,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 15-min window aggregation (batch twin of the Structured "
        "Streaming path in streaming/ingest.py); bucket key as epoch seconds "
        "for engine-neutral comparison.",
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    bucket = (F.expr("(ts_us div 900000000) * 900")).alias("bucket_start_s")
    return (
        e.groupBy(bucket, F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@register(
    "events_json_props",
    """
    SELECT event_type,
           COUNT(*) AS n,
           SUM(k) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
           ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(k), 6) AS avg_k
    FROM (
        -- json_valid guard: DuckDB's extractor ERRORS on malformed JSON
        -- where Spark's get_json_object returns NULL. The integer-format
        -- regex mirrors Spark's strict try_cast-to-BIGINT (DuckDB's
        -- TRY_CAST ROUNDS '1.5' to 2; Spark rejects it to NULL).
        SELECT event_type,
               TRY_CAST(CASE WHEN regexp_matches(
                                 CASE WHEN json_valid(props)
                                      THEN json_extract_string(props, '$.k')
                                 END, '^-?[0-9]+$')
                             THEN json_extract_string(props, '$.k') END
                        AS BIGINT) AS k
        FROM events
    )
    GROUP BY event_type
    """,
    doc="Semi-structured extraction: pull $.k out of the JSON props column "
        "(get_json_object — JVM-side Jackson path eval, no UDF) and "
        "aggregate per event_type. Integer aggregates are exact; the one "
        "double (avg) divides two exact integers, IEEE-identical on both "
        "engines. At 100 TB the JSON parse is map-side and the only shuffle "
        "is the low-cardinality event_type groupBy.",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    # try_cast mirrors the oracle's TRY_CAST: a non-integral or non-numeric
    # $.k is NULL on both engines (a plain cast throws under ANSI)
    k = F.expr(
        "try_cast(get_json_object(props, '$.k') AS BIGINT)"
    ).alias("k")
    return (
        e.select("event_type", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(
                F.sum("k").cast("double") / F.count("k"), 6
            ).alias("avg_k"),
        )
    )


@register(
    "events_sliding",
    """
    WITH offsets AS (SELECT UNNEST(range(0, 4)) AS k)
    SELECT ((epoch_us(CAST(ts AS TIMESTAMP)) - k * 900000000) // 3600000000)
               * 3600 + k * 900 AS window_start_s,
           COUNT(*) AS n_events
    FROM events, offsets
    WHERE (epoch_us(CAST(ts AS TIMESTAMP)) - k * 900000000) >= 0
    GROUP BY 1
    """,
    doc="Sliding windows (1h width, 15-min slide) in batch: each event lands "
        "in width/slide windows via a 4-row explode — the batch twin of "
        "streaming/events.py sliding_counts_stream. Oracle derives the same "
        "window starts arithmetically.",
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    # window_start = hour-aligned grid shifted by k*15min, k ∈ [0,4)
    k = F.explode(F.sequence(F.lit(0).cast("long"), F.lit(3).cast("long"))).alias("k")
    shifted_us = F.col("ts_us") - F.col("k") * F.lit(900000000).cast("long")
    shifted = e.select("ts_us", k).filter(shifted_us >= 0)
    win = (
        F.floor(shifted_us / F.lit(3600000000).cast("long")) * 3600
        + F.col("k") * 900
    ).alias("window_start_s")
    return shifted.groupBy(win).agg(F.count("*").alias("n_events"))


@register(
    "events_quantiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
    """,
    doc="Exact per-type value quantiles (linear interpolation — Spark "
        "percentile ≡ SQL quantile_cont/percentile_cont). The exact baseline "
        "for approx_percentile at scale, one event_type shuffle.",
)
def events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5D)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95D)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99D)"), 6).alias("p99"),
    )


@register(
    "skew_salted_agg",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Skew-resilient aggregation: 3 distinct keys over 600k rows would "
        "hash to 3 reducers; salting fans the partial agg across key×16 "
        "salts, then a second tiny agg merges — the manual pattern behind "
        "AQE skew handling, demonstrated with an exact decimal-sum oracle.",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    salted = li.withColumn("_salt", (F.rand(seed=7) * 16).cast("int"))
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count("*").alias("n_p"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s_p"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("n_p").alias("n"),
        F.sum("s_p").cast("double").alias("total_price"),
    )


_SESSIONIZE_SQL = """
    WITH base AS (
        SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        FROM events
    ),
    marked AS (
        SELECT user_id, event_id, ts_us,
               CASE WHEN ts_us - LAG(ts_us)
                           OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                         > 1800000000
                    OR LAG(ts_us)
                       OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM base
    ),
    sessions AS (
        SELECT user_id, event_id, ts_us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM marked
    )
    SELECT user_id, session_idx, MIN(ts_us) AS session_start_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_idx
    """


@register(
    "events_sessionize",
    _SESSIONIZE_SQL,
    doc="Sessionization (30-min inactivity gap) via lag + running sum — the "
        "batch twin of session windows; one shuffle on user_id.",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select("user_id", "event_id", "ts_us")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = e.withColumn(
        "new_session",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000)
            | F.lag("ts_us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = marked.withColumn("session_idx", F.sum("new_session").over(wsum))
    return sessions.groupBy("user_id", "session_idx").agg(
        F.min("ts_us").alias("session_start_us"), F.count("*").alias("n_events")
    )


_SESSION_BUCKET_US = 6 * 3600 * 1_000_000  # 6-hour time buckets


@register(
    "events_sessionize_bucketed",
    _SESSIONIZE_SQL,
    doc="Skew-resilient sessionization (same result and oracle as "
        "events_sessionize): the event-stream windows partition by "
        "(user_id, 6h time bucket) so one hyperactive user spreads over "
        "many tasks — the bare-user_id windows of the plain variant put a "
        "whole mega-user on one task. Cross-bucket session continuity is "
        "restored from per-bucket summaries: a |user × bucket|-sized "
        "window (orders of magnitude below the event stream) decides "
        "whether each bucket's first event continues the previous "
        "bucket's last session and carries session-count prefix offsets "
        "into each bucket. Mirrors operators/asof.py:asof_bucketed.",
)
def events_sessionize_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    gap = 1_800_000_000
    e = load_events(spark, sf_dir).select("user_id", "event_id", "ts_us")
    e = e.withColumn(
        "_bkt", (F.col("ts_us") / F.lit(_SESSION_BUCKET_US)).cast("long")
    )
    # In-bucket pass: provisional session starts (the bucket's first event
    # is provisionally a start; the carry pass may revoke that).
    w_in = Window.partitionBy("user_id", "_bkt").orderBy("ts_us", "event_id")
    lag_ts = F.lag("ts_us").over(w_in)
    marked = e.withColumn(
        "new_session",
        F.when(
            (F.col("ts_us") - lag_ts > gap) | lag_ts.isNull(), 1
        ).otherwise(0),
    ).withColumn(
        "rsum",
        F.sum("new_session").over(
            w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # Per-bucket summaries: first/last event time + provisional start count.
    summ = marked.groupBy("user_id", "_bkt").agg(
        F.min(F.struct("ts_us", "event_id")).alias("_first"),
        F.max(F.struct("ts_us", "event_id")).alias("_last"),
        F.sum("new_session").alias("n_new"),
    )
    # Carry pass over the tiny summary table: does the first event of each
    # bucket genuinely start a session, and how many sessions started in
    # strictly-prior buckets (prefix offset)?
    w_b = Window.partitionBy("user_id").orderBy("_bkt")
    prev_last = F.lag(F.col("_last.ts_us")).over(w_b)
    corrected = summ.select(
        "user_id",
        "_bkt",
        F.when(
            prev_last.isNull() | (F.col("_first.ts_us") - prev_last > gap), 1
        )
        .otherwise(0)
        .alias("first_new"),
        "n_new",
    ).withColumn("corr", F.col("n_new") - 1 + F.col("first_new"))
    offsets = corrected.select(
        "user_id",
        "_bkt",
        "first_new",
        F.coalesce(
            F.sum("corr").over(
                w_b.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("offset"),
    )
    # Resolve: global session index = prefix offset + in-bucket running
    # start count, minus 1 when the bucket's provisional first start was
    # actually a continuation.
    joined = marked.join(offsets, ["user_id", "_bkt"])
    idx = F.col("offset") + F.col("rsum") - 1 + F.col("first_new")
    return (
        joined.select("user_id", idx.alias("session_idx"), "ts_us")
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.count("*").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal columns: binary payload + Pandas-UDF metadata extraction
# (SURVEY §7 multimodal; decode is a deterministic stub — see operators/)
# ---------------------------------------------------------------------------

@register(
    "multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS width,
           CAST(64 + (doc_id * 7) % 512 AS INTEGER) AS height,
           CAST(1 + doc_id % 3 AS INTEGER) AS n_frames,
           'stub-decoded' AS decode_status
    FROM documents
    """,
    doc="Multimodal plumbing: opaque binary column + mapInPandas metadata "
        "extraction (Arrow-batched). The 'decoder' is a deterministic stub "
        "(no image libs in env; see operators/multimodal.py) — the oracle "
        "checks the Spark-side schema/partitioning/batch plumbing is real.",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.operators.multimodal import extract_metadata

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return extract_metadata(d, id_col="doc_id", payload_col="payload")


# DuckDB's native ASOF JOIN is the oracle for BOTH as-of strategies (same
# semantics, different physical plan). Givers are pre-deduped to (user, ts)
# with MAX(value) — the engines' tie-break for same-ts givers must agree.
_ASOF_ORACLE = """
    WITH takers AS (
        SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        FROM events WHERE event_type = 'purchase'
    ),
    givers AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               MAX(value) AS g_value
        FROM events WHERE event_type = 'view'
        GROUP BY 1, 2
    )
    SELECT t.event_id, t.user_id, t.ts_us,
           g.ts_us AS matched_ts_us,
           ROUND(g.g_value, 6) AS matched_value
    FROM takers t
    ASOF LEFT JOIN givers g
      ON t.user_id = g.user_id AND g.ts_us <= t.ts_us
    """


def _asof_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    e = load_events(spark, sf_dir)
    takers = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    givers = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts_us", F.col("value").alias("g_value")
    )
    return takers, givers


@register(
    "events_asof_join",
    _ASOF_ORACLE,
    doc="As-of join (point-in-time lookup): each purchase is matched to the "
        "most recent view by the same user at-or-before its timestamp — the "
        "operator behind leak-free feature joins in training pipelines. "
        "Spark lacks a native ASOF JOIN (DuckDB's is the oracle); the "
        "baseline composition is the union-marker trick: tag both sides, "
        "single window partitioned by user_id ordered by (ts, side), carry "
        "the last giver value forward with last(..., ignorenulls) — ONE "
        "user_id shuffle, no range join, no per-row subquery. Ties "
        "(same-user same-ts givers) are resolved to MAX(value) by ordering "
        "givers by value ascending, mirroring the oracle's pre-aggregation. "
        "See operators/asof.py; events_asof_join_bucketed is the "
        "skew-resilient scale path.",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.operators.asof import asof_union_window

    takers, givers = _asof_sides(spark, sf_dir)
    r = asof_union_window(
        takers, givers, key="user_id", ts="ts_us", val="g_value",
        out_ts="matched_ts_us", out_val="matched_value",
    )
    return r.withColumn("matched_value", F.round(F.col("matched_value"), 6))


@register(
    "events_asof_join_bucketed",
    _ASOF_ORACLE,
    doc="Skew-resilient as-of join (operators/asof.py asof_bucketed): rows "
        "hash by (user, 1h time-bucket) so a power-law-heavy user spreads "
        "across buckets instead of serializing one window task; in-bucket "
        "matches resolve locally and a tiny per-user prefix window over "
        "bucket summaries (|users × buckets| rows) carries the most recent "
        "prior-bucket giver forward. Same oracle as events_asof_join — "
        "identical semantics, different physical strategy.",
)
def events_asof_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.operators.asof import asof_bucketed

    takers, givers = _asof_sides(spark, sf_dir)
    r = asof_bucketed(
        takers, givers, key="user_id", ts="ts_us", val="g_value",
        bucket_width=3_600_000_000,
        out_ts="matched_ts_us", out_val="matched_value",
    )
    return r.withColumn("matched_value", F.round(F.col("matched_value"), 6))


@register(
    "events_rolling_avg",
    """
    SELECT event_id, user_id, ts_us, n_win,
           ROUND(CAST(s_win AS DOUBLE) / n_win, 6) AS avg_1h
    FROM (
        SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               COUNT(*) OVER w AS n_win,
               SUM(CAST(value AS DECIMAL(18,2))) OVER w AS s_win
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    )
    """,
    doc="Time-range rolling mean: per-user trailing-1h average of value via a "
        "RANGE window frame over the µs epoch — the time-based frame Spark "
        "and DuckDB both express natively (rangeBetween on a numeric order "
        "key). Sum is exact decimal on both sides so the double division is "
        "bit-stable; ONE user_id shuffle, frame evaluated by a sliding "
        "accumulator, no self-join.",
)
def events_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3600000000, Window.currentRow)
    )
    n_win = F.count("*").over(w).alias("n_win")
    s_win = F.sum(F.col("value").cast("decimal(18,2)")).over(w)
    return e.select(
        "event_id",
        "user_id",
        "ts_us",
        n_win,
        F.round(s_win.cast("double") / F.count("*").over(w), 6).alias("avg_1h"),
    )


@register(
    "text_top_terms",
    """
    WITH toks AS (
        SELECT source, UNNEST(string_split_regex(LOWER(text), '[^a-z]+')) AS term
        FROM documents
    ),
    counts AS (
        SELECT source, term, COUNT(*) AS n
        FROM toks WHERE LENGTH(term) >= 4
        GROUP BY 1, 2
    )
    SELECT source, term, n, rk FROM (
        SELECT source, term, n,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, term) AS rk
        FROM counts
    ) WHERE rk <= 3
    """,
    doc="Top-k terms per corpus source (vocabulary profiling for corpus "
        "curation): lowercase, split on non-letters, drop short tokens, "
        "count per (source, term), rank within source. Spark plan: explode "
        "below the aggregate (Generate → partial agg → one (source,term) "
        "shuffle), then a tiny per-source window on the aggregated counts — "
        "the window input is |vocab|, not |tokens|. Deterministic tie-break "
        "(count DESC, term ASC) keeps the oracle hash stable.",
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    term = F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term")
    counts = (
        d.select("source", term)
        .filter(F.length("term") >= 4)
        .groupBy("source", "term")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.select("source", "term", "n", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


@register(
    "text_tfidf_top_terms",
    """
    WITH toks AS (
        SELECT doc_id, source,
               UNNEST(string_split_regex(LOWER(text), '[^a-z]+')) AS term
        FROM documents
    ),
    filtered AS (SELECT * FROM toks WHERE LENGTH(term) >= 4),
    tf AS (
        SELECT source, term, COUNT(*) AS tf
        FROM filtered GROUP BY 1, 2
    ),
    df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df
        FROM filtered GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.source, tf.term,
               ROUND(tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT source, term, tfidf, rk FROM (
        SELECT source, term, tfidf,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY tfidf DESC, term) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
    doc="TF-IDF top terms per corpus source (what distinguishes each "
        "source, not just what is frequent — the curation complement of "
        "text_top_terms). tf per (source, term); doc-level df; idf = "
        "ln((N+1)/(df+1)). All aggregates are exact integers, the one "
        "double (tf·idf) applies identical IEEE ops on both engines, "
        "rounded to 6dp. Plan: explode → two aggregation shuffles (tf and "
        "df reuse the same exploded scan), df side broadcast into tf, "
        "per-source window over |vocab| rows. The corpus-size scalar is "
        "one count job (bounded scatter-gather), never a cartesian.",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_docs = d.count()
    term = F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term")
    toks = (
        d.select("doc_id", "source", term)
        .filter(F.length("term") >= 4)
    )
    tf = toks.groupBy("source", "term").agg(F.count("*").alias("tf"))
    df_ = (
        toks.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    scored = tf.join(F.broadcast(df_), "term").select(
        "source",
        "term",
        F.round(
            F.col("tf")
            * F.log((F.lit(n_docs) + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("tfidf"), F.asc("term"))
    return scored.select(
        "source", "term", "tfidf", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= 3)


@register(
    "corpus_mix_report",
    """
    SELECT source, lang,
           COUNT(*) AS n_docs,
           SUM(len(string_split(text, ' '))) AS total_tokens,
           SUM(n_chars) AS total_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY source, lang
    """,
    doc="Training-mix dashboard: per (source, language) document counts, "
        "token and char totals — the first table anyone pulls before "
        "weighting a pre-training mixture. All-integer aggregates (exact "
        "on any engine); one low-cardinality groupBy shuffle with "
        "map-side partials; the token count never leaves the scan task.",
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "source", "lang", "n_chars",
            F.size(F.split(F.col("text"), " ")).alias("n_tok"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "events_top_users_hourly",
    """
    WITH per AS (
        SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS BIGINT)
                   AS hour_idx,
               user_id, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT hour_idx, user_id, n, rk FROM (
        SELECT hour_idx, user_id, n,
               ROW_NUMBER() OVER (PARTITION BY hour_idx
                                  ORDER BY n DESC, user_id) AS rk
        FROM per
    ) WHERE rk <= 3
    """,
    doc="Windowed top-k: the 3 most active users per tumbling hour — the "
        "leaderboard composition (time-bucketed pre-aggregation, THEN a "
        "rank window over the |hours × active users| aggregate, never "
        "over raw events). One event-grain shuffle on (hour, user) with "
        "map-side partials; the rank window's input is orders of "
        "magnitude smaller than the stream.",
)
def events_top_users_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    per = (
        e.select(
            # integer div — exact, no double-rounding at hour boundaries
            F.expr("ts_us div 3600000000").alias("hour_idx"),
            "user_id",
        )
        .groupBy("hour_idx", "user_id")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("hour_idx").orderBy(F.desc("n"), F.asc("user_id"))
    return per.select(
        "hour_idx", "user_id", "n", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= 3)



@register(
    "events_unique_users_hourly",
    """
    SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS BIGINT)
               AS hour_idx,
           event_type,
           COUNT(DISTINCT user_id) AS unique_users
    FROM events
    GROUP BY 1, 2
    """,
    doc="Hourly distinct users per event type (exact). Spark expands "
        "COUNT DISTINCT into a two-stage aggregate: partial "
        "(hour, type, user) dedup map-side, then the final count — the "
        "exact-cardinality plan whose second shuffle motivates the HLL "
        "variant below at 100 TB.",
)
def events_unique_users_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.select(
            F.expr("ts_us div 3600000000").alias("hour_idx"),
            "event_type",
            "user_id",
        )
        .groupBy("hour_idx", "event_type")
        .agg(F.countDistinct("user_id").alias("unique_users"))
    )


@register(
    "events_unique_users_approx",
    None,  # sketch estimates are engine-specific — accuracy pinned by
           # tests/test_quantiles_approx.py::test_hll_unique_users_accuracy
    doc="Hourly distinct users per event type via HyperLogLog++ "
        "(approx_count_distinct, rsd=0.02). The sketch is MERGEABLE: "
        "partial aggregation ships one ~kB register set per "
        "(hour, type, partition) instead of the distinct user set, so "
        "the plan has ONE shuffle whose payload is independent of "
        "cardinality — the 100 TB path for unique-count dashboards "
        "(exact twin: events_unique_users_hourly).",
)
def events_unique_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.select(
            F.expr("ts_us div 3600000000").alias("hour_idx"),
            "event_type",
            "user_id",
        )
        .groupBy("hour_idx", "event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("unique_users")
        )
    )


_OVERLAP_SQL = f"""
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           COUNT(*) AS n_pairs
    FROM ({_MINHASH_PAIRS_SQL}) p
    JOIN documents da ON p.doc_a = da.doc_id
    JOIN documents db ON p.doc_b = db.doc_id
    GROUP BY 1, 2
"""


@register(
    "source_overlap_matrix",
    _OVERLAP_SQL,
    doc="Cross-source contamination matrix: MinHash-LSH near-dup pairs "
        "labeled with each side's corpus source, aggregated to an "
        "unordered (source_a, source_b) pair count — the report that says "
        "'src3 duplicates 12% of src0' before anyone weights a training "
        "mixture (diagonal = within-source redundancy). Plan: the pair "
        "set (≪ corpus by LSH construction) shuffle-joins twice on doc "
        "id to pick up sources — no new corpus-side shuffle beyond the "
        "LSH pipeline's own — and the final aggregate is |sources|² "
        "rows with map-side partials.",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_pairs(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    lab = (
        pairs.join(
            src.withColumnsRenamed({"doc_id": "doc_a", "source": "src_a"}),
            "doc_a",
        )
        .join(
            src.withColumnsRenamed({"doc_id": "doc_b", "source": "src_b"}),
            "doc_b",
        )
    )
    return lab.groupBy(
        F.least("src_a", "src_b").alias("source_a"),
        F.greatest("src_a", "src_b").alias("source_b"),
    ).agg(F.count("*").alias("n_pairs"))


@register(
    "events_anomaly_zscore",
    """
    WITH stats AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
               CAST(SUM(CAST(value AS DECIMAL(18,6))
                        * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sq
        FROM events GROUP BY event_type
    ),
    m AS (
        SELECT event_type, s / n AS mean,
               SQRT(GREATEST(sq / n - (s / n) * (s / n), 0)) AS std
        FROM stats
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - m.mean) / NULLIF(m.std, 0), 6) AS z
    FROM events e JOIN m ON e.event_type = m.event_type
    WHERE ABS((e.value - m.mean) / NULLIF(m.std, 0)) > 2.5
    """,
    doc="Per-event-type z-score anomaly flags (|z| > 2.5): mean/std derived "
        "from decimal-EXACT sum and sum-of-squares (distributed partial-sum "
        "order cannot perturb them), then identical scalar IEEE ops on both "
        "engines. Plan: one low-cardinality stats groupBy, stats broadcast "
        "back into the stream — the event scan is read once per pass, "
        "filter runs map-side. Rounded to 6dp for the oracle hash.",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    dec = F.col("value").cast("decimal(18,6)")
    stats = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("sq"),
    )
    m = stats.select(
        "event_type",
        (F.col("s") / F.col("n")).alias("mean"),
        # greatest(…, 0): the variance of a constant series can land at
        # -1e-18 in floats (sqrt would NaN); nullif(std, 0) then makes z
        # NULL for zero-variance types — dropped by the filter, never a
        # DIVIDE_BY_ZERO under ANSI
        F.sqrt(
            F.greatest(
                F.col("sq") / F.col("n")
                - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n")),
                F.lit(0.0),
            )
        ).alias("std"),
    )
    z = (F.col("value") - F.col("mean")) / F.expr("nullif(std, 0.0D)")
    return (
        e.join(F.broadcast(m), "event_type")
        .filter(F.abs(z) > 2.5)
        .select(
            "event_id", "event_type", "value", F.round(z, 6).alias("z")
        )
    )


@register(
    "multimodal_frames",
    """
    WITH meta AS (
        -- hex(encode(...)): all slicing happens on the BYTE stream (as hex
        -- pairs) — VARCHAR substring would slice CHARACTERS and diverge on
        -- non-ASCII text
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n_bytes,
               1 + doc_id % 3 AS n_frames
        FROM documents
    ),
    frames AS (
        SELECT doc_id, UNNEST(range(0, n_frames, 2)) AS frame_idx,
               hx, GREATEST(1, n_bytes // n_frames) AS step
        FROM meta
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           SUBSTRING(hx, CAST(frame_idx * step * 2 + 1 AS BIGINT),
                     CAST(step * 2 AS BIGINT)) AS frame_hex,
           CAST(strlen(SUBSTRING(hx, CAST(frame_idx * step * 2 + 1 AS BIGINT),
                                 CAST(step * 2 AS BIGINT))) // 2
                AS INT) AS frame_bytes
    FROM frames
    """,
    doc="Multimodal frame sampling under the oracle gate: the row-expanding "
        "mapInPandas plumbing (operators/multimodal.py sample_frames — one "
        "output row per kept frame, output rows ≠ input rows) with the "
        "deterministic stub decoder, verified byte-exactly by reproducing "
        "the byte slicing in SQL over the hex-encoded payload (works for "
        "any text, not just ASCII). A real codec swaps into the same "
        "batch shape.",
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.operators.multimodal import sample_frames

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    frames = sample_frames(d, every_n=2)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.hex(F.col("frame")).alias("frame_hex"),
        F.length(F.col("frame")).alias("frame_bytes"),
    )


@register(
    "dedup_keep_best",
    f"""
    WITH clusters AS ({_CLUSTERS_SQL}),
    ranked AS (
        SELECT c.cluster_id, d.doc_id, d.n_chars,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                  ORDER BY d.n_chars DESC, d.doc_id) AS rk,
               COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
        FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    )
    SELECT cluster_id, doc_id AS keep_doc_id, n_chars, n_members
    FROM ranked WHERE rk = 1
    """,
    doc="Canonical-document selection — the step AFTER near-dup detection in "
        "a curation pipeline: per MinHash-LSH cluster (dedup_clusters), keep "
        "the longest document, tie-broken by lowest doc_id. One cluster_id "
        "shuffle shared by the rank and member-count windows; emits one row "
        "per surviving document.",
    cache_plan=False,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = dedup_clusters(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = clusters.join(d, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    wc = Window.partitionBy("cluster_id")
    return (
        j.select(
            "cluster_id",
            "doc_id",
            "n_chars",
            F.row_number().over(w).alias("rk"),
            F.count("*").over(wc).alias("n_members"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_doc_id"),
            "n_chars",
            "n_members",
        )
    )


# ---------------------------------------------------------------------------
# Time-range (interval) join — SURVEY §2.3 J6 generalized to two streams
# ---------------------------------------------------------------------------

@register(
    "events_range_join",
    """
    SELECT p.event_id,
           COUNT(*) AS n_ctx,
           CAST(SUM(CAST(f.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_ctx
    FROM events p JOIN events f
      ON p.user_id = f.user_id
     AND epoch_us(CAST(f.ts AS TIMESTAMP))
         BETWEEN epoch_us(CAST(p.ts AS TIMESTAMP)) - 600000000
             AND epoch_us(CAST(p.ts AS TIMESTAMP))
    WHERE p.event_type = 'error'
    GROUP BY p.event_id
    """,
    doc="Time-range (interval) join: for every error event, aggregate all "
        "same-user events in the preceding 10 minutes (inclusive, probe "
        "itself included) — the context-window join behind incident "
        "analysis and windowed feature extraction. Spark's native plan for "
        "the non-equi time predicate is a nested-loop join (quadratic); "
        "operators/rangejoin.py rewrites it as bucketization: build rows "
        "replicate into the ≤2 10-min buckets they can influence, the join "
        "becomes a plain (user, bucket) equi-join AQE can skew-split, and "
        "the exact range predicate filters post-join. Work is linear in "
        "|events| + |matches|; the (user, bucket) shuffle key also "
        "co-locates the downstream per-event aggregation.",
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.operators.rangejoin import range_join_bucketed

    ev = load_events(spark, sf_dir)
    probes = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts_us").alias("p_ts")
    )
    builds = ev.select("user_id", F.col("ts_us").alias("f_ts"), "value")
    ten_min_us = 600_000_000
    joined = range_join_bucketed(
        probes, builds, key="user_id", probe_ts="p_ts", build_ts="f_ts",
        lo=-ten_min_us, hi=0,
    )
    return joined.groupBy("event_id").agg(
        F.count("*").alias("n_ctx"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_ctx"),
    )


@register(
    "events_quantiles_approx",
    None,  # sketch output is algorithm-specific; accuracy is pytest-bounded
    doc="Approximate per-type quantiles via approx_percentile (Greenwald-"
        "Khanna sketch, accuracy 10000): the mergeable-sketch scale path "
        "next to events_quantiles' exact baseline. Exact percentile "
        "collects every group's values into one reducer's memory; the GK "
        "sketch is fixed-size, merged map-side, and bounds rank error by "
        "1/accuracy — the only feasible form at 100 TB. No SQL oracle (no "
        "portable sketch semantics); tests/test_quantiles_approx.py asserts "
        "a 2% empirical rank-error bound against the exact path (small-sample "
        "slack over GK's formal 1/accuracy guarantee); the driver-visible "
        "form of that bound is the events_quantiles_gk_audit entry.",
)
def events_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.round(F.expr("approx_percentile(value, 0.5D, 10000)"), 6).alias("p50"),
        F.round(F.expr("approx_percentile(value, 0.95D, 10000)"), 6).alias("p95"),
        F.round(F.expr("approx_percentile(value, 0.99D, 10000)"), 6).alias("p99"),
    )


# ---------------------------------------------------------------------------
# Driver-visible bound audits for the two sketch entries (VERDICT r10 #7).
# The sketches themselves have no portable SQL semantics, so their raw
# entries are rows-only in the driver gate; these companion entries fold the
# exact twin INTO the query and output booleans ("estimate within its
# documented budget") next to oracle-checkable exact columns. A sketch
# regression flips a boolean → value-hash mismatch → the driver CORRECTNESS
# gate fails loudly, not just the builder-side LOCALGATE bound check.
# ---------------------------------------------------------------------------


@register(
    "events_unique_users_hll_audit",
    """
    SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS BIGINT)
               AS hour_idx,
           event_type,
           COUNT(DISTINCT user_id) AS unique_users,
           TRUE AS hll_within_bound
    FROM events
    GROUP BY 1, 2
    """,
    doc="HLL++ bound audit: one aggregation computes BOTH the exact "
        "distinct count and the rsd=0.02 sketch estimate per "
        "(hour, event_type) group, and outputs the exact count plus a "
        "boolean — |estimate − exact| ≤ max(2, 10%·exact), the budget the "
        "gate artifacts pin. The oracle expects TRUE on every row, so a "
        "sketch regression fails the driver's value-hash comparison "
        "loudly. The estimate itself is deliberately NOT a column (it is "
        "engine-specific); the audited CLAIM is portable.",
)
def events_unique_users_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    g = (
        e.select(
            F.expr("ts_us div 3600000000").alias("hour_idx"),
            "event_type",
            "user_id",
        )
        .groupBy("hour_idx", "event_type")
        .agg(
            F.countDistinct("user_id").alias("unique_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("est"),
        )
    )
    budget = F.greatest(F.lit(2.0), F.lit(0.10) * F.col("unique_users"))
    return g.select(
        "hour_idx",
        "event_type",
        "unique_users",
        (F.abs(F.col("est") - F.col("unique_users")) <= budget).alias(
            "hll_within_bound"
        ),
    )


@register(
    "events_quantiles_gk_audit",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           TRUE AS ok_p50, TRUE AS ok_p95, TRUE AS ok_p99
    FROM events
    GROUP BY event_type
    """,
    doc="Greenwald-Khanna bound audit: score each approx_percentile "
        "output by its EMPIRICAL RANK in the group (the faithful metric — "
        "GK returns an observed value near the target rank, while exact "
        "percentile interpolates) and flag whether the target quantile "
        "lies inside the value's rank interval widened by the 2% slack "
        "the accuracy tests pin. Distributed form of "
        "test_quantiles_approx: the per-type sketch row broadcasts back "
        "onto one events pass that counts values strictly-below / "
        "at-or-below each returned quantile; ties widen the interval "
        "exactly as in the pytest. Oracle expects all-TRUE, so a sketch "
        "regression fails the driver gate, not only the local suite.",
)
def events_quantiles_gk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    ap = e.groupBy("event_type").agg(
        F.round(F.expr("approx_percentile(value, 0.5D, 10000)"), 6).alias("p50"),
        F.round(F.expr("approx_percentile(value, 0.95D, 10000)"), 6).alias("p95"),
        F.round(F.expr("approx_percentile(value, 0.99D, 10000)"), 6).alias("p99"),
    )
    v6 = F.round(F.col("value"), 6)
    j = e.select("event_type", "value").join(F.broadcast(ap), "event_type")
    agg_cols = [F.count("*").alias("n_events")]
    for q in ("p50", "p95", "p99"):
        agg_cols.append(
            F.sum(F.when(v6 < F.col(q), 1).otherwise(0)).alias(f"lo_{q}")
        )
        agg_cols.append(
            F.sum(F.when(v6 <= F.col(q), 1).otherwise(0)).alias(f"hi_{q}")
        )
    g = j.groupBy("event_type").agg(*agg_cols)
    slack = F.lit(0.02)
    out_cols = [F.col("event_type"), F.col("n_events")]
    for q, target in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
        lo = F.col(f"lo_{q}") / F.col("n_events")
        hi = F.col(f"hi_{q}") / F.col("n_events")
        out_cols.append(
            ((lo - slack <= F.lit(target)) & (F.lit(target) <= hi + slack))
            .alias(f"ok_{q}")
        )
    return g.select(*out_cols)


# ---------------------------------------------------------------------------
# Text analysis: repetition signals (Gopher/C4-style quality rules — the
# most-repeated-word fraction and the duplicate-bigram mass of a document)
# ---------------------------------------------------------------------------

_REPETITION_SQL = f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
        SELECT doc_id, 0 AS kind, {_hash60_duck('w[i]')} AS g
        FROM words, UNNEST(range(1, len(w) + 1)) AS t(i)
        UNION ALL
        SELECT doc_id, 1 AS kind, {_hash60_duck("w[i] || ' ' || w[i+1]")} AS g
        FROM words, UNNEST(range(1, len(w))) AS t(i)
    ),
    cnt AS (SELECT doc_id, kind, g, COUNT(*) AS c FROM grams GROUP BY 1, 2, 3)
    SELECT doc_id,
           MAX(CASE WHEN kind = 0 THEN c END) AS top_word_count,
           CAST(SUM(CASE WHEN kind = 0 THEN c END) AS BIGINT) AS n_words,
           ROUND(CAST(MAX(CASE WHEN kind = 0 THEN c END) AS DOUBLE)
                 / SUM(CASE WHEN kind = 0 THEN c END), 6) AS top_word_frac,
           ROUND(CAST(COALESCE(SUM(CASE WHEN kind = 1 AND c > 1 THEN c END), 0)
                      AS DOUBLE)
                 / SUM(CASE WHEN kind = 1 THEN c END), 6) AS dup_bigram_frac
    FROM cnt GROUP BY doc_id
"""


@register(
    "text_repetition",
    _REPETITION_SQL,
    doc="Repetition signals (Gopher/C4 quality rules): most-frequent-word "
        "fraction and the fraction of bigram occurrences belonging to "
        "repeated bigrams — the standard boilerplate/spam detectors of a "
        "pretraining curation pass. One pass: words and bigrams ride one "
        "exploded array with a kind marker (no second documents scan), "
        "grams are 60-bit hashes so the (doc, kind, gram) shuffle key is "
        "fixed-width, and both shuffles are doc-grain (no global state). "
        "All aggregates are exact integers; the two fractions are single "
        "int/int divisions, identical IEEE ops on both engines.",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs_parallel(spark, sf_dir).select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    )
    # Array build in its own select BELOW the explode (same plan-shape rule
    # as dedup_ngram_jaccard: fused, the Project lands above the Generate
    # and re-evaluates per exploded row). sequence() guard: size(w)==1 must
    # yield an empty bigram list, not sequence(1,0) == [1,0].
    word_h = _hash60_spark("x")
    bigram_h = _hash60_spark("concat(element_at(w, i), ' ', element_at(w, i + 1))")
    arr = base.select(
        "doc_id",
        F.expr(
            f"""concat(
                transform(w, x -> named_struct('kind', 0, 'g', {word_h})),
                transform(
                    if(size(w) >= 2, sequence(1, size(w) - 1), array()),
                    i -> named_struct('kind', 1, 'g', {bigram_h})))"""
        ).alias("arr"),
    )
    g = arr.select("doc_id", F.explode("arr").alias("s")).select(
        "doc_id", F.col("s.kind").alias("kind"), F.col("s.g").alias("g")
    )
    cnt = g.groupBy("doc_id", "kind", "g").agg(F.count("*").alias("c"))
    w0 = F.when(F.col("kind") == 0, F.col("c"))
    w1 = F.when(F.col("kind") == 1, F.col("c"))
    return cnt.groupBy("doc_id").agg(
        F.max(w0).alias("top_word_count"),
        F.sum(w0).alias("n_words"),
        F.round(F.max(w0).cast("double") / F.sum(w0), 6).alias("top_word_frac"),
        F.round(
            F.coalesce(
                F.sum(F.when((F.col("kind") == 1) & (F.col("c") > 1), F.col("c"))),
                F.lit(0),
            ).cast("double")
            / F.sum(w1),
            6,
        ).alias("dup_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# Text analysis: corpus-level unigram LM scoring (perplexity-style quality
# signal without an external model — the corpus is its own language model)
# ---------------------------------------------------------------------------

_UNIGRAM_SQL = """
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents
    ),
    vocab AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY t),
    tot AS (SELECT SUM(c) AS n FROM vocab)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(LN(CAST(c AS DOUBLE) / n)), 6) AS mean_logprob,
           ROUND(-AVG(LN(CAST(c AS DOUBLE) / n)) / LN(2), 6) AS bits_per_token
    FROM toks JOIN vocab USING (t) CROSS JOIN tot
    GROUP BY doc_id
"""


@register(
    "text_unigram_logprob",
    _UNIGRAM_SQL,
    doc="Unigram log-probability scoring: fit a unigram LM on the corpus "
        "itself (token → count, one aggregation with map-side partials), "
        "then score every document's mean log-prob / bits-per-token under "
        "it — the cheap perplexity proxy used to rank documents before an "
        "expensive model-based filter. The vocab (|distinct tokens| ≪ "
        "|tokens|) broadcasts into the scoring join, so the corpus-side "
        "token stream is never shuffled for the lookup; the only "
        "corpus-scale shuffle is the per-doc aggregation. The 1-row total "
        "is a broadcast cross join, not a collect. Scale ceiling: at "
        "100 TB the raw vocab (long tail of typos) can outgrow a "
        "broadcast — the production form truncates to the top-K tokens "
        "by count with one OOV fallback probability (constant-size "
        "broadcast, same plan), or drops the hint and lets AQE pick a "
        "shuffle join.",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_parallel(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("t"))
    vocab = toks.groupBy("t").agg(F.count("*").alias("c"))
    tot = vocab.agg(F.sum("c").alias("n"))
    logprob = F.log(F.col("c").cast("double") / F.col("n"))
    return (
        toks.join(F.broadcast(vocab), "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(logprob), 6).alias("mean_logprob"),
            F.round(-F.avg(logprob) / F.log(F.lit(2.0)), 6).alias("bits_per_token"),
        )
    )


_BIGRAM_SQL = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    uni AS (
        SELECT t, COUNT(*) AS c
        FROM (SELECT UNNEST(string_split(text, ' ')) AS t FROM documents)
        GROUP BY t
    ),
    tot AS (SELECT SUM(c) AS n FROM uni),
    bg AS (
        SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS r(i)
    ),
    bgc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(AVG(LN(0.75 * CAST(cb AS DOUBLE) / u1.c
                        + 0.25 * CAST(u2.c AS DOUBLE) / n)), 6)
               AS mean_logprob,
           ROUND(-AVG(LN(0.75 * CAST(cb AS DOUBLE) / u1.c
                         + 0.25 * CAST(u2.c AS DOUBLE) / n)) / LN(2), 6)
               AS bits_per_bigram
    FROM bg
    JOIN bgc USING (w1, w2)
    JOIN uni u1 ON bg.w1 = u1.t
    JOIN uni u2 ON bg.w2 = u2.t
    CROSS JOIN tot
    GROUP BY doc_id
"""


@register(
    "text_bigram_perplexity",
    _BIGRAM_SQL,
    doc="Bigram-interpolated LM perplexity (the CCNet-style quality "
        "signal one model class up from text_unigram_logprob): fit "
        "corpus bigram counts, score every document's mean log-prob "
        "under P(w2|w1) = 0.75·c(w1w2)/c(w1) + 0.25·c(w2)/N — "
        "interpolation with the unigram model, so unseen-in-context "
        "words degrade smoothly instead of zeroing the product. "
        "Bigrams form MAP-SIDE from each document's token array "
        "(transform over an index sequence — no positional self-join); "
        "the unigram vocab broadcasts; the only corpus-scale shuffles "
        "are the bigram-count groupBy and its join back to the bigram "
        "stream (same key, so the exchange is reused) plus the per-doc "
        "aggregation. Docs with <2 tokens have no bigrams and drop. "
        "Scale ceiling mirrors the unigram op: at 100 TB truncate the "
        "models to top-K n-grams with an OOV floor, same plan shape.",
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_parallel(spark, sf_dir)
    ts = F.split(F.col("text"), " ")
    # the <2-token guard must precede sequence(): Spark's sequence(0, -1)
    # counts DOWN ([0, -1]), it does not return an empty array
    bg = (
        d.filter(F.size(ts) >= 2)
        .select("doc_id", F.explode(_bigram_structs()).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("t"))
    uni = toks.groupBy("t").agg(F.count("*").alias("c"))
    tot = uni.agg(F.sum("c").alias("n"))
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    u1 = F.broadcast(uni.select(F.col("t").alias("w1"), F.col("c").alias("c1")))
    u2 = F.broadcast(uni.select(F.col("t").alias("w2"), F.col("c").alias("c2")))
    p = (
        F.lit(0.75) * F.col("cb").cast("double") / F.col("c1")
        + F.lit(0.25) * F.col("c2").cast("double") / F.col("n")
    )
    return (
        bg.join(bgc, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log(p)), 6).alias("mean_logprob"),
            F.round(-F.avg(F.log(p)) / F.log(F.lit(2.0)), 6).alias(
                "bits_per_bigram"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Text analysis: bounded-vocabulary LM variants — the 100 TB form of the two
# LM scoring ops above. The raw vocab (long tail of typos/ids) is
# data-dependent and can outgrow a broadcast; these truncate the model to the
# top-K tokens by count (deterministic tie-break: count desc, token asc) and
# route every tail token through a single OOV bucket whose count is the tail
# mass — so the broadcast side is ≤ K+1 rows BY CONSTRUCTION, not by luck.
# ---------------------------------------------------------------------------

# K is deliberately below the fixture vocab (31 distinct tokens at every SF)
# so the OOV path is exercised, not just compiled.
_LM_TOPK = 16
# Sentinel for the OOV bucket: chr(1) cannot collide with any whitespace-split
# token (the parquet fixtures are printable words; a control char never is).
_LM_OOV = "\x01"

_UNIGRAM_TOPK_SQL = f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents
    ),
    uni AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY t),
    tot AS (SELECT SUM(c) AS n FROM uni),
    topk AS (SELECT t, c FROM uni ORDER BY c DESC, t ASC LIMIT {_LM_TOPK}),
    oov AS (
        SELECT GREATEST(n - (SELECT SUM(c) FROM topk), 1) AS oc, n FROM tot
    )
    SELECT toks.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN topk.t IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           ROUND(AVG(LN(CAST(COALESCE(topk.c, oov.oc) AS DOUBLE) / oov.n)), 6)
               AS mean_logprob,
           ROUND(-AVG(LN(CAST(COALESCE(topk.c, oov.oc) AS DOUBLE) / oov.n))
                 / LN(2), 6) AS bits_per_token
    FROM toks LEFT JOIN topk ON toks.t = topk.t CROSS JOIN oov
    GROUP BY toks.doc_id
"""


def _lm_topk_fit(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Fit the truncated unigram model ONCE and materialize it (eager
    localCheckpoint — the tables are ≤ K rows / 1 row, so this is the
    'persist the fitted model' step of a production scoring pipeline,
    not a corpus materialization). Without it, every broadcast consumer
    of the model re-runs the corpus-scale vocab aggregation — the lazy
    form costs O(consumers) corpus scans at 100 TB. Returns
    (topk, tot): the top-K (count desc, token asc — a total order, so
    the set is deterministic) vocab rows and the 1-row token total.
    The top-K is a TakeOrderedAndProject over the already-aggregated
    vocab, never the corpus."""
    toks = _docs_parallel(spark, sf_dir).select(
        F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    uni = toks.groupBy("t").agg(F.count("*").alias("c"))
    topk = (
        uni.orderBy(F.col("c").desc(), F.col("t").asc())
        .limit(_LM_TOPK)
        .localCheckpoint(eager=True)
    )
    tot = uni.agg(F.sum("c").alias("n")).localCheckpoint(eager=True)
    return topk, tot


@register(
    "text_unigram_logprob_topk",
    _UNIGRAM_TOPK_SQL,
    doc="text_unigram_logprob with the vocabulary truncated to the top-K "
        "tokens by count (tie-break count desc / token asc — a total order, "
        "so both engines pick the identical set) and one OOV bucket holding "
        "the tail mass (floored at 1 so log never sees zero). The scoring "
        "join's broadcast side is ≤ K+1 rows BY CONSTRUCTION — the plan "
        "survives any vocabulary distribution at 100 TB, unlike the exact "
        "op whose broadcast is data-dependent. The model is fitted once and "
        "materialized (_lm_topk_fit), so scoring is a single corpus pass: "
        "one ≤K-row broadcast left join + one per-doc aggregation. n_oov "
        "is the per-doc audit column: how many of the doc's tokens scored "
        "through the bucket. cache_plan=False: the fit is a real "
        "corpus-scale job at construction time — repeat calls must honestly "
        "re-run it.",
    cache_plan=False,
)
def text_unigram_logprob_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    topk, tot = _lm_topk_fit(spark, sf_dir)
    kmass = topk.agg(F.sum("c").alias("km"))
    # 1 row: (OOV count floored at 1, total tokens) — derived from the
    # checkpointed fit, no corpus re-scan
    oov = tot.crossJoin(kmass).select(
        F.greatest(F.col("n") - F.col("km"), F.lit(1)).alias("oc"), "n"
    )
    toks = _docs_parallel(spark, sf_dir).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    lp = F.log(F.coalesce(F.col("c"), F.col("oc")).cast("double") / F.col("n"))
    return (
        toks.join(F.broadcast(topk), "t", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("c").isNull(), 1).otherwise(0)).alias("n_oov"),
            F.round(F.avg(lp), 6).alias("mean_logprob"),
            F.round(-F.avg(lp) / F.log(F.lit(2.0)), 6).alias("bits_per_token"),
        )
    )


_BIGRAM_TOPK_SQL = f"""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    toks AS (SELECT UNNEST(string_split(text, ' ')) AS t FROM documents),
    uni AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY t),
    tot AS (SELECT SUM(c) AS n FROM uni),
    topk AS (SELECT t, c FROM uni ORDER BY c DESC, t ASC LIMIT {_LM_TOPK}),
    unim AS (
        SELECT t, c FROM topk
        UNION ALL
        SELECT chr(1) AS t,
               GREATEST((SELECT n FROM tot) - (SELECT SUM(c) FROM topk), 1)
                   AS c
    ),
    bg AS (
        SELECT doc_id,
               CASE WHEN ts[i] IN (SELECT t FROM topk)
                    THEN ts[i] ELSE chr(1) END AS w1,
               CASE WHEN ts[i + 1] IN (SELECT t FROM topk)
                    THEN ts[i + 1] ELSE chr(1) END AS w2
        FROM docs, UNNEST(generate_series(1, len(ts) - 1)) AS r(i)
    ),
    bgc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2)
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CASE WHEN bg.w1 = chr(1) OR bg.w2 = chr(1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_oov_bigrams,
           ROUND(AVG(LN(0.75 * CAST(cb AS DOUBLE) / u1.c
                        + 0.25 * CAST(u2.c AS DOUBLE) / n)), 6)
               AS mean_logprob,
           ROUND(-AVG(LN(0.75 * CAST(cb AS DOUBLE) / u1.c
                         + 0.25 * CAST(u2.c AS DOUBLE) / n)) / LN(2), 6)
               AS bits_per_bigram
    FROM bg
    JOIN bgc ON bg.w1 = bgc.w1 AND bg.w2 = bgc.w2
    JOIN unim u1 ON bg.w1 = u1.t
    JOIN unim u2 ON bg.w2 = u2.t
    CROSS JOIN tot
    GROUP BY bg.doc_id
"""


@register(
    "text_bigram_perplexity_topk",
    _BIGRAM_TOPK_SQL,
    doc="text_bigram_perplexity with the model truncated to the top-K "
        "unigram vocabulary plus one OOV bucket: every token outside the "
        "top-K maps to the bucket BEFORE bigram formation, so the bigram "
        "model's key space is bounded by (K+1)² and the unigram lookup "
        "tables broadcast ≤ K+1 rows by construction — the documented "
        "100 TB ceiling of the exact op, implemented. Same plan shape as "
        "the exact op (map-side bigram formation, same-key exchange reuse "
        "on the bigram-count join-back, one per-doc aggregation); the only "
        "additions are two ≤K-row broadcast membership probes doing the "
        "token→bucket mapping. Interpolated scoring is unchanged: "
        "P(w2|w1) = 0.75·c(w1w2)/c(w1) + 0.25·c(w2)/N over the MAPPED "
        "streams, with the OOV bucket carrying the tail mass (floored at "
        "1). n_oov_bigrams audits how many of a doc's bigrams touched the "
        "bucket. The unigram model is fitted once and materialized "
        "(_lm_topk_fit) — the lazy form re-runs the corpus-scale vocab "
        "aggregation for every broadcast consumer. cache_plan=False: the "
        "fit is a real corpus job at construction time.",
    cache_plan=False,
)
def text_bigram_perplexity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_parallel(spark, sf_dir)
    ts = F.split(F.col("text"), " ")
    topk, tot = _lm_topk_fit(spark, sf_dir)
    kmass = topk.agg(F.sum("c").alias("km"))
    oov_row = tot.crossJoin(kmass).select(
        F.lit(_LM_OOV).alias("t"),
        F.greatest(F.col("n") - F.col("km"), F.lit(1)).alias("c"),
    )
    unim = topk.unionByName(oov_row)  # ≤ K+1 rows by construction
    # raw bigrams form map-side exactly as the exact op (sequence guard:
    # <2-token docs drop before sequence() can count down)
    bg = (
        d.filter(F.size(ts) >= 2)
        .select("doc_id", F.explode(_bigram_structs()).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )
    # token → bucket mapping: two ≤K-row broadcast membership probes
    m1 = F.broadcast(topk.select(F.col("t").alias("w1"), F.lit(1).alias("in1")))
    m2 = F.broadcast(topk.select(F.col("t").alias("w2"), F.lit(1).alias("in2")))
    bgm = (
        bg.join(m1, "w1", "left")
        .join(m2, "w2", "left")
        .select(
            "doc_id",
            F.when(F.col("in1").isNotNull(), F.col("w1"))
            .otherwise(F.lit(_LM_OOV))
            .alias("w1"),
            F.when(F.col("in2").isNotNull(), F.col("w2"))
            .otherwise(F.lit(_LM_OOV))
            .alias("w2"),
        )
    )
    # mapped bigram counts: the key space is ≤ (K+1)² by construction, so
    # the fitted bigram table broadcasts — the probe side is never shuffled
    # for the join-back (unlike the exact op, whose bigram table is
    # corpus-vocabulary-sized and must shuffle-join)
    bgc = bgm.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    u1 = F.broadcast(unim.select(F.col("t").alias("w1"), F.col("c").alias("c1")))
    u2 = F.broadcast(unim.select(F.col("t").alias("w2"), F.col("c").alias("c2")))
    p = (
        F.lit(0.75) * F.col("cb").cast("double") / F.col("c1")
        + F.lit(0.25) * F.col("c2").cast("double") / F.col("n")
    )
    oov_hit = (F.col("w1") == _LM_OOV) | (F.col("w2") == _LM_OOV)
    return (
        bgm.join(F.broadcast(bgc), ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.when(oov_hit, 1).otherwise(0)).alias("n_oov_bigrams"),
            F.round(F.avg(F.log(p)), 6).alias("mean_logprob"),
            F.round(-F.avg(F.log(p)) / F.log(F.lit(2.0)), 6).alias(
                "bits_per_bigram"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Corpus curation: rule-based quality filter (Gopher-style keep/drop with
# per-rule flags — the auditable form: you can see WHY a doc was dropped)
# ---------------------------------------------------------------------------

_FILTER_RULES_SQL = """
    WITH feat AS (
        SELECT doc_id, source, n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS n_stop
        FROM documents
    )
    SELECT doc_id, source, n_tokens,
           n_tokens BETWEEN 10 AND 1000 AS pass_len,
           CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens
               BETWEEN 2.0 AND 12.0 AS pass_word_len,
           n_stop >= 2 AS pass_stopwords,
           -- NULLIF: empty document (n_chars = 0) → NULL flag, not a
           -- divide-by-zero under Spark ANSI; NULL AND false = false
           -- keeps `keep` three-valued-consistent on both engines
           CAST(n_alpha AS DOUBLE) / NULLIF(n_chars, 0) >= 0.55 AS pass_alpha,
           (n_tokens BETWEEN 10 AND 1000)
               AND (CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens
                    BETWEEN 2.0 AND 12.0)
               AND n_stop >= 2
               AND CAST(n_alpha AS DOUBLE) / NULLIF(n_chars, 0) >= 0.55 AS keep
    FROM feat
"""


@register(
    "corpus_filter_rules",
    _FILTER_RULES_SQL,
    doc="Gopher-style rule filter with per-rule audit flags: token-count "
        "band, mean word length band (chars net of separators / tokens — "
        "exact integer arithmetic), minimum stopword hits, alphabetic "
        "ratio floor, plus the conjunctive keep bit. Pure map-side — zero "
        "shuffles, zero UDFs; at 100 TB this is a single scan whose "
        "projections all stay in whole-stage codegen.",
)
def corpus_filter_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    feat = d.select(
        "doc_id",
        "source",
        "n_chars",
        n_tokens.alias("n_tokens"),
        F.length(F.regexp_replace(F.col("text"), "[^a-z]", "")).alias("n_alpha"),
        F.expr(
            "size(filter(split(text, ' '), "
            "t -> t IN ('the', 'a', 'of', 'and', 'to', 'in')))"
        ).alias("n_stop"),
    )
    mean_wl = (F.col("n_chars") - F.col("n_tokens") + 1).cast("double") / F.col(
        "n_tokens"
    )
    pass_len = (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 1000)
    pass_word_len = (mean_wl >= 2.0) & (mean_wl <= 12.0)
    pass_stopwords = F.col("n_stop") >= 2
    pass_alpha = (
        F.col("n_alpha").cast("double") / F.expr("nullif(n_chars, 0)") >= 0.55
    )
    return feat.select(
        "doc_id",
        "source",
        "n_tokens",
        pass_len.alias("pass_len"),
        pass_word_len.alias("pass_word_len"),
        pass_stopwords.alias("pass_stopwords"),
        pass_alpha.alias("pass_alpha"),
        (pass_len & pass_word_len & pass_stopwords & pass_alpha).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Embedding curation: symmetric int8 quantization (the storage/serving
# compression step of an embedding pipeline), exploded to scalar rows so
# the oracle compares exact integers
# ---------------------------------------------------------------------------

_QUANTIZE_SQL = """
    WITH scaled AS (
        SELECT vec_id, embedding,
               -- explicit DOUBLE: DuckDB types FLOAT / 127.0 as FLOAT
               -- (decimal literal), Spark promotes to double
               CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
                   / 127.0 AS scale
        FROM embeddings
    )
    SELECT vec_id, CAST(i AS INTEGER) AS dim,
           -- NULLIF: a zero vector has scale 0 → q is NULL (undefined),
           -- not 0/0 (NaN→int cast throws under Spark ANSI)
           CAST(round(CAST(embedding[i] AS DOUBLE) / NULLIF(scale, 0.0))
                AS INTEGER) AS q,
           CAST(round(scale * 1000000000.0) AS BIGINT) AS scale_e9
    FROM scaled, UNNEST(range(1, len(embedding) + 1)) AS t(i)
"""


@register(
    "embed_quantize_int8",
    _QUANTIZE_SQL,
    doc="Symmetric per-vector int8 quantization: scale = max|x|/127, q = "
        "round(x/scale) ∈ [-127, 127] — 4× smaller vectors for ANN serving "
        "with ~1e-2 recall cost. Map-side only (scale and quantized values "
        "derive from the row itself — no shuffle, no UDF; the transform/"
        "array_max/posexplode chain is all JVM expression code). Output is "
        "posexploded to (vec_id, dim, q) scalar rows: float32→float64 "
        "promotion is exact on both engines, so q compares bit-identically; "
        "the per-vector scale is surfaced as an integer nano-scale "
        "(round(scale·1e9)) because round(double, 9) itself differs "
        "between engines (Spark routes through BigDecimal string forms).",
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    scaled = e.select(
        "vec_id",
        "embedding",
        (
            F.expr("array_max(transform(embedding, x -> abs(x)))") / F.lit(127.0)
        ).alias("scale"),
    )
    return scaled.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "v"),
        "scale",
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.round(F.col("v").cast("double") / F.expr("nullif(scale, 0.0D)"))
        .cast("int")
        .alias("q"),
        F.round(F.col("scale") * F.lit(1_000_000_000.0))
        .cast("bigint")
        .alias("scale_e9"),
    )


# ---------------------------------------------------------------------------
# Corpus chunking + per-source quotas + product funnels / retention +
# embedding outlier pruning (training-data curation, batch 5)
# ---------------------------------------------------------------------------

_CHUNK_LEN = 200
_CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks

_DOC_CHUNKS_SQL = f"""
    SELECT doc_id,
           chunk_idx,
           chunk_idx * {_CHUNK_STRIDE} + 1 AS chunk_start,
           CAST(length(substr(text, CAST(chunk_idx * {_CHUNK_STRIDE} + 1 AS INT),
                              {_CHUNK_LEN})) AS BIGINT) AS chunk_len,
           md5(substr(text, CAST(chunk_idx * {_CHUNK_STRIDE} + 1 AS INT),
                      {_CHUNK_LEN})) AS chunk_hash
    FROM documents,
         UNNEST(range(0, CAST(ceil(coalesce(length(text), 0) / {_CHUNK_STRIDE}.0)
                              AS BIGINT))) t(chunk_idx)
"""


@register(
    "doc_chunks",
    _DOC_CHUNKS_SQL,
    doc=f"Context-window chunking: split every document into "
        f"{_CHUNK_LEN}-char windows on a {_CHUNK_STRIDE}-char stride "
        f"(50-char overlap so no sentence is lost at a boundary) — the map "
        f"from raw corpus to training-sequence candidates. Pure narrow op: "
        f"sequence+explode+substring are all JVM expression code evaluated "
        f"inside the scan task, zero shuffles, so the plan is embarrassingly "
        f"parallel at 100 TB (output ~ len/stride rows per doc). Emits a "
        f"chunk md5 so downstream chunk-level dedup can groupBy(hash) "
        f"without re-reading text.",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n = "coalesce(length(text), 0)"
    idx = (
        f"explode(CASE WHEN {n} = 0 THEN CAST(array() AS ARRAY<BIGINT>) "
        f"ELSE sequence(CAST(0 AS BIGINT), "
        f"CAST(ceil({n} / {_CHUNK_STRIDE}.0) AS BIGINT) - 1) END)"
    )
    chunk = (
        f"substring(text, CAST(chunk_idx * {_CHUNK_STRIDE} + 1 AS INT), "
        f"{_CHUNK_LEN})"
    )
    return (
        d.select("doc_id", "text", F.expr(idx).alias("chunk_idx"))
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * _CHUNK_STRIDE + 1).alias("chunk_start"),
            F.expr(f"CAST(length({chunk}) AS BIGINT)").alias("chunk_len"),
            F.expr(f"md5({chunk})").alias("chunk_hash"),
        )
    )


_QUOTA = 10

_QUOTA_SQL = f"""
    SELECT doc_id, source, rk FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY {_hash60_duck("CAST(doc_id AS VARCHAR)")}
                            ASC NULLS FIRST,
                            doc_id ASC NULLS FIRST) AS rk
        FROM documents
    ) WHERE rk <= {_QUOTA}
"""


@register(
    "sample_per_source_quota",
    _QUOTA_SQL,
    doc=f"Per-source quota sampling: keep a deterministic pseudo-random "
        f"{_QUOTA} documents per source (rank by md5(doc_id) — a seeded "
        f"shuffle that is reproducible across engines and runs, unlike "
        f"rand()) — the de-biasing step that stops one crawl dump from "
        f"dominating a training mix. One shuffle on source; at 100 TB a "
        f"hot source makes that window skewed, so the scale path is the "
        f"same two-phase trick as skew_salted_agg: rank within "
        f"(source, salt), keep quota per salt-cell, then take the quota "
        f"lowest hashes across cells — the hash ordering makes the "
        f"two-phase result identical to the global rank.",
)
def sample_per_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = F.expr(_hash60_spark("CAST(doc_id AS STRING)"))
    w = Window.partitionBy("source").orderBy(
        h.asc_nulls_first(), F.asc_nulls_first("doc_id")
    )
    return (
        d.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _QUOTA)
    )


_FUNNEL_WINDOW_US = 86_400_000_000  # 24 h

_FUNNEL_SQL = f"""
    WITH ev AS (
        SELECT user_id, event_id, event_type,
               CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us
        FROM events
    ), w AS (
        SELECT user_id, event_type, ts_us,
               MIN(CASE WHEN event_type = 'signup' THEN ts_us END) OVER (
                   PARTITION BY user_id
                   ORDER BY ts_us ASC NULLS FIRST, event_id ASC NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS fs
        FROM ev
    )
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN ts_us END)
               AS first_signup_us,
           MIN(CASE WHEN event_type = 'purchase' AND fs IS NOT NULL
                     AND ts_us - fs <= {_FUNNEL_WINDOW_US}
                    THEN ts_us END) AS first_conversion_us
    FROM w
    GROUP BY user_id
    HAVING MIN(CASE WHEN event_type = 'signup' THEN ts_us END) IS NOT NULL
"""


@register(
    "events_funnel",
    _FUNNEL_SQL,
    doc="Conversion funnel: per user, the first signup and the first "
        "purchase that follows it within 24 h (order enforced by a running "
        "min-signup window, so a purchase BEFORE any signup never counts). "
        "Single-shuffle plan: the window hash-partitions on user_id and the "
        "groupBy(user_id) that follows reuses that exact distribution — "
        "Catalyst elides the second Exchange — so the whole funnel is one "
        "pass over events however large the stream.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_first("ts_us"), F.asc_nulls_first("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sig = F.when(F.col("event_type") == "signup", F.col("ts_us"))
    base = e.select("user_id", "event_id", "event_type", "ts_us").withColumn(
        "fs", F.min(sig).over(w)
    )
    conv = F.when(
        (F.col("event_type") == "purchase")
        & F.col("fs").isNotNull()
        & (F.col("ts_us") - F.col("fs") <= _FUNNEL_WINDOW_US),
        F.col("ts_us"),
    )
    return (
        base.groupBy("user_id")
        .agg(
            F.min(sig).alias("first_signup_us"),
            F.min(conv).alias("first_conversion_us"),
        )
        .filter(F.col("first_signup_us").isNotNull())
    )


_RETENTION_SQL = """
    WITH d AS (
        SELECT user_id,
               CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT)
                   AS day
        FROM events
    ), c AS (
        SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id
    )
    SELECT c.cohort_day,
           d.day - c.cohort_day AS day_offset,
           COUNT(DISTINCT d.user_id) AS n_users
    FROM d JOIN c USING (user_id)
    GROUP BY 1, 2
"""


@register(
    "events_retention",
    _RETENTION_SQL,
    doc="Retention cohorts: users bucketed by first-seen day, counted "
        "distinct on each later active day offset — the D1/D7/D30 grid. "
        "Plan: the cohort aggregate and the self-join both hash on "
        "user_id (one event-grain shuffle, join reuses it), then the "
        "distinct-count shuffle runs on the (cohort, offset, user) "
        "projection — days, not events, so the second stage is bounded by "
        "|users| × active-days, far below the raw stream.",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    d = e.select("user_id", F.expr("ts_us div 86400000000").alias("day"))
    c = d.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        d.join(c, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_OUTLIERS_SQL = """
    WITH dims AS (
        SELECT label, i,
               CAST(embedding[i] AS DECIMAL(27,12)) AS val
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) t(i)
    ), m AS (
        SELECT label, i,
               ROUND(CAST(SUM(val) AS DOUBLE) / COUNT(*), 9) AS m
        FROM dims GROUP BY label, i
    ), c AS (
        SELECT label, list(m ORDER BY i) AS centroid FROM m GROUP BY label
    ), s AS (
        SELECT e.label, e.vec_id,
               ROUND(list_sum(list_transform(range(1, len(e.embedding) + 1),
                     i -> (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])
                        * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]))),
                     6) AS sqdist
        FROM embeddings e JOIN c USING (label)
    )
    SELECT label, vec_id, sqdist, rk FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY label ORDER BY sqdist DESC, vec_id) AS rk
        FROM s
    ) WHERE rk <= 3
"""


@register(
    "embed_label_outliers",
    _OUTLIERS_SQL,
    doc="Embedding-space outlier pruning: per-label centroid (decimal-exact "
        "partial sums over a (label, dim) shuffle — same determinism "
        "technique as kmeans_embeddings), then each vector's squared L2 "
        "distance to its own label centroid via a sequential-fold zip_with, "
        "top-3 farthest per label — the SemDeDup-style 'flag vectors that "
        "do not belong to their cluster' curation signal. The k×d centroid "
        "table is broadcast back; the corpus is scanned, never self-joined, "
        "and the final window ranks |labels| × |vectors-per-label| locally.",
)
def embed_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    dims = e.select("label", F.posexplode("embedding").alias("dim", "val"))
    means = dims.groupBy("label", "dim").agg(
        F.round(
            F.sum(F.col("val").cast("decimal(27,12)")).cast("double")
            / F.count("*"),
            9,
        ).alias("m")
    )
    cent = (
        means.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select("label", F.col("dm.m").alias("centroid"))
    )
    sq = F.expr(
        "round(aggregate(zip_with(embedding, centroid, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v), 6)"
    )
    scored = e.join(F.broadcast(cent), "label").select(
        "label", "vec_id", sq.alias("sqdist")
    )
    w = Window.partitionBy("label").orderBy(F.desc("sqdist"), F.asc("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 3
    )


_CHUNK_DUP_SQL = f"""
    WITH ch AS (
        SELECT doc_id, source,
               md5(substr(text, CAST(chunk_idx * {_CHUNK_STRIDE} + 1 AS INT),
                          {_CHUNK_LEN})) AS h
        FROM documents,
             UNNEST(range(0, CAST(ceil(coalesce(length(text), 0)
                                       / {_CHUNK_STRIDE}.0) AS BIGINT)))
                 t(chunk_idx)
    ), f AS (
        SELECT doc_id, source, h,
               COUNT(*) OVER (PARTITION BY h) AS n
        FROM ch
    )
    SELECT source,
           COUNT(*) AS n_chunks,
           SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS n_dup_chunks,
           ROUND(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
               AS dup_fraction
    FROM f
    GROUP BY source
"""


@register(
    "chunk_dup_rate",
    _CHUNK_DUP_SQL,
    doc="Boilerplate detector: chunk every document (same 200/150 windows "
        "as doc_chunks, source carried inline so no join back), count each "
        "chunk hash's global frequency with a window over the hash, and "
        "report per source what fraction of its chunks appear elsewhere — "
        "headers/footers/navigation chrome light up as dup_fraction spikes. "
        "Two shuffles total (hash window, then the |sources| aggregate); "
        "the chunk explosion never leaves the scan stage.",
)
def chunk_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n = "coalesce(length(text), 0)"
    idx = (
        f"explode(CASE WHEN {n} = 0 THEN CAST(array() AS ARRAY<BIGINT>) "
        f"ELSE sequence(CAST(0 AS BIGINT), "
        f"CAST(ceil({n} / {_CHUNK_STRIDE}.0) AS BIGINT) - 1) END)"
    )
    chunk = (
        f"substring(text, CAST(chunk_idx * {_CHUNK_STRIDE} + 1 AS INT), "
        f"{_CHUNK_LEN})"
    )
    ch = d.select(
        "doc_id", "source", F.expr(idx).alias("chunk_idx"), "text"
    ).select("doc_id", "source", F.expr(f"md5({chunk})").alias("h"))
    w = Window.partitionBy("h")
    dup = (F.count("*").over(w) > 1).cast("int")
    return (
        ch.withColumn("is_dup", dup)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("is_dup").alias("n_dup_chunks"),
            F.round(F.sum("is_dup") * 1.0 / F.count("*"), 6).alias(
                "dup_fraction"
            ),
        )
    )


_DEDUP_CHUNK_W = 8

_CHUNK_DEDUP_SQL = f"""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    chunks AS (
        SELECT doc_id, CAST(t.g AS BIGINT) AS chunk_idx,
               array_to_string(
                   w[(t.g * {_DEDUP_CHUNK_W} + 1):
                     (t.g * {_DEDUP_CHUNK_W} + {_DEDUP_CHUNK_W})], ' ')
                   AS chunk_text
        FROM words,
             UNNEST(range(CAST(ceil(len(w) / {_DEDUP_CHUNK_W}.0) AS BIGINT)))
                 AS t(g)
    ),
    marked AS (
        SELECT doc_id, chunk_idx, chunk_text,
               ROW_NUMBER() OVER (
                   PARTITION BY chunk_text
                   ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks
    )
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk_text END,
                               ' ' ORDER BY chunk_idx), '') AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped
    FROM marked GROUP BY doc_id
"""


@register(
    "corpus_chunk_dedup",
    _CHUNK_DEDUP_SQL,
    doc=f"Corpus-level exact substring dedup with document REASSEMBLY "
        f"(the C4/RefinedWeb transformation, not just the chunk_dup_rate "
        f"measurement): split every document into {_DEDUP_CHUNK_W}-word "
        f"chunks, keep only each chunk's FIRST global occurrence "
        f"(deterministic (doc_id, chunk_idx) order), and rebuild every "
        f"document from its surviving chunks in position order. Two "
        f"shuffles: one window over the chunk text (global first-"
        f"occurrence rank — at 100 TB this keys on the chunk value, so "
        f"boilerplate hot chunks are single-key-bounded, not all-pairs) "
        f"and one groupBy(doc_id) reassembly; the chunk explosion stays "
        f"inside the scan stage. Oracle replays the identical "
        f"rank-and-reassemble relationally.",
)
def corpus_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    k = _DEDUP_CHUNK_W
    words = F.split(F.col("text"), " ")
    n_chunks = F.expr(
        f"CASE WHEN size(split(text, ' ')) <= 0 THEN "
        f"CAST(array() AS ARRAY<BIGINT>) ELSE sequence(CAST(0 AS BIGINT), "
        f"CAST(ceil(size(split(text, ' ')) / {k}.0) AS BIGINT) - 1) END"
    )
    ch = d.select(
        "doc_id", F.explode(n_chunks).alias("chunk_idx"),
        words.alias("w"),
    ).select(
        "doc_id", "chunk_idx",
        F.array_join(
            F.slice(
                F.col("w"),
                (F.col("chunk_idx") * k + 1).cast("int"), k,
            ), " ",
        ).alias("chunk_text"),
    )
    w = Window.partitionBy("chunk_text").orderBy("doc_id", "chunk_idx")
    marked = ch.withColumn("rn", F.row_number().over(w))
    kept_struct = F.array_sort(
        F.collect_list(F.struct("chunk_idx", "chunk_text", "rn"))
    )
    return marked.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.filter(kept_struct, lambda x: x["rn"] == 1),
                lambda x: x["chunk_text"],
            ), " ",
        ).alias("clean_text"),
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("bigint")
        .alias("n_dropped"),
    )


_ENTROPY_SQL = """
    WITH ch AS (
        SELECT doc_id, u.ch
        FROM documents, UNNEST(string_split(text, '')) u(ch)
        WHERE len(u.ch) > 0
    ), cnt AS (
        SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch
    ), agg AS (
        SELECT doc_id, list(CAST(c AS DOUBLE) ORDER BY ch) AS cs,
               SUM(c) AS n
        FROM cnt GROUP BY doc_id
    )
    SELECT doc_id,
           n AS n_chars_counted,
           CAST(len(cs) AS BIGINT) AS n_distinct_chars,
           ROUND(CASE WHEN n <= 1 THEN 0.0
                      ELSE log2(CAST(n AS DOUBLE))
                           - list_sum(list_transform(cs, c -> c * log2(c)))
                             / CAST(n AS DOUBLE) END, 6) AS entropy_bits
    FROM agg
"""


@register(
    "text_entropy",
    _ENTROPY_SQL,
    doc="Character-distribution Shannon entropy per document — the "
        "degenerate-text detector (mashed keys, base64 blobs and "
        "repeated-char padding sit far from natural language's ~4 bits). "
        "Computed as log2(n) - (1/n)*sum(c*log2(c)) over per-char counts "
        "folded in sorted-char order (a FIXED fold order on both engines; "
        "the 6-dp round absorbs last-ulp libm log differences), n<=1 "
        "short-circuits to exactly 0.0 with no log evaluated. Two "
        "aggregation shuffles — (doc, char) then doc — with map-side "
        "partials; the char explosion never leaves the scan stage.",
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ch = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.length("ch") > 0)
    cnt = ch.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ch, c))), "
            "e -> CAST(e.c AS DOUBLE))"
        ).alias("cs"),
        F.sum("c").alias("n"),
    )
    h = F.expr(
        "round(CASE WHEN n <= 1 THEN 0.0D "
        "ELSE log2(CAST(n AS DOUBLE)) "
        "- aggregate(cs, 0.0D, (acc, c) -> acc + c * log2(c)) "
        "/ CAST(n AS DOUBLE) END, 6)"
    )
    return agg.select(
        "doc_id",
        F.col("n").alias("n_chars_counted"),
        F.size("cs").cast("bigint").alias("n_distinct_chars"),
        h.alias("entropy_bits"),
    )


_IVF_RECALL_SQL = f"""
    SELECT e.query_id,
           COUNT(*) AS n_exact,
           COUNT(v.neighbor_id) AS n_hit,
           ROUND(CAST(COUNT(v.neighbor_id) AS DOUBLE) / COUNT(*), 6) AS recall
    FROM ({_ANN_SQL}) e
    LEFT JOIN ({_IVF_TOPK_SQL}) v
      ON e.query_id = v.query_id AND e.neighbor_id = v.neighbor_id
    GROUP BY e.query_id
"""


@register(
    "ann_ivf_recall_eval",
    _IVF_RECALL_SQL,
    doc="Recall@5 of the IVF path (16 cells, nprobe=2) against the exact "
        "brute-force baseline, per query — the companion of "
        "ann_recall_eval for the partition-pruning index, quantifying "
        "what reading nprobe/n_cells of the corpus costs in quality. "
        "Same tiny (query, neighbor) join over two already-oracled "
        "result tables.",
)
def ann_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = ann_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        exact.join(ivf, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    totals = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return totals.join(hits, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        F.round(
            F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_exact"), 6
        ).alias("recall"),
    )


_DEDUP_REPORT_SQL = f"""
    WITH eh AS (
        SELECT doc_id, source, md5(lower(trim(text))) AS h FROM documents
    ),
    hc AS (SELECT h, COUNT(*) AS n FROM eh GROUP BY h),
    np AS (
        SELECT DISTINCT doc_id FROM (
            SELECT doc_a AS doc_id FROM ({_MINHASH_PAIRS_SQL}) p1
            UNION
            SELECT doc_b AS doc_id FROM ({_MINHASH_PAIRS_SQL}) p2
        )
    )
    SELECT eh.source,
           COUNT(*) AS n_docs,
           SUM(CASE WHEN hc.n > 1 THEN 1 ELSE 0 END) AS n_exact_dup_docs,
           SUM(CASE WHEN np.doc_id IS NOT NULL THEN 1 ELSE 0 END)
               AS n_near_dup_docs
    FROM eh
    JOIN hc USING (h)
    LEFT JOIN np ON eh.doc_id = np.doc_id
    GROUP BY eh.source
"""


@register(
    "corpus_dedup_report",
    _DEDUP_REPORT_SQL,
    doc="Per-source dedup dashboard: how many documents are byte-exact "
        "copies (normalized-md5 frequency window) and how many sit in at "
        "least one MinHash-LSH near-dup pair — the summary a curation "
        "review reads before choosing drop thresholds. Plan: exact side "
        "is one hash window over the corpus scan; the near-dup doc set "
        "comes from the (pair-sized, ≪ corpus) LSH output exploded to "
        "doc ids and semi-joined back; final aggregate is |sources| rows.",
)
def corpus_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    eh = d.select(
        "doc_id", "source", F.md5(F.lower(F.trim(F.col("text")))).alias("h")
    )
    w = Window.partitionBy("h")
    eh = eh.withColumn("n_copies", F.count("*").over(w))
    pairs = dedup_minhash_pairs(spark, sf_dir)
    near = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_near", F.lit(1))
    )
    return (
        eh.join(near, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("n_copies") > 1).cast("int")).alias(
                "n_exact_dup_docs"
            ),
            F.sum(F.coalesce("is_near", F.lit(0))).alias("n_near_dup_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 7: time-series analytics + corpus statistics
# ---------------------------------------------------------------------------

# Deterministic arg-min/arg-max tie-break key: fixed-width "(ts, event_id)"
# string so DuckDB's arg_min(DOUBLE, VARCHAR) and Spark's min_by compare the
# same total order (DuckDB's arg_min has no struct overload).
_EVENT_ORDER_KEY_SPARK = "format_string('%020d:%020d', ts_us, event_id)"
_EVENT_ORDER_KEY_DUCK = (
    "printf('%020d:%020d', epoch_us(CAST(ts AS TIMESTAMP)), event_id)"
)

_OHLC_SQL = f"""
    SELECT event_type,
           CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS BIGINT)
               AS hour_idx,
           arg_min(CAST(value AS DECIMAL(18,2)), {_EVENT_ORDER_KEY_DUCK})
               AS open,
           MAX(CAST(value AS DECIMAL(18,2))) AS high,
           MIN(CAST(value AS DECIMAL(18,2))) AS low,
           arg_max(CAST(value AS DECIMAL(18,2)), {_EVENT_ORDER_KEY_DUCK})
               AS close,
           SUM(CAST(value AS DECIMAL(18,2))) AS vol,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
"""


@register(
    "events_ohlc_hourly",
    _OHLC_SQL,
    doc="OHLC candlestick rollup per (event_type, hour): open/close via "
        "min_by/max_by on a fixed-width (ts, event_id) key (deterministic "
        "under ts collisions), high/low/volume as plain aggregates, values "
        "in DECIMAL(18,2) so sums are fold-order-exact. ONE shuffle with "
        "map-side partials; output is |types × hours|, thousands of times "
        "smaller than the stream — the classic pre-aggregated time-series "
        "dashboard shape.",
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    v = F.col("value").cast("decimal(18,2)")
    key = F.expr(_EVENT_ORDER_KEY_SPARK)
    return (
        e.select(
            "event_type",
            F.expr("ts_us div 3600000000").alias("hour_idx"),
            v.alias("v"),
            key.alias("k"),
        )
        .groupBy("event_type", "hour_idx")
        .agg(
            F.min_by("v", "k").alias("open"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.max_by("v", "k").alias("close"),
            F.sum("v").alias("vol"),
            F.count("*").alias("n_events"),
        )
    )


_RESAMPLE_SQL = f"""
    WITH e2 AS (
        SELECT user_id,
               CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS BIGINT)
                   AS hour_idx,
               CAST(value AS DECIMAL(18,2)) AS v,
               {_EVENT_ORDER_KEY_DUCK} AS k
        FROM events
    ),
    pm AS (
        SELECT user_id, hour_idx, arg_max(v, k) AS v
        FROM e2 GROUP BY 1, 2
    ),
    b AS (
        SELECT user_id, MIN(hour_idx) AS lo, MAX(hour_idx) AS hi
        FROM e2 GROUP BY 1
    ),
    g AS (
        SELECT user_id, UNNEST(range(lo, hi + 1)) AS hour_idx FROM b
    )
    SELECT g.user_id, g.hour_idx,
           last_value(pm.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hour_idx
           ) AS value_ff
    FROM g LEFT JOIN pm
      ON g.user_id = pm.user_id AND g.hour_idx = pm.hour_idx
"""


@register(
    "events_resample_hourly",
    _RESAMPLE_SQL,
    doc="Time-series resampling with gap fill: a dense per-user hourly grid "
        "from each user's first to last active hour, carrying the most "
        "recent observed value forward through silent hours (last-observation"
        "-carried-forward). Grid built distributed — sequence()+explode of "
        "each user's [lo, hi] hour range (one row per user in, span rows "
        "out; never a driver loop), per-hour last value via max_by on the "
        "deterministic (ts, event_id) key, forward fill as a running "
        "last(ignorenulls) window. All stages hash on user_id, so the agg, "
        "the grid join, and the fill window reuse one partitioning; grid "
        "size is Σ active spans, bounded and known before running.",
)
def events_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        "user_id",
        F.expr("ts_us div 3600000000").alias("hour_idx"),
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.expr(_EVENT_ORDER_KEY_SPARK).alias("k"),
    )
    pm = e.groupBy("user_id", "hour_idx").agg(F.max_by("v", "k").alias("v"))
    grid = (
        e.groupBy("user_id")
        .agg(F.min("hour_idx").alias("lo"), F.max("hour_idx").alias("hi"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(lo, hi)")).alias("hour_idx"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("hour_idx")
    return (
        grid.join(pm, ["user_id", "hour_idx"], "left")
        .select(
            "user_id",
            "hour_idx",
            F.last("v", ignorenulls=True).over(w).alias("value_ff"),
        )
    )


_BURSTS_SQL = """
    SELECT * FROM (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               COUNT(*) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               ) AS burst_n
        FROM events
    ) WHERE burst_n >= 3
"""


@register(
    "events_activity_bursts",
    _BURSTS_SQL,
    doc="Complex-event detection: events whose trailing one-hour window "
        "(per user) holds ≥ 3 events — the alerting primitive "
        "(MATCH_RECOGNIZE-lite) expressed as a RANGE frame over the "
        "microsecond event time, so no self-join and no per-event probe: "
        "one column-pruned scan, one shuffle on user_id, a linear sliding "
        "count per partition. Equal-timestamp peers fall in the same frame "
        "in both engines (RANGE peer semantics).",
)
def events_activity_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3600000000, 0)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            "ts_us",
            F.count("*").over(w).alias("burst_n"),
        )
        .filter(F.col("burst_n") >= 3)
    )


_ACTIVITY_SQL = """
    WITH per AS (
        SELECT user_id,
               COUNT(*) AS n_events,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS n_click,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS n_view,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS n_error,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS n_purchase,
               COUNT(DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)
                   AS n_active_days,
               SUM(CAST(value AS DECIMAL(18,2))) AS sum_value,
               MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS first_ts_us,
               MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_ts_us
        FROM events GROUP BY 1
    )
    SELECT user_id, n_events, n_click, n_view, n_error, n_purchase,
           n_active_days, sum_value,
           ROUND(CAST(sum_value AS DOUBLE) / n_events, 6) AS avg_value,
           first_ts_us, last_ts_us
    FROM per
"""


@register(
    "user_activity_features",
    _ACTIVITY_SQL,
    doc="Per-user ML feature vector: event counts (total + per type via "
        "conditional sums — a pivot without a pivot operator), distinct "
        "active days, exact decimal spend, mean value derived from the "
        "exact sum (so the double rounds identically regardless of fold "
        "order), first/last seen. ONE shuffle on user_id; COUNT DISTINCT "
        "day expands to the standard two-stage partial dedup. The feature-"
        "engineering shape feeding a training-set join at 100 TB.",
)
def user_activity_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)

    def n_of(t: str):
        return F.sum((F.col("event_type") == t).cast("int"))

    per = e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        n_of("click").alias("n_click"),
        n_of("view").alias("n_view"),
        n_of("error").alias("n_error"),
        n_of("purchase").alias("n_purchase"),
        F.countDistinct(F.expr("ts_us div 86400000000")).alias(
            "n_active_days"
        ),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        F.min("ts_us").alias("first_ts_us"),
        F.max("ts_us").alias("last_ts_us"),
    )
    return per.withColumn(
        "avg_value",
        F.round(
            F.col("sum_value").cast("double") / F.col("n_events"), 6
        ),
    ).select(
        "user_id", "n_events", "n_click", "n_view", "n_error", "n_purchase",
        "n_active_days", "sum_value", "avg_value", "first_ts_us",
        "last_ts_us",
    )


_LENGTH_HIST_SQL = """
    WITH h AS (
        SELECT lang, LENGTH(CAST(n_chars AS VARCHAR)) AS magnitude,
               COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
        FROM documents GROUP BY 1, 2
    )
    SELECT lang, magnitude, n_docs, total_chars,
           ROUND(CAST(n_docs AS DOUBLE)
                 / SUM(n_docs) OVER (PARTITION BY lang), 6) AS share
    FROM h
"""


@register(
    "corpus_length_histogram",
    _LENGTH_HIST_SQL,
    doc="Corpus length profile: per-language order-of-magnitude histogram "
        "of document sizes (bucket = decimal digit count of n_chars — "
        "exact integer string length, immune to the log2 boundary "
        "float-divergence a floor(log2(x)) bucket would risk across "
        "engines) with each bucket's share of its language. One tiny "
        "aggregate (|langs × ~6 buckets|) then a window over that "
        "aggregate, never over the corpus.",
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = (
        d.groupBy(
            "lang",
            F.length(F.col("n_chars").cast("string")).alias("magnitude"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    w = Window.partitionBy("lang")
    return h.select(
        "lang", "magnitude", "n_docs", "total_chars",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6
        ).alias("share"),
    )


_BIGRAMS_SQL = """
    WITH w AS (
        SELECT string_split(text, ' ') AS ws FROM documents
    ),
    b AS (
        SELECT ws[i] || ' ' || ws[i + 1] AS bigram
        FROM w, UNNEST(range(1, len(ws))) AS t(i)
    )
    SELECT bigram, COUNT(*) AS n
    FROM b GROUP BY 1
    ORDER BY n DESC, bigram
    LIMIT 20
"""


@register(
    "text_bigrams_top20",
    _BIGRAMS_SQL,
    doc="Corpus-wide top-20 word bigrams (n-gram language statistics — the "
        "input to contamination heuristics and boilerplate detection). "
        "Bigrams come from zip_with over two shifted slices of the split "
        "array — pure JVM array ops, no self-join, no UDF; then one "
        "count aggregate with map-side partials and a deterministic "
        "(count DESC, bigram) top-k. Shuffle volume is |distinct bigrams|, "
        "not |tokens|.",
)
def text_bigrams_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bigrams = d.select(
        F.explode(
            F.expr(
                "zip_with(slice(split(text, ' '), 1, "
                "size(split(text, ' ')) - 1), "
                "slice(split(text, ' '), 2, size(split(text, ' ')) - 1), "
                "(a, b) -> concat(a, ' ', b))"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Full-text relevance search (BM25) — the GraphDB Lucene-connector surface
# (S-class: full-text search over literals) re-expressed as pure DataFrame
# aggregation over an inverted-index shape.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "hash", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75

_BM25_SQL = f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS term
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    stats AS (
        SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks
        WHERE term IN {_BM25_TERMS} GROUP BY 1, 2
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    contrib AS (
        SELECT tf.doc_id,
               CAST(ROUND(
                   LN(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * (tf.tf * ({_BM25_K1} + 1.0))
                   / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                      + {_BM25_B} * dl.dl / stats.avgdl)),
                   6) AS DECIMAL(18,6)) AS c
        FROM tf
        JOIN df ON tf.term = df.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
    )
    SELECT doc_id, score, rk FROM (
        SELECT doc_id, SUM(c) AS score,
               ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, doc_id) AS rk
        FROM contrib GROUP BY 1
    ) WHERE rk <= 10
"""


@register(
    "text_bm25_search",
    _BM25_SQL,
    doc="BM25 full-text relevance search (k1=1.2, b=0.75) for a 3-term "
        "query — the GraphDB Lucene-connector capability as one "
        "aggregation pipeline: explode once, keep only postings matching "
        "query terms (map-side IN filter on a 3-element list — the "
        "inverted-index probe), per-doc tf + doc length, df per term, "
        "per-(doc,term) contribution rounded to 6dp and summed as exact "
        "DECIMAL so the fold order can never flip a rounded score, "
        "deterministic (score DESC, doc_id) top-10. Corpus scalars "
        "(N, avgdl) broadcast; candidate set is bounded by postings of "
        "the query terms, not the corpus.",
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    contrib = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (k1 + F.lit(1.0)))
                / (
                    F.col("tf")
                    + k1
                    * (
                        F.lit(1.0)
                        - b
                        + b * F.col("dl") / F.col("avgdl")
                    )
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("c"),
        )
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("c").alias("score"))
        .select("doc_id", "score", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 10)
    )


# ---------------------------------------------------------------------------
# Incremental dedup: a new ingest batch probed against the historical corpus
# (continuous-ingestion complement of dedup_minhash_pairs — at 100 TB the
# historical side's band index is precomputed and stored; only the new
# batch's signatures are built per run)
# ---------------------------------------------------------------------------

_INCR_DEDUP_SQL = f"""
    WITH {_shingles_cte(5)},
    sig AS (
        SELECT doc_id,
               {_minhash_mins_duck}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
{_band_selects_duck}
    )
    SELECT DISTINCT n.doc_id AS new_doc, h.doc_id AS hist_doc
    FROM bands n JOIN bands h
      ON n.band_idx = h.band_idx AND n.band_val = h.band_val
    WHERE n.doc_id % 2 = 1 AND h.doc_id % 2 = 0
"""


@register(
    "dedup_incremental",
    _INCR_DEDUP_SQL,
    doc="Incremental near-dup detection for continuous ingestion: the new "
        "batch (odd doc_ids stand in for today's ingest) probes the "
        "historical corpus (even doc_ids) through the shared MinHash-LSH "
        "band index. The new batch's band rows BROADCAST into the "
        "historical side, so the big side streams through a broadcast "
        "hash join with no shuffle — the probe cost is O(|hist bands|) "
        "scan + O(|new| × bands) memory, never an all-pairs or sort-merge "
        "of the corpus. In production the hist bands are a stored index; "
        "cross-batch pairs then feed the same cluster/keep-best stages as "
        "the batch pipeline.",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = dedup_minhash_sig(spark, sf_dir)
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                ":",
                F.col(f"mh{2 * b}").cast("string"),
                F.col(f"mh{2 * b + 1}").cast("string"),
            ).alias("band_val"),
        )
        for b in range(_N_BANDS)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select(
        "doc_id",
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_val").alias("band_val"),
    )
    hist = bands.filter(F.col("doc_id") % 2 == 0)
    new = bands.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("new_doc"), "band_idx", "band_val"
    )
    return (
        hist.join(F.broadcast(new), ["band_idx", "band_val"])
        .select("new_doc", F.col("doc_id").alias("hist_doc"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Batch 8: graph analytics over the near-dup pair graph + event cadence +
# embedding normalization stats
# ---------------------------------------------------------------------------

_TRIANGLES_SQL = f"""
    WITH pairs AS ({_MINHASH_PAIRS_SQL}),
    tri AS (
        SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
        FROM pairs e1
        JOIN pairs e2 ON e2.doc_a = e1.doc_b
        JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    ),
    v AS (
        SELECT a AS doc_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT doc_id, COUNT(*) AS n_triangles FROM v GROUP BY doc_id
"""


@register(
    "graph_triangles",
    _TRIANGLES_SQL,
    doc="Per-document triangle count over the MinHash-LSH near-dup pair "
        "graph — the cluster-cohesion signal: documents whose near-dup "
        "neighbourhood closes into triangles sit in genuine duplicate "
        "cliques; bridge documents (chains that merge unrelated clusters "
        "transitively) participate in none. Degree-oriented enumeration "
        "(graph/closure.py:triangle_vertex_counts): edges directed "
        "low→high (degree, id), wedges generated only at each triangle's "
        "apex, closed by one equi-join against the canonical edge set — "
        "out-degrees bounded by O(sqrt(E)) so hub vertices can't explode "
        "the wedge intermediate at 100 TB. Oracle counts the same "
        "triangles with a 3-way self-join (pairs are already doc_a < "
        "doc_b oriented, so each triangle appears exactly once).",
    cache_plan=False,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dublin_smart_city_graphdb_spark.graph.closure import (
        triangle_vertex_counts,
    )

    pairs = dedup_minhash_pairs(spark, sf_dir)
    return triangle_vertex_counts(pairs, src="doc_a", dst="doc_b").select(
        F.col("id").alias("doc_id"), "n_triangles"
    )


_INTERARRIVAL_SQL = """
    WITH g AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP))
                   - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                         PARTITION BY user_id
                         ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                     ) AS gap_us
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_gaps,
           MIN(gap_us) AS min_gap_us,
           MAX(gap_us) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id
"""


@register(
    "events_interarrival",
    _INTERARRIVAL_SQL,
    doc="Per-user event cadence: inter-arrival gaps via lag() over "
        "(ts, event_id) — the engagement-rhythm feature (bots have "
        "near-constant gaps, humans are bursty). ONE shuffle total: the "
        "lag window partitions by user_id and the following groupBy "
        "(user_id) reuses the exchange — Catalyst sees the hash "
        "distribution is already satisfied. Every output is an exact "
        "integer (sum_gap_us replaces a ROUND(double,6) mean, whose "
        "HALF_UP-vs-binary rounding can differ across engines at "
        "representation boundaries — ADVICE r3); consumers derive "
        "mean = sum_gap_us / n_gaps. event_id tie-breaks equal "
        "timestamps so the lag is deterministic under any partitioning.",
)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    return (
        e.select("user_id", "event_id", "ts_us")
        .withColumn("gap_us", gap)
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            F.sum("gap_us").cast("bigint").alias("sum_gap_us"),
        )
    )


_DIM_STATS_SQL = """
    SELECT CAST(i AS INTEGER) AS dim,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                         AS BIGINT)) AS BIGINT) AS sum_e6,
           MIN(CAST(embedding[i] AS DOUBLE)) AS min_val,
           MAX(CAST(embedding[i] AS DOUBLE)) AS max_val
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) t(i)
    GROUP BY i
"""


@register(
    "embed_dim_stats",
    _DIM_STATS_SQL,
    doc="Per-dimension corpus statistics (exact scaled sum / min / max / "
        "count) \u2014 the normalization constants an embedding pipeline fits "
        "before whitening, clipping or quantizing; mean = sum_e6/1e6/n. "
        "posexplode keeps the explode inside the scan task; the single "
        "shuffle carries |dims| keys with map-side partial aggregation, so "
        "the reduce side is d rows no matter the corpus size. Each element "
        "is quantized to integer micro-units BEFORE summing \u2014 "
        "round-to-integer of an identical IEEE double is deterministic on "
        "both engines (ties round away from zero on each, and k+0.5 is "
        "exactly representable below 2^51), so the integer sum is exact "
        "under any partitioning \u2014 unlike float\u2192decimal casts or "
        "ROUND(double, d), which differ between engines at representation "
        "boundaries. min/max of float32 promoted to double are exact.",
)
def embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    dims = e.select(F.posexplode("embedding").alias("pos", "val"))
    v6 = F.round(F.col("val").cast("double") * F.lit(1_000_000.0)).cast(
        "bigint"
    )
    return (
        dims.select(
            (F.col("pos") + 1).cast("int").alias("dim"),
            v6.alias("v6"),
            "val",
        )
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.sum("v6").cast("bigint").alias("sum_e6"),
            F.min(F.col("val").cast("double")).alias("min_val"),
            F.max(F.col("val").cast("double")).alias("max_val"),
        )
    )


@register(
    "corpus_split_assign",
    """
    WITH h AS (
        SELECT doc_id, lang,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) AS hx
        FROM documents
    ),
    a AS (
        SELECT doc_id, lang,
               CASE WHEN hx < 'ccd' THEN 'train'
                    WHEN hx < 'e66' THEN 'val'
                    ELSE 'test' END AS split
        FROM h
    )
    SELECT split, COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(doc_id) AS min_doc
    FROM a GROUP BY split ORDER BY split
    """,
    doc="Deterministic train/val/test assignment (~80/10/10): bucket = "
        "first 3 hex chars of md5(doc_id) compared lexicographically "
        "(lowercase hex compare == numeric compare, identical on both "
        "engines). Membership depends ONLY on doc_id — rerun-stable, "
        "join-free, leakage-proof across pipeline versions; pure map + "
        "one aggregation shuffle, so it holds at any corpus size. The "
        "summary returns per-split counts; the per-doc assignment is the "
        "CTE shape a pipeline materializes.",
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    hx = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 3
    )
    split = (
        F.when(hx < "ccd", F.lit("train"))
        .when(hx < "e66", F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("doc_id", "lang", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# Text analysis: PII redaction (round 6 — the scrubbing pass every training
# corpus runs before release)
# ---------------------------------------------------------------------------

# The synthetic corpus is PII-free, so each doc gets a DETERMINISTIC
# doc_id-derived contact line appended before scrubbing — both engines build
# the identical input, so the oracle proves the redaction regexes, not the
# fixture. Patterns stay in the Java∩RE2 common dialect (no lookarounds).
_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE = "\\b555-[0-9]{4}\\b"
_PII_IP = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

_PII_SQL = f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail' || CAST(doc_id % 7 AS VARCHAR)
                    || '.example.com or 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.0.' || CAST(doc_id % 100 AS VARCHAR) AS t
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_emails,
           len(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phones,
           len(regexp_extract_all(t, '{_PII_IP}')) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IP}', '<IP>', 'g')) AS redacted_md5
    FROM aug
"""


@register(
    "text_pii_redact",
    _PII_SQL,
    doc="PII scrubbing: count and redact emails, phone numbers, and IPv4 "
        "addresses to typed placeholders (<EMAIL>/<PHONE>/<IP>). Pure "
        "JVM regexp_replace — a map-only pass with no shuffle, so it "
        "scales with scan bandwidth at any corpus size; the md5 of the "
        "redacted text pins byte-exact output across engines.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."), (F.col("doc_id") % 100).cast("string"),
    )
    aug = d.select("doc_id", t.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE, "<PHONE>",
        ),
        _PII_IP, "<IP>",
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_PII_EMAIL), 0)
               ).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_PII_PHONE), 0)
               ).cast("bigint").alias("n_phones"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_PII_IP), 0)
               ).cast("bigint").alias("n_ips"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# Corpus decontamination: benchmark n-gram overlap (round 6 — the eval-set
# leakage check run before any corpus ships)
# ---------------------------------------------------------------------------

_DECONTAM_SQL = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 4
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 3),
                      i -> array_to_string(t[i:i+3], ' '))) AS g
        FROM toks
    ),
    bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
    ),
    hits AS (
        SELECT DISTINCT c.doc_id, c.g
        FROM grams c JOIN bench USING (g)
        WHERE c.doc_id % 97 <> 0
    )
    SELECT doc_id, COUNT(*) AS n_shared_grams
    FROM hits GROUP BY doc_id
"""


@register(
    "corpus_decontaminate",
    _DECONTAM_SQL,
    doc="Decontamination: flag training documents sharing any word-level "
        "4-gram with the benchmark set (docs with doc_id % 97 == 0 stand "
        "in for the eval suite). Spark side: one transform/explode per "
        "doc, distinct benchmark grams broadcast-joined against corpus "
        "grams, one groupBy — the gram join shuffles on the gram hash so "
        "it scales like any dedup blocking pass; no all-pairs product.",
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    ).filter(F.size("t") >= 4)
    idx = F.sequence(F.lit(1), F.size("t") - 3)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, F.lit(4))),
            )
        ).alias("g"),
    )
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "g", "left_semi")
        .select("doc_id", "g")
        .distinct()
    )
    return hits.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_shared_grams")
    )


# ---------------------------------------------------------------------------
# Dedup: exact duplicated-span detection (the ExactSubstr granularity — spans
# shared across documents that doc- and chunk-level dedup both miss)
# ---------------------------------------------------------------------------

_SPAN_W = 8

_SPAN_EXACT_SQL = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    sp AS (
        SELECT doc_id,
               {_hash60_duck(f"list_aggregate(ts[i:i+{_SPAN_W - 1}], "
                             "'string_agg', ' ')")} AS h
        FROM t, UNNEST(range(1, len(ts) - {_SPAN_W - 2})) AS r(i)
        WHERE len(ts) >= {_SPAN_W}
    ),
    c AS (SELECT h, COUNT(*) AS n FROM sp GROUP BY h)
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans,
           ROUND(CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS dup_span_frac
    FROM sp JOIN c USING (h)
    GROUP BY doc_id
"""


@register(
    "dedup_span_exact",
    _SPAN_EXACT_SQL,
    doc="Exact duplicated-span detection (the 'Deduplicating Training Data "
        "Makes Language Models Better' ExactSubstr granularity): every "
        "sliding 8-token span is hashed, corpus-wide occurrence counts "
        "mark spans appearing more than once, and each document reports "
        "its duplicated-span fraction — the signal that catches shared "
        "boilerplate/quotations INSIDE otherwise-distinct documents, "
        "which doc-level (dedup_exact) and chunk-level (corpus_chunk_"
        "dedup) both miss. Spans form MAP-SIDE from the token array "
        "(slice over an index sequence — the decontaminate idiom) and "
        "ride as 60-bit hashes, so the shuffle key is fixed-width "
        "regardless of span text; the plan is the LM-family shape: one "
        "span-count groupBy, the same-key join back (exchange reuse), "
        "one per-doc aggregation. No self-join, no span-text shuffle. "
        "Docs shorter than the window have no spans and drop.",
)
def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_parallel(spark, sf_dir)
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("ts")).filter(
        F.size("ts") >= _SPAN_W
    )
    idx = F.sequence(F.lit(1), F.size("ts") - (_SPAN_W - 1))
    spans = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("ts"), i, F.lit(_SPAN_W))
                ),
            )
        ).alias("s"),
    )
    hashed = spans.select("doc_id", F.expr(_hash60_spark("s")).alias("h"))
    cnt = hashed.groupBy("h").agg(F.count("*").alias("n"))
    dup = F.when(F.col("n") > 1, 1).otherwise(0)
    return (
        hashed.join(cnt, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(dup).alias("n_dup_spans"),
            F.round(
                F.sum(dup).cast("double") / F.count("*"), 6
            ).alias("dup_span_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Embeddings: per-label centroid drift (corpus-distribution monitoring — the
# report that says "shard 3's embeddings moved away from the corpus center"
# before anyone trains on a skewed mixture)
# ---------------------------------------------------------------------------

_LABEL_DRIFT_SQL = """
    WITH e AS (
        SELECT label, i, CAST(embedding[i] AS DOUBLE) AS v
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
    ),
    lm AS (SELECT label, i, AVG(v) AS ml FROM e GROUP BY label, i),
    gm AS (SELECT i, AVG(v) AS mg FROM e GROUP BY i),
    agg AS (
        SELECT label,
               SUM(ml * mg) AS dot,
               SUM(ml * ml) AS nl,
               SUM(mg * mg) AS ng
        FROM lm JOIN gm USING (i)
        GROUP BY label
    ),
    cnt AS (SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY label)
    SELECT label, n_vecs,
           ROUND(dot / (sqrt(nl) * sqrt(ng)), 6) AS centroid_cosine
    FROM agg JOIN cnt USING (label)
"""


@register(
    "embed_label_drift",
    _LABEL_DRIFT_SQL,
    doc="Per-label centroid drift: cosine between each label's embedding "
        "centroid and the global corpus centroid — the distribution-shift "
        "monitor run before weighting a training mixture (a label whose "
        "centroid_cosine sinks is semantically drifting from the corpus). "
        "Plan: one posexplode pass feeds BOTH mean aggregations "
        "(per-label-per-dim and per-dim) with map-side partials; the "
        "per-dim global means broadcast into the per-label join (|dims| "
        "rows), and the final per-label reduction is over |labels|·|dims| "
        "rows — corpus-scale work is exactly one explode + two "
        "aggregations, nothing quadratic. Cosine assembled from the "
        "joined means in double precision, round(6) on both engines.",
)
def embed_label_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", F.posexplode("embedding").alias("i0", "v0")
    ).select(
        "label",
        (F.col("i0") + 1).alias("i"),
        F.col("v0").cast("double").alias("v"),
    )
    lm = e.groupBy("label", "i").agg(F.avg("v").alias("ml"))
    gm = e.groupBy("i").agg(F.avg("v").alias("mg"))
    agg = (
        lm.join(F.broadcast(gm), "i")
        .groupBy("label")
        .agg(
            F.sum(F.col("ml") * F.col("mg")).alias("dot"),
            F.sum(F.col("ml") * F.col("ml")).alias("nl"),
            F.sum(F.col("mg") * F.col("mg")).alias("ng"),
        )
    )
    cnt = emb.groupBy("label").agg(F.count("*").alias("n_vecs"))
    return agg.join(cnt, "label").select(
        "label",
        "n_vecs",
        F.round(
            F.col("dot") / (F.sqrt(F.col("nl")) * F.sqrt(F.col("ng"))), 6
        ).alias("centroid_cosine"),
    )
