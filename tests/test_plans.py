"""Physical-plan regression tests: the scale properties we designed for —
predicate-partition pruning, per-column parquet pushdown, star-join
compaction, broadcast dimension joins — asserted on `.explain` output so a
refactor can't silently regress them (the 100 TB plan-shape contract)."""

from __future__ import annotations

import pytest

from dublin_smart_city_graphdb_spark import fixtures
from dublin_smart_city_graphdb_spark.engine import Engine

EX = fixtures.EX
SCHEMA = fixtures.SCHEMA
PROLOG = f"PREFIX ex: <{EX}>\nPREFIX schema: <{SCHEMA}>\n"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def store_repo(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    eng = Engine(spark, warehouse=wh)
    repo = eng.create_repository("plan_repo", ruleset="none")
    repo.load_turtle(fixtures.full_fixture_ttl(300))
    return repo


def test_bound_predicate_scans_are_partition_pruned(store_repo):
    df = store_repo.sparql(
        PROLOG + "SELECT ?n WHERE { ?f schema:name ?n }"
    )
    plan = plan_of(df)
    assert "PartitionFilters: [isnotnull(p" in plan
    assert "schema.org/name" in plan


def test_star_filters_apply_before_the_shuffle(store_repo):
    """Constant-object match and FILTER range conjuncts must reduce rows
    BELOW the star's exchange (per-predicate disjunctive filters on the
    scan side), not only after the aggregate."""
    df = store_repo.sparql(
        PROLOG + """SELECT ?f WHERE {
            ?f ex:hasFacilityType ex:Park ; ex:latitude ?lat .
            FILTER(?lat > 53.3)
        }"""
    )
    plan = plan_of(df)
    pre = plan.split("Exchange hashpartitioning")[-1]  # below the shuffle
    assert "facilities#Park" in pre          # const-object row filter
    assert "o_num" in pre and "53.3" in pre  # range row filter


def test_single_pattern_range_filter_pushes_to_parquet(store_repo):
    df = store_repo.sparql(
        PROLOG + """SELECT ?f ?lat WHERE {
            ?f ex:latitude ?lat . FILTER(?lat > 53.3)
        }"""
    )
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(o_num), GreaterThan(o_num,53.3" in plan


def test_star_bgp_is_single_exchange_no_joins(store_repo):
    df = store_repo.sparql(
        PROLOG + """SELECT ?n ?lat ?lon ?t WHERE {
            ?f a ex:Facility ; schema:name ?n ; ex:latitude ?lat ;
               ex:longitude ?lon ; ex:hasFacilityType ?t .
        }"""
    )
    plan = plan_of(df)
    assert plan.count("Join") == 0
    # one shuffle for the star groupBy (AQE may add AQEShuffleRead readers)
    assert plan.count("Exchange hashpartitioning") == 1


def test_non_star_join_broadcasts_small_side(store_repo):
    # two different subject vars → genuine join; the engine must broadcast
    df = store_repo.sparql(
        PROLOG + """SELECT ?fn ?an WHERE {
            ?f ex:inCommitteeArea ?a . ?f schema:name ?fn . ?a schema:name ?an .
        }"""
    )
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan


def test_bucketed_store_star_has_zero_exchanges(spark, tmp_path_factory):
    """partitionBy(p) × bucketBy(s): predicate pruning picks the files,
    subject bucketing satisfies the star groupBy's distribution — a
    4-pattern BGP plans with NO shuffle and NO join at all."""
    wh = str(tmp_path_factory.mktemp("wh_bucketed"))
    eng = Engine(spark, warehouse=wh)
    repo = eng.create_repository("bucketed_plan", ruleset="none", bucket_subjects=8)
    repo.load_turtle(fixtures.full_fixture_ttl(200))
    df = repo.sparql(
        PROLOG + """SELECT ?n ?lat ?t WHERE {
            ?f a ex:Facility ; schema:name ?n ; ex:latitude ?lat ;
               ex:hasFacilityType ?t .
        }"""
    )
    plan = plan_of(df)
    assert "Bucketed: true" in plan
    assert plan.count("Exchange") == 0
    assert plan.count("Join") == 0
    assert df.count() == 200


def test_projection_prunes_read_schema(store_repo):
    # projecting only the subject with a numeric filter: the scan must read
    # just (s, o_num) + the partition column, not the full object struct
    df = store_repo.sparql(
        PROLOG + "SELECT ?f WHERE { ?f ex:latitude ?lat . FILTER(?lat > 53.3) }"
    )
    plan = plan_of(df)
    scan = next(l for l in plan.split("\n") if "FileScan" in l)
    assert "o_bool" not in scan and "o_ts" not in scan and "o_lang" not in scan


def test_cartesian_chain_partition_product_is_capped(spark, store_repo):
    """A chain of fully-unbound patterns compiles to chained cartesians
    whose partition count would otherwise MULTIPLY (store-partitions ^
    patterns — 10 patterns over an 8-partition store once built a ~10^8-
    entry CartesianRDD partition array that pinned gigabytes of driver
    heap after the job was cancelled). The compiler caps each side with a
    narrow coalesce, so the product stays ≤ cap² however deep the chain
    and however many partitions the store scan has."""
    from dublin_smart_city_graphdb_spark.sparql.compiler import QueryCompiler
    from dublin_smart_city_graphdb_spark.sparql.parser import parse_query

    quads = store_repo.quads.repartition(64)
    df = QueryCompiler(spark, quads).compile(parse_query(
        "SELECT ?a ?c ?e WHERE { ?a ?p1 ?b . ?c ?p2 ?d . ?e ?p3 ?f }"
    ))
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert df.rdd.getNumPartitions() <= cap * cap


def test_cartesian_with_proven_small_side_broadcasts(spark, store_repo):
    """A cartesian-style join whose side is PROVABLY small (load-time
    predicate stats bound a predicate-constant scan) compiles to a
    BroadcastNestedLoopJoin instead of a coalesce-capped
    CartesianProduct: the output keeps the probe side's partitioning,
    so a constant-bound pattern pair costs |probe| tasks, not cap²
    tiny tasks each paying the full task-binary/codegen overhead (the
    dominant cost of the plan-analysis-heavy geo kernels)."""
    from dublin_smart_city_graphdb_spark.sparql.compiler import QueryCompiler
    from dublin_smart_city_graphdb_spark.sparql.parser import parse_query

    df = QueryCompiler(
        spark, store_repo.quads,
        predicate_stats=store_repo.predicate_stats(),
    ).compile(parse_query(PROLOG + """
        SELECT ?n ?t WHERE {
          ?f schema:name ?n . ?g schema:additionalType ?t .
        }
    """))
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_cartesian_without_stats_still_coalesce_capped(spark, store_repo):
    """Without stats (or past the broadcast row bound) the cartesian
    keeps the r4 fallback: both sides coalesce-capped so the partition
    product stays bounded — the broadcast fast path must never replace
    the safety cap for sides it cannot prove small."""
    from dublin_smart_city_graphdb_spark.sparql.compiler import QueryCompiler
    from dublin_smart_city_graphdb_spark.sparql.parser import parse_query

    df = QueryCompiler(spark, store_repo.quads.repartition(64)).compile(
        parse_query(PROLOG + """
            SELECT ?n ?t WHERE {
              ?f schema:name ?n . ?g schema:additionalType ?t .
            }
        """)
    )
    # (Catalyst may still pick a nested-loop broadcast from its own size
    # estimate — the contract here is only the bounded partition product)
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert df.rdd.getNumPartitions() <= cap * cap


def test_plans_md_covers_audited_roster():
    """VERDICT r10 #1: the AUDITED roster and the committed PLANS.md
    diverged twice (r8, r10 — a name added to the roster without
    regenerating the report). Pin them together so the drift is
    mechanically impossible to commit."""
    import pathlib
    import sys

    root = pathlib.Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(root))
    from tools.audit_plans import plans_md_drift

    missing = plans_md_drift(root / "PLANS.md")
    assert not missing, (
        f"PLANS.md lacks AUDITED sections for {missing}; "
        "run tools/audit_plans.py and commit the regenerated report"
    )


# ---------------------------------------------------------------------------
# Stats-refresh soundness for the cartesian-broadcast planner (VERDICT r10
# #3). The broadcast fast path trusts `Compiled.est_rows` as an UPPER bound;
# that is sound only if predicate_stats() always reflects the post-mutation
# store — a missing or stale entry reads as "0 rows" at compile time
# (`predicate_stats.get(p, 0)`), which _small() would happily broadcast.
# These tests enumerate every mutation path and pin that the stats are
# STRICTLY RECOMPUTED from the post-state (exact equality with a fresh
# groupBy over repo.quads — never decremented, never carried over).
# ---------------------------------------------------------------------------


def _true_pred_counts(repo) -> dict:
    import pyspark.sql.functions as F

    return {
        r["p"]: r["n"]
        for r in repo.quads.groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


_EXTRA_TTL = '<http://example.org/x1> <http://example.org/extra> "v" .'


def _m_append_turtle(repo):
    repo.load_turtle_text(_EXTRA_TTL)


def _m_insert_data(repo):
    repo.update(
        'INSERT DATA { <http://example.org/x2> '
        '<http://example.org/extra> "w" }'
    )


def _m_delete_where(repo):
    repo.update(PROLOG + "DELETE WHERE { ?s schema:name ?o }")


def _m_delete_insert(repo):
    repo.update(PROLOG + """
        DELETE { ?s schema:additionalType ?t }
        INSERT { ?s <http://example.org/retyped> ?t }
        WHERE { ?s schema:additionalType ?t }
    """)


def _m_clear_default(repo):
    repo.update("CLEAR DEFAULT")


def _m_add_graph(repo):
    repo.update("ADD DEFAULT TO <http://example.org/g2>")


def _m_move_graph(repo):
    repo.update("MOVE DEFAULT TO <http://example.org/g3>")


def _m_txn_add(repo):
    t = repo.begin()
    t.add_turtle(_EXTRA_TTL)
    t.commit()


def _m_txn_update_delete(repo):
    t = repo.begin()
    t.update(PROLOG + "DELETE WHERE { ?s schema:additionalType ?o }")
    t.commit()


_MUTATIONS = [
    ("add_quads_append", _m_append_turtle),
    ("update_insert_data", _m_insert_data),
    ("update_delete_where", _m_delete_where),
    ("update_delete_insert", _m_delete_insert),
    ("update_clear_default", _m_clear_default),
    ("update_add_graph", _m_add_graph),
    ("update_move_graph", _m_move_graph),
    ("txn_commit_add", _m_txn_add),
    ("txn_commit_update_delete", _m_txn_update_delete),
]


@pytest.mark.parametrize("label,mutate", _MUTATIONS, ids=[m[0] for m in _MUTATIONS])
def test_predicate_stats_recomputed_after_mutation(
    spark, tmp_path_factory, label, mutate
):
    """After EVERY mutation path, predicate_stats() equals a fresh count
    over the post-state exactly — an under-count would let a stale bound
    reach _small() and broadcast a corpus-scale side."""
    wh = str(tmp_path_factory.mktemp(f"wh_stats_{label}"))
    eng = Engine(spark, warehouse=wh)
    repo = eng.create_repository(f"stats_{label}", ruleset="none")
    repo.load_turtle(fixtures.full_fixture_ttl(40))
    # warm the cache so the test exercises INVALIDATION, not first compute
    before = repo.predicate_stats()
    assert before == _true_pred_counts(repo)
    mutate(repo)
    assert repo.predicate_stats() == _true_pred_counts(repo), label


@pytest.mark.parametrize(
    "label,mutate",
    [
        ("delta_seeded_append", _m_append_turtle),
        ("dred_delete", _m_delete_where),
        ("rematerialize", lambda r: r.materialize_inference()),
    ],
    ids=["delta_seeded_append", "dred_delete", "rematerialize"],
)
def test_predicate_stats_recomputed_under_inference(
    spark, tmp_path_factory, label, mutate
):
    """Same invariant on a ruleset repo: the Δ-seeded incremental append,
    the DRed retraction path, and a full re-materialization all land with
    stats matching the post-state INCLUDING inferred statements (the
    compiler plans over the full store when include_inferred=True)."""
    wh = str(tmp_path_factory.mktemp(f"wh_inf_{label}"))
    eng = Engine(spark, warehouse=wh)
    repo = eng.create_repository(f"inf_{label}", ruleset="rdfsplus")
    repo.load_turtle(fixtures.full_fixture_ttl(40))
    before = repo.predicate_stats()
    assert before == _true_pred_counts(repo)
    mutate(repo)
    assert repo.predicate_stats() == _true_pred_counts(repo), label


def test_predicate_stats_after_dump_restore(spark, tmp_path_factory):
    """A restored repository's stats come from the restored store, not a
    carried-over cache."""
    wh = str(tmp_path_factory.mktemp("wh_dump"))
    dump = str(tmp_path_factory.mktemp("dump_dir"))
    eng = Engine(spark, warehouse=wh)
    repo = eng.create_repository("dump_src", ruleset="none")
    repo.load_turtle(fixtures.full_fixture_ttl(40))
    eng.dump_repository("dump_src", dump)
    eng2 = Engine(spark, warehouse=str(tmp_path_factory.mktemp("wh_dump2")))
    restored = eng2.restore_repository("dump_restored", dump)
    assert restored.predicate_stats() == _true_pred_counts(restored)


def test_bulk_append_pushes_predicate_past_broadcast_bound(
    spark, tmp_path_factory
):
    """Adversarial staleness scenario end-to-end: a predicate starts with
    1 row (provably small → the no-shared-variable join broadcasts it);
    a bulk append then pushes it past the 100k broadcast bound. The
    recompile must see the REFRESHED bound — est_rows over 100k cannot
    reach _small() — and the plan keeps the capped partition product, so
    the engine never broadcasts 101k term-struct rows on a stale stat."""
    import pyspark.sql.functions as F

    wh = str(tmp_path_factory.mktemp("wh_bulk"))
    eng = Engine(spark, warehouse=wh)
    repo = eng.create_repository("bulk_repo", ruleset="none")
    repo.load_turtle(fixtures.full_fixture_ttl(40))
    repo.load_turtle_text(
        '<http://example.org/b1> <http://example.org/bulk> "x" .'
    )
    q = PROLOG + (
        "SELECT ?n ?t WHERE { ?f schema:name ?n . "
        "?g <http://example.org/bulk> ?t }"
    )
    assert "BroadcastNestedLoopJoin" in plan_of(repo.sparql(q))

    bulk = spark.range(101_000).select(
        F.lit(None).cast("string").alias("g"),
        F.concat(F.lit("http://example.org/s"), F.col("id")).alias("s"),
        F.lit("http://example.org/bulk").alias("p"),
        F.lit(2).cast("byte").alias("o_kind"),
        F.col("id").cast("string").alias("o_lex"),
        F.lit("http://www.w3.org/2001/XMLSchema#string").alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(None).cast("decimal(38,10)").alias("o_num"),
        F.lit(None).cast("timestamp").alias("o_ts"),
        F.lit(None).cast("boolean").alias("o_bool"),
    )
    repo.add_quads(bulk)
    assert repo.predicate_stats()["http://example.org/bulk"] == 101_001
    df = repo.sparql(q)
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert df.rdd.getNumPartitions() <= cap * cap
