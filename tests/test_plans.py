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
