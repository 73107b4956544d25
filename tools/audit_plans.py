"""Physical-plan audit: dump `.explain("formatted")` for the headline
queries plus a per-plan summary (shuffle count, broadcasts, pushed filters,
whole-stage-codegen coverage) into PLANS.md.

Usage: python tools/audit_plans.py [sf_dir]
       python tools/audit_plans.py --check   # no Spark: fail if PLANS.md
                                             # lacks a section for any
                                             # AUDITED name (roster drift)

The point is reviewability: tests/test_plans.py and
tests/test_pipeline_plans.py ASSERT the load-bearing shapes; this report
shows the full plans those assertions pin down, so a reviewer can see the
scan→exchange→agg structure without running Spark.

The ``--check`` mode exists because the AUDITED roster and the committed
PLANS.md diverged twice (r8, r10: a name was added here without
regenerating the report). ``tools/close_round.py`` runs it, and
``tests/test_plans.py::test_plans_md_covers_audited_roster`` pins it in
the suite, so the drift can no longer be committed silently.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

AUDITED = [
    "q1_pricing_summary",
    "bgp_join_chain",
    "anti_join_no_orders",
    "window_rank_orders",
    "dedup_ngram_jaccard",
    "dedup_minhash_pairs",
    "ann_lsh_topk",
    "events_asof_join",
    "events_asof_join_bucketed",
    "events_sessionize",
    "events_sessionize_bucketed",
    "shard_by_token_budget",
    "q3_shipping_priority",
    "text_top_terms",
    "text_tfidf_top_terms",
    "events_anomaly_zscore",
    "sparql_bgp_region_rollup",
    "sparql_filter_topk",
    "q6_forecast_revenue",
    "text_repetition",
    "text_unigram_logprob",
    "corpus_filter_rules",
    "embed_quantize_int8",
    "source_overlap_matrix",
    "doc_chunks",
    "chunk_dup_rate",
    "sample_per_source_quota",
    "events_funnel",
    "events_retention",
    "embed_label_outliers",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume",
    "sparql_similarity",
    "sparql_fts_bm25",
    "sparql_shacl_report",
    "sparql_geo_polygon",
    "sparql_geo_sf_touches",
    "graph_hits",
    "graph_kcore",
    "graph_pagerank_personalized",
    "sparql_shacl_path_composite",
    "sparql_geo_eh_rcc8",
    "sparql_path_bound_endpoint",
    # round-7 gate ops (VERDICT r7 task 6)
    "sparql_path_var_seeded",
    "sparql_owl2_chain4",
    "sparql_owl2_consistency",
    "sparql_geo_multipolygon",
    # round-8 gate ops (geo set functions — Arrow-batched, map-only)
    "sparql_geo_intersection",
    "sparql_geo_union",
    "sparql_geo_relate",
    # round-8d gate op (DRed delete maintenance; the audited plan is the
    # maintained store's read-back — the maintenance plans themselves
    # are update-path, exercised by tests/test_inference_retract.py)
    "inference_retract_dred",
    "sparql_geo_line_clip",
    # round-9 gate op (SHACL validation-on-commit; the audited plan is
    # the constant outcome read-back — the enforcement plans are
    # commit-path, exercised by tests/test_shacl_enforce.py)
    "shacl_enforce_commit",
    # round-10 gate op (bigram LM perplexity — map-side bigram
    # formation, broadcast unigram probes, same-key count join)
    "text_bigram_perplexity",
    "text_unigram_logprob_topk",
    "text_bigram_perplexity_topk",
    "dedup_span_exact",
    "embed_label_drift",
]


def summarize(plan: str) -> list[str]:
    notes = []
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    notes.append(f"hash-partition exchanges: {n_ex}")
    n_bc = len(re.findall(r"BroadcastExchange|BroadcastHashJoin", plan))
    if n_bc:
        notes.append(f"broadcast joins/exchanges: {n_bc}")
    if "SortMergeJoin" in plan:
        notes.append("sort-merge joins present")
    pushed = re.findall(r"PushedFilters: \[([^\]]+)\]", plan)
    n_pushed = sum(1 for p in pushed if p.strip())
    if n_pushed:
        notes.append(f"scans with pushed filters: {n_pushed}")
    n_wsc = len(re.findall(r"WholeStageCodegen", plan))
    if n_wsc:
        notes.append(f"whole-stage-codegen spans: {n_wsc}")
    return notes


def plans_md_drift(plans_path: Path) -> list[str]:
    """AUDITED names with no ``## name`` section in the committed PLANS.md."""
    if not plans_path.is_file():
        return list(AUDITED)
    sections = set(re.findall(r"(?m)^## (\S+)$", plans_path.read_text()))
    return [n for n in AUDITED if n not in sections]


def main() -> None:
    if "--check" in sys.argv[1:]:
        missing = plans_md_drift(Path(__file__).resolve().parents[1] / "PLANS.md")
        if missing:
            print("PLANS.md is missing AUDITED sections (regenerate with "
                  f"tools/audit_plans.py): {', '.join(missing)}", file=sys.stderr)
            raise SystemExit(1)
        print(f"PLANS.md covers all {len(AUDITED)} AUDITED names", file=sys.stderr)
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from dublin_smart_city_graphdb_spark import harness
    from dublin_smart_city_graphdb_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    out = [
        "# PLANS — audited physical plans (generated by tools/audit_plans.py)",
        "",
        f"Scale factor dir: `{sf_dir}`. The load-bearing shapes below are",
        "asserted by `tests/test_plans.py` / `tests/test_pipeline_plans.py`;",
        "this file is the human-readable dump for review.",
        "",
    ]
    for name in AUDITED:
        df = harness.REGISTRY[name].fn(spark, sf_dir)
        qe = df._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        formatted = qe.explainString(mode)
        out.append(f"## {name}")
        out.append("")
        for n in summarize(plan):
            out.append(f"- {n}")
        out.append("")
        out.append("```")
        # formatted explain: keep the tree + operator details
        out.append(formatted.rstrip())
        out.append("```")
        out.append("")
        print(f"audited {name}", file=sys.stderr)
    Path("PLANS.md").write_text("\n".join(out))
    print("wrote PLANS.md", file=sys.stderr)


if __name__ == "__main__":
    main()
