"""Round-8 scale-behavior soak: DRed delete maintenance.

Before inference/dred.py every SPARQL-Update delete re-ran the FULL
materialization fixpoint (cost ∝ |store| × rounds per delete batch — a
nightly-rebuild cost model for what should be an ingest-pipeline
operation at 100 TB). With DRed the delete batch runs: explicit-diff
anti-joins, a Δ-seeded overdeletion probe (cost ∝ affected set), and —
only when something WAS overdeleted — one rederive round plus Δ-seeded
propagation.

Fixed 200-triple delete batch (with real derived dependents, so the
overdeletion + rederive path is exercised, not just the empty probe)
against stores of 20k vs 200k unrelated triples; the full-rebuild
baseline is timed on the same store for comparison. Prints one JSON
line per ruleset for PERFORMANCE.md.

Usage: python tools/r8b_soak.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ONT = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://inc#> .
ex:Friendly rdfs:subClassOf ex:Agent .
ex:HasGoodFriend owl:someValuesFrom ex:Good ; owl:onProperty ex:friend .
ex:grand owl:propertyChainAxiom (ex:parent ex:parent) .
"""

_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"


def _bulk_rows(n: int):
    from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA

    rows = []
    for i in range(n):
        rows.append(
            (None, f"urn:s{i}", "http://inc#knows", 0, f"urn:s{i + 1}",
             None, None, None, None, None)
        )
    return rows, QUAD_SCHEMA


def _dependent_facts(n: int) -> str:
    """n instance facts each with a DERIVED dependent: `dI friend g`
    (→ dI a HasGoodFriend under horst/owl2-rl) and `dI a Friendly`
    (→ dI a Agent under every ruleset)."""
    lines = [f"<urn:g> {_TYPE} <http://inc#Good> ."]
    for i in range(n):
        lines.append(f"<urn:d{i}> <http://inc#friend> <urn:g> .")
        lines.append(f"<urn:d{i}> {_TYPE} <http://inc#Friendly> .")
    return "\n".join(lines) + "\n"


def soak(ruleset: str, sizes=(20_000, 200_000), batch=200) -> dict:
    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.session import get_spark

    spark = get_spark()
    eng = Engine(spark)
    out = {"ruleset": ruleset, "deleted_triples": batch, "deletes": {},
           "full_rebuild": {}}
    for n in sizes:
        name = f"r8bsoak_{ruleset.replace('-', '')}_{n}"
        if name in eng.list_repositories():
            eng.drop_repository(name)
        repo = eng.create_repository(name, ruleset=ruleset)
        repo.load_turtle(ONT)
        rows, schema = _bulk_rows(n)
        repo.add_quads(spark.createDataFrame(rows, schema))
        repo.load_nquads_text(_dependent_facts(1000))
        repo.materialize_inference()
        repo.count()  # settle
        # the measured delete: 100 friend facts + 100 type facts, each
        # with a derived dependent that must be overdeleted
        dele = " ".join(
            f"<urn:d{i}> <http://inc#friend> <urn:g> ."
            for i in range(batch // 2)
        ) + " " + " ".join(
            f"<urn:d{i}> a <http://inc#Friendly> ."
            for i in range(batch // 2)
        )
        t0 = time.time()
        repo.update(f"DELETE DATA {{ {dele} }}")
        out["deletes"][str(n)] = round(time.time() - t0, 2)
        # the COMMON case: leaf facts with no derived dependents and a
        # predicate no rule head unifies with — the head-unification
        # prune (dred.retract) skips the rederive round entirely
        leaf = " ".join(
            f"<urn:s{i}> <http://inc#knows> <urn:s{i + 1}> ."
            for i in range(batch)
        )
        t0 = time.time()
        repo.update(f"DELETE DATA {{ {leaf} }}")
        out.setdefault("leaf_deletes", {})[str(n)] = round(
            time.time() - t0, 2
        )
        # full-rebuild baseline on the SAME (post-delete) store
        t0 = time.time()
        repo.materialize_inference()
        out["full_rebuild"][str(n)] = round(time.time() - t0, 2)
        eng.drop_repository(name)
    small, large = (out["deletes"][str(s)] for s in sizes)
    out["growth_ratio_10x_store"] = round(large / small, 2)
    out["vs_full_rebuild_at_large"] = round(
        out["full_rebuild"][str(sizes[-1])] / large, 2
    )
    return out


def main() -> None:
    for ruleset in ("rdfsplus", "owl-horst", "owl2-rl"):
        print(json.dumps(soak(ruleset)))


if __name__ == "__main__":
    main()
