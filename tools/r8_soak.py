"""Round-8 scale-behavior soak (VERDICT r7 task 4).

Δ-seeded incremental inference for the EXTENDED rulesets: append a
FIXED-size instance batch to owl-horst / owl2-rl stores of growing
size. With the GRAPH-marker semi-naive variants the rule-evaluation
work is Δ-sized (the store only participates through predicate-pruned
joins against the Δ frontier and the dedup anti-join), so append
wall-time should stay ~flat while the store grows 10× — against the
r7 baseline where any non-rdfsplus append re-ran the FULL fixpoint
(cost ∝ |store| per batch: a full-corpus fixpoint per ingest batch at
100 TB).

Prints one JSON line per ruleset for PERFORMANCE.md.

Usage: python tools/r8_soak.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ONT = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix ex: <http://inc#> .
ex:HasGoodFriend owl:someValuesFrom ex:Good ; owl:onProperty ex:friend .
ex:Member owl:hasValue ex:club ; owl:onProperty ex:belongsTo .
ex:grand owl:propertyChainAxiom (ex:parent ex:parent) .
"""


def _bulk_rows(n: int):
    from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA

    rows = []
    for i in range(n):
        rows.append(
            (None, f"urn:s{i}", "http://inc#knows", 0, f"urn:s{i + 1}",
             None, None, None, None, None)
        )
    return rows, QUAD_SCHEMA


def soak(ruleset: str, sizes=(20_000, 200_000), batch=200) -> dict:
    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.session import get_spark

    spark = get_spark()
    eng = Engine(spark)
    out = {"ruleset": ruleset, "batch_triples": batch, "appends": {}}
    for n in sizes:
        name = f"r8soak_{ruleset.replace('-', '')}_{n}"
        if name in eng.list_repositories():
            eng.drop_repository(name)
        repo = eng.create_repository(name, ruleset=ruleset)
        repo.load_turtle(ONT)
        rows, schema = _bulk_rows(n)
        # bulk base WITHOUT per-batch inference: one full materialize
        repo.add_quads(spark.createDataFrame(rows, schema))
        repo.materialize_inference()
        repo.count()  # settle
        # the measured append: fixed-size instance Δ through _ingest
        delta = "\n".join(
            f"<urn:d{i}> <http://inc#friend> <urn:g> ."
            for i in range(batch)
        ) + "\n<urn:g> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
        delta += " <http://inc#Good> .\n"
        t0 = time.time()
        repo.load_nquads_text(delta)  # N-Triples ⊂ N-Quads; goes via _ingest
        out["appends"][str(n)] = round(time.time() - t0, 2)
        eng.drop_repository(name)
    small, large = (out["appends"][str(s)] for s in sizes)
    out["growth_ratio_10x_store"] = round(large / small, 2)
    return out


def main() -> None:
    for ruleset in ("owl-horst", "owl2-rl"):
        print(json.dumps(soak(ruleset)))


if __name__ == "__main__":
    main()
