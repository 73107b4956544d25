"""Round-9 scale soak: the r8 surfaces one decade further (VERDICT r8
task 6). Round 8 proved Δ-seeded appends and DRed deletes ~flat on the
20k→200k store decade; this reruns the SAME protocols on 200k→2M so the
claim stands on two decades, not one. Reuses the r8 soak bodies verbatim
— only the store sizes change.

Prints one JSON line per (protocol, ruleset) for PERFORMANCE.md.

Usage: python tools/r9_soak.py [append|dred]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

SIZES = (200_000, 2_000_000)


def warm_append_soak(ruleset: str = "owl2-rl", sizes=SIZES,
                     batch: int = 200) -> dict:
    """Cold-vs-warm append protocol for the round-9 round-fn cache: the
    FIRST owl2-rl append after any schema change rebuilds the RL rule
    table (vocabulary flags + list-axiom collection — O(store) scans);
    every subsequent instance-only append reuses it. The cache's claim
    is that WARM appends are store-size-flat; this times one cold and
    one warm append per store size."""
    import time

    from r8_soak import ONT, _bulk_rows

    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.session import get_spark

    spark = get_spark()
    eng = Engine(spark)
    out = {"ruleset": ruleset, "protocol": "warm_append",
           "batch_triples": batch, "cold": {}, "warm": {}}
    for n in sizes:
        name = f"r9soak_{ruleset.replace('-', '')}_{n}"
        if name in eng.list_repositories():
            eng.drop_repository(name)
        repo = eng.create_repository(name, ruleset=ruleset)
        repo.load_turtle(ONT)
        rows, schema = _bulk_rows(n)
        repo.add_quads(spark.createDataFrame(rows, schema))
        repo.materialize_inference()
        repo.count()

        def delta(tag: str) -> str:
            lines = [
                f"<urn:{tag}{i}> <http://inc#friend> <urn:g> ."
                for i in range(batch)
            ]
            lines.append(
                "<urn:g> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
                " <http://inc#Good> ."
            )
            return "\n".join(lines) + "\n"

        t0 = time.time()
        repo.load_nquads_text(delta("c"))
        out["cold"][str(n)] = round(time.time() - t0, 2)
        t0 = time.time()
        repo.load_nquads_text(delta("w"))
        out["warm"][str(n)] = round(time.time() - t0, 2)
        eng.drop_repository(name)
    small, large = (out["warm"][str(s)] for s in sizes)
    out["warm_growth_ratio_10x_store"] = round(large / small, 2)
    return out


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which == "warm":
        print(json.dumps(warm_append_soak()), flush=True)
        return
    if which in ("append", "both"):
        from r8_soak import soak as append_soak

        for ruleset in ("owl-horst", "owl2-rl"):
            out = append_soak(ruleset, sizes=SIZES)
            out["protocol"] = "delta_seeded_append"
            print(json.dumps(out), flush=True)
    if which in ("dred", "both"):
        from r8b_soak import soak as dred_soak

        for ruleset in ("rdfsplus", "owl-horst", "owl2-rl"):
            out = dred_soak(ruleset, sizes=SIZES)
            out["protocol"] = "dred_delete"
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
