"""A/B one registry query between two source trees (VERDICT r4 task 3:
adjudicate the sparql_bgp_region_rollup r3->r4 bench drift).

Runs as a child process per (tree, round): imports the tree's harness,
warms up, then times the query best-of-3 in-process at the given sf dir
and prints the minimum. The parent (tools/ab_star_driver.sh or manual
interleaving) alternates trees across >=5 rounds so ambient load hits
both arms equally.

Usage: python tools/ab_star.py TREE_DIR SF_DIR QUERY_NAME
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    tree, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, tree)
    from dublin_smart_city_graphdb_spark import harness
    from dublin_smart_city_graphdb_spark.session import get_spark

    spark = get_spark(app_name="ab_star")
    fn = harness.REGISTRY[name].fn
    fn(spark, "/root/testdata/sf0.001").count()  # codegen warmup
    from dublin_smart_city_graphdb_spark.harness import sparql_gate

    sparql_gate._quads(spark, sf_dir).count()  # store load (outside timing)
    best = min(
        (lambda t0: (fn(spark, sf_dir).count(), time.time() - t0)[1])(
            time.time()
        )
        for _ in range(3)
    )
    print(f"RESULT {best:.3f}")


if __name__ == "__main__":
    main()
