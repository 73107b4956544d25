"""Scale-up generator: build an sfN directory by replicating a driver sf
directory K times with key-space offsets (VERDICT r4 task 1 — the sf1
scale soak needs ~10x data and the driver only ships up to sf0.1).

Scaling model mirrors TPC-H's: dimension tables (region, nation) stay
fixed; entity tables (customer, supplier, part, orders, lineitem, events
users, documents, embeddings) grow linearly, each replica getting a
disjoint key range that references ITS OWN replica's foreign keys — so
join fan-outs, group sizes and per-user session lengths stay constant
while table sizes scale, which is exactly the property a linear-scaling
test needs to expose super-linear operators.

Per-replica perturbations keep pipeline workloads realistic instead of
pathological:
 - ``documents.text`` (mode="distinct", default): every other word gains a
   replica tag, so cross-replica Jaccard ≈ 0 and near-dup cluster sizes
   stay CONSTANT as data scales — the linear-scaling model. mode="dupes"
   appends only a trailing salt token: every doc gains K near-copies — a
   duplicate-heavy stress variant whose pair output grows quadratically
   in K (the mega-cluster / boilerplate workload).
 - ``embeddings.embedding`` gets a tiny deterministic per-replica rotation
   of the first component — otherwise ANN top-k is K-way tied.

Usage:  python tools/gen_scale.py SRC_DIR OUT_DIR K [distinct|dupes]
        python tools/gen_scale.py /root/testdata/sf0.1 .scaledata/sf1 10
"""

from __future__ import annotations

import sys

import pyspark.sql.functions as F


# Key offsets: far above any real key at any driver sf (sf0.1 maxima:
# custkey 15k, orderkey 600k, partkey 20k, suppkey 1k, user_id ~10k,
# doc_id 5k, vec_id 2k, event_id 100k).
OFF = 10_000_000


def scale_tables(spark, src: str, out: str, k: int, mode: str = "distinct") -> None:
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for name in tables:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        if name in ("region", "nation"):
            out_df = df
        else:
            reps = []
            for i in range(k):
                r = df
                for col in r.columns:
                    # every *key / *_id column shifts into replica i's range
                    if col.endswith("key") and col not in (
                        "c_nationkey", "s_nationkey", "n_regionkey",
                        "n_nationkey", "r_regionkey",
                    ) or col.endswith("_id"):
                        r = r.withColumn(
                            col, (F.col(col) + F.lit(i * OFF)).cast("bigint")
                        )
                if name == "documents":
                    # Replica 0 keeps the original text. Later replicas
                    # suffix every other word with a replica tag: every
                    # 3-word shingle contains a tagged word, so cross-
                    # replica Jaccard ≈ 0 and near-dup CLUSTER SIZES stay
                    # constant as data scales (the linear-scaling model).
                    # mode="dupes" keeps a weak perturbation instead: every
                    # doc gains K near-copies — a duplicate-heavy stress
                    # variant (mega-cluster workload for the dedup family).
                    if mode == "dupes":
                        r = r.withColumn(
                            "text",
                            F.concat(F.col("text"), F.lit(f" replica{i}")),
                        ).withColumn(
                            "n_chars", F.length("text").cast("bigint")
                        )
                    elif i > 0:
                        r = r.withColumn(
                            "text",
                            F.array_join(
                                F.transform(
                                    F.split(F.col("text"), " "),
                                    lambda w, idx: F.when(
                                        idx % 2 == 0,
                                        F.concat(w, F.lit(f"~{i}")),
                                    ).otherwise(w),
                                ),
                                " ",
                            ),
                        ).withColumn(
                            "n_chars", F.length("text").cast("bigint")
                        )
                if name == "embeddings":
                    r = r.withColumn(
                        "embedding",
                        F.transform(
                            "embedding",
                            lambda x, idx: F.when(
                                idx == 0, x + F.lit(float(i) * 1e-3)
                            ).otherwise(x).cast("float"),
                        ),
                    )
                reps.append(r)
            out_df = reps[0]
            for r in reps[1:]:
                out_df = out_df.unionByName(r)
        out_df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        n = spark.read.parquet(f"{out}/{name}.parquet").count()
        print(f"{name}: {n} rows", flush=True)


def main() -> None:
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "distinct"
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dublin_smart_city_graphdb_spark.session import get_spark

    spark = get_spark(app_name="gen_scale", master="local[16]",
                      shuffle_partitions=32)
    scale_tables(spark, src, out, k, mode)


if __name__ == "__main__":
    main()
