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
 - ``documents.text`` gets a replica-salt token appended — otherwise every
   doc would have K exact copies and dedup ops would measure a degenerate
   corpus (constant near-dup structure within each replica is preserved).
 - ``embeddings.embedding`` gets a tiny deterministic per-replica rotation
   of the first component — otherwise ANN top-k is K-way tied.

Usage:  python tools/gen_scale.py SRC_DIR OUT_DIR K
        python tools/gen_scale.py /root/testdata/sf0.1 .scaledata/sf1 10
"""

from __future__ import annotations

import sys

import pyspark.sql.functions as F


# Key offsets: far above any real key at any driver sf (sf0.1 maxima:
# custkey 15k, orderkey 600k, partkey 20k, suppkey 1k, user_id ~10k,
# doc_id 5k, vec_id 2k, event_id 100k).
OFF = 10_000_000


def scale_tables(spark, src: str, out: str, k: int) -> None:
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
                    r = r.withColumn(
                        "text",
                        F.concat(F.col("text"), F.lit(f" replica{i}")),
                    ).withColumn("n_chars", F.length("text").cast("bigint"))
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
    from dublin_smart_city_graphdb_spark.session import get_spark

    spark = get_spark(app_name="gen_scale", master="local[16]",
                      shuffle_partitions=32)
    scale_tables(spark, src, out, k)


if __name__ == "__main__":
    main()
