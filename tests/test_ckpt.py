"""CheckpointTracker ownership semantics (ADVICE r4, medium).

The tracker must attribute to each ``checkpoint()`` call exactly the
persistent-RDD id that call created — derived from the checkpointed
frame's own plan, never from a global before/after diff of
``getPersistentRDDs`` (which races when fixpoints run concurrently across
server threads and can free a sibling thread's still-live generation).
"""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from dublin_smart_city_graphdb_spark.plans.ckpt import CheckpointTracker


def _persistent_ids(spark):
    jsc = spark.sparkContext._jsc
    return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}


def test_checkpoint_claims_only_its_own_rdd(spark):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    tr = CheckpointTracker(df)
    out, ids = tr.checkpoint(df)
    assert len(ids) == 1
    assert ids <= _persistent_ids(spark)
    # The claimed id is the frame's own backing RDD, not a diff artifact.
    own = int(out._jdf.queryExecution().analyzed().rdd().id())
    assert ids == {own}
    assert out.count() == 100
    tr.free(ids)
    assert not (ids & _persistent_ids(spark))


def test_concurrent_checkpoints_claim_disjoint_ids(spark):
    """Two threads checkpointing at once must each claim only their own
    generation; freeing one must leave the other's frame computable."""
    n_threads = 4
    barrier = threading.Barrier(n_threads)
    results: list = [None] * n_threads
    errors: list = []

    def work(i: int) -> None:
        try:
            df = spark.range(1000 + i).withColumn("y", F.col("id") + i)
            tr = CheckpointTracker(df)
            barrier.wait(timeout=60)
            out, ids = tr.checkpoint(df)
            results[i] = (tr, out, ids)
        except Exception as exc:  # pragma: no cover - failure path
            errors.append(exc)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    assert all(r is not None for r in results)

    all_ids = [ids for (_, _, ids) in results]
    assert all(len(ids) == 1 for ids in all_ids)
    union = set().union(*all_ids)
    assert len(union) == n_threads  # pairwise disjoint ownership

    # Free thread 0's generation; every other thread's frame must still
    # be fully computable (its blocks were not stolen).
    tr0, _, ids0 = results[0]
    tr0.free(ids0)
    for i in range(1, n_threads):
        _, out, _ = results[i]
        assert out.count() == 1000 + i
    for i in range(1, n_threads):
        tr, _, ids = results[i]
        tr.free(ids)
