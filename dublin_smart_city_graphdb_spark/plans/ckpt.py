"""Explicit lifecycle management for ``localCheckpoint`` block storage.

Iterative fixpoints (transitive closure, connected components, PageRank,
RDFS-Plus materialization) checkpoint every round to truncate lineage. The
blocks of a *superseded* generation — e.g. round k's label table once round
k+1 has materialized — are garbage, but Spark only reclaims them when the
JVM garbage-collects the RDD object, which a long-lived driver (a 600-test
pytest session, a driver-style 50-query correctness run, a notebook) may
not do for hours. On a 28 GiB driver heap that deferred reclamation is the
difference between a green suite and a mid-suite ``OutOfMemoryError``
(VERDICT r3 task 2); on a real cluster it pins executor storage memory that
the shuffle needs.

``CheckpointTracker`` makes the hand-off explicit: ``checkpoint(df)``
records which persistent-RDD id the materialization created, and
``free(ids)`` unpersists a superseded generation the moment its successor
is safely materialized. Freeing is strictly for generations no live
DataFrame references: a localCheckpoint has no lineage to recompute from,
so unpersisting a still-referenced one would fail later jobs loudly
(CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).

Ownership is derived from the checkpointed DataFrame itself, not by
diffing the process-global ``getPersistentRDDs`` set: ``Dataset
.localCheckpoint`` returns a plan whose root is a ``LogicalRDD`` wrapping
the very RDD that was persisted, so that RDD's id IS the generation. A
global before/after diff would race — fixpoints run concurrently across
server threads (HTTP queries with property paths, per-repo write-path
materialization), and a tracker in thread A could capture ids checkpointed
by thread B and later free them out from under B's still-live plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CheckpointTracker:
    """Tracks and frees localCheckpoint block generations for one driver
    loop. Blocking-unpersist=False: reclamation is async, the loop never
    stalls on it."""

    def __init__(self, df_or_spark):
        spark = getattr(df_or_spark, "sparkSession", df_or_spark)
        self._jsc = spark.sparkContext._jsc

    @staticmethod
    def _owned_ids(df: DataFrame) -> set:
        """The persistent-RDD id backing a just-localCheckpointed frame:
        the analyzed plan's root is a ``LogicalRDD`` whose ``rdd`` field is
        the RDD ``localCheckpoint`` persisted. Thread-safe by construction
        (reads only the frame's own plan, no global state)."""
        try:
            return {int(df._jdf.queryExecution().analyzed().rdd().id())}
        except Exception:
            # Unexpected plan shape: claim nothing rather than risk freeing
            # a generation some other plan still references.
            return set()

    def checkpoint(self, df: DataFrame) -> tuple[DataFrame, set]:
        """Eagerly localCheckpoint ``df``; returns (checkpointed_df, the
        persistent-RDD ids the materialization created)."""
        out = df.localCheckpoint(eager=True)
        return out, self._owned_ids(out)

    def free(self, ids: set) -> None:
        """Unpersist a superseded generation's blocks. Only call with ids
        of checkpoints no live DataFrame can still reference."""
        if not ids:
            return
        pers = self._jsc.getPersistentRDDs()
        for k in list(pers.keySet().toArray()):
            if int(k) in ids:
                pers.get(k).unpersist(False)
