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


def fresh_ids(df: DataFrame) -> DataFrame:
    """Re-root a DataFrame on its physical RDD with FRESH attribute ids
    and no origin constraints/stats — plan hygiene for unions whose
    children descend from the same checkpoint. Spark's optimizer crashes
    rewriting the stale ``originConstraints`` of a deduplicated
    LogicalRDD self-union (``key not found: s#N`` in
    ``UnionBase.rewriteConstraints``, reproduced on 4.1.2 by
    ``ckptA.unionByName(ckptB).distinct().localCheckpoint()`` when both
    checkpoints carry the same output ids). Zero data movement: the new
    frame wraps the SAME InternalRow RDD (``internalCreateDataFrame``),
    falling back to a Row-converting ``createDataFrame`` if that
    interface ever disappears."""
    sp = df.sparkSession
    jdf = df._jdf
    try:
        new_jdf = sp._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
    except Exception:
        new_jdf = sp._jsparkSession.createDataFrame(
            jdf.javaRDD(), jdf.schema()
        )
    return DataFrame(new_jdf, sp)


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

    def checkpoint(
        self, df: DataFrame, fresh: bool = False, eager: bool = True
    ) -> tuple[DataFrame, set]:
        """localCheckpoint ``df``; returns (checkpointed_df, the
        persistent-RDD ids the materialization creates). ``fresh=True``
        additionally re-roots the result via ``fresh_ids`` (the returned
        ids still identify the underlying checkpoint blocks).
        ``eager=False`` defers materialization to the caller's next
        action over the returned frame — fixpoint loops fuse the
        checkpoint job into their convergence probe that way (round 12),
        one job per round instead of two."""
        out = df.localCheckpoint(eager=eager)
        ids = self._owned_ids(out)
        if fresh:
            out = fresh_ids(out)
        return out, ids

    def free(self, ids: set) -> None:
        """Unpersist a superseded generation's blocks. Only call with ids
        of checkpoints no live DataFrame can still reference."""
        if not ids:
            return
        pers = self._jsc.getPersistentRDDs()
        for k in list(pers.keySet().toArray()):
            if int(k) in ids:
                pers.get(k).unpersist(False)
