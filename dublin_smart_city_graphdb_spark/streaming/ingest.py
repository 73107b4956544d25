"""Streaming triple ingest: an unbounded N-Triples feed → the quads table.

The streaming analogue of the reference's batch POST path
(``init-graphdb.sh:90-119``): files dropped into a directory are discovered
by the Structured Streaming file source, parsed executor-side, and appended
to the repository. ``foreachBatch`` bridges the stream to the full batch
DataFrame API (the per-partition N-Triples parser and the store's
partitioned append), with exactly-once per micro-batch guaranteed by the
checkpoint — re-running after a crash does not double-ingest a batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA
from dublin_smart_city_graphdb_spark.session import local_df
from dublin_smart_city_graphdb_spark.sources.turtle import parse_ntriples_lines


class StreamingTripleIngest:
    def __init__(
        self,
        repo,
        input_dir: str,
        checkpoint_dir: str,
        graph: str | None = None,
    ):
        self.repo = repo
        self.spark: SparkSession = repo.spark
        self.input_dir = input_dir
        self.checkpoint_dir = checkpoint_dir
        self.graph = graph

    def _ingest_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        lines = batch_df.rdd.map(lambda r: r.value)
        graph = self.graph
        rows = lines.mapPartitions(lambda it: parse_ntriples_lines(it, graph))
        quads = local_df(self.spark, rows, QUAD_SCHEMA)
        self.repo.add_quads(quads)

    def start(self, available_now: bool = True):
        stream = self.spark.readStream.text(self.input_dir)
        writer = (
            stream.writeStream.foreachBatch(self._ingest_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_available(self) -> None:
        """Ingest everything currently in the directory, then stop —
        incremental across calls (the checkpoint remembers seen files)."""
        q = self.start(available_now=True)
        q.awaitTermination()
