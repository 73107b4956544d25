"""Structured Streaming surface (SURVEY.md §2.9 / §7 M8).

The reference has no streaming — ingestion is batch POST
(``init-graphdb.sh:90-119``) — so this module is pure extension surface:
streaming triple ingest into a repository, and watermarked windowed
aggregation over event feeds.
"""

from dublin_smart_city_graphdb_spark.streaming.events import (
    session_counts_stream,
    sliding_counts_stream,
    stream_events,
    tumbling_counts_stream,
)
from dublin_smart_city_graphdb_spark.streaming.ingest import StreamingTripleIngest

__all__ = [
    "stream_events",
    "tumbling_counts_stream",
    "sliding_counts_stream",
    "session_counts_stream",
    "StreamingTripleIngest",
]
