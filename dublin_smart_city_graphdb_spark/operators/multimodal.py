"""Multimodal (image/audio/video) column processing over opaque binary columns.

Design (SURVEY §7): media arrives as ``binary`` payload columns with typed
metadata; decode / feature-extract / resize / frame-sample run as Arrow-batched
Pandas functions over ``mapInPandas`` so each executor processes columnar
batches without per-row Python overhead. The actual codec step is STUBBED —
this container ships no image/audio libraries — behind ``_decode_stub`` (a
deterministic fake) and ``decode_real`` (raises ``NotImplementedError``). The
Spark-side plumbing — schema, Arrow batch shape, partition behavior — is real
and tested.

At scale: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak usage); metadata
extraction is embarrassingly parallel (zero shuffles).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

METADATA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("decode_status", StringType()),
    ]
)


def decode_real(payload: bytes) -> dict:
    """Real media decode — requires image/audio libs not present here."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use the deterministic "
        "stub path (decode=_decode_stub)"
    )


def _decode_stub(doc_id: int, payload: bytes) -> dict:
    """Deterministic fake decoder: metadata derived from payload size/id."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 64 + n % 512,
        "height": 64 + (doc_id * 7) % 512,
        "n_frames": 1 + doc_id % 3,
        "decode_status": "stub-decoded",
    }


def extract_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched metadata extraction over a binary media column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _decode_stub(int(i), bytes(p))
                for i, p in zip(pdf[id_col], pdf[payload_col])
            ]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].astype("int64").values)
            yield out

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, METADATA_SCHEMA
    )
