from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from dublin_smart_city_graphdb_spark.operators.multimodal import (
    decode_real,
    extract_metadata,
)


def test_metadata_extraction(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"hello")), (2, bytearray(b"x" * 600))],
        ["doc_id", "payload"],
    )
    rows = {r.doc_id: r for r in extract_metadata(df).collect()}
    assert rows[1].n_bytes == 5
    assert rows[1].width == 64 + 5
    assert rows[1].height == 64 + 7
    assert rows[1].n_frames == 2
    assert rows[2].n_bytes == 600
    assert rows[2].width == 64 + (600 % 512)
    assert rows[2].decode_status == "stub-decoded"


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG")
