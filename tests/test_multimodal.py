from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from dublin_smart_city_graphdb_spark.operators.multimodal import (
    decode_real,
    extract_features,
    extract_metadata,
    resize_images,
    sample_frames,
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


@pytest.fixture()
def media_df(spark):
    return spark.createDataFrame(
        [(1, bytearray(b"hello world")), (2, bytearray(b"z" * 300)),
         (5, bytearray(b"abcdef" * 40))],
        ["doc_id", "payload"],
    )


def test_resize_images(media_df):
    out = resize_images(media_df, 128, 128)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 5}
    target = 128 * 128 // 64
    for r in rows.values():
        assert len(r.payload) == target
        assert (r.width, r.height) == (128, 128)
    # deterministic content: tiled source bytes
    assert bytes(rows[1].payload[:11]) == b"hello world"


def test_sample_frames_row_expansion(media_df):
    out = sample_frames(media_df, every_n=1)
    rows = [(r.doc_id, r.frame_idx) for r in out.collect()]
    # n_frames from the stub decoder: 1 + doc_id % 3
    assert sorted(rows) == [(1, 0), (1, 1), (2, 0), (2, 1), (2, 2), (5, 0), (5, 1), (5, 2)]
    every2 = sample_frames(media_df, every_n=2)
    assert sorted((r.doc_id, r.frame_idx) for r in every2.collect()) == [
        (1, 0), (2, 0), (2, 2), (5, 0), (5, 2),
    ]


def test_extract_features_feeds_similarity_ops(media_df):
    out = extract_features(media_df, dim=8)
    rows = {r.doc_id: r.features for r in out.collect()}
    assert all(len(v) == 8 for v in rows.values())
    assert all(-1.0 <= x <= 1.0 for v in rows.values() for x in v)
    # determinism across runs
    again = {r.doc_id: r.features for r in extract_features(media_df, dim=8).collect()}
    assert rows == again
    # composes with the cosine similarity expression used by ANN ops
    df = extract_features(media_df, dim=8)
    dot = F.expr(
        "aggregate(zip_with(features, features, (x, y) -> CAST(x AS DOUBLE) * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    norms = df.select(F.sqrt(dot).alias("n")).collect()
    assert all(r.n >= 0 for r in norms)


def test_decode_real_probe_absent():
    """Sandbox path: neither PIL nor av installed → NotImplementedError
    (the documented boundary), probe returns (None, None)."""
    import pytest

    from dublin_smart_city_graphdb_spark.operators import multimodal as M

    assert M._probe_codecs() == (None, None)
    with pytest.raises(NotImplementedError):
        M.decode_real(b"\x89PNG fake")


def test_decode_real_probe_present(monkeypatch):
    """When a PIL-like module is importable, decode_real uses it —
    probed via a mocked module, no real Pillow needed."""
    from dublin_smart_city_graphdb_spark.operators import multimodal as M

    class FakeIm:
        width, height, n_frames = 320, 240, 1

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeImageMod:
        @staticmethod
        def open(fp):
            return FakeIm()

    monkeypatch.setattr(M, "_probe_codecs", lambda: (FakeImageMod, None))
    out = M.decode_real(b"\x89PNG fake payload")
    assert out == {
        "n_bytes": 17, "width": 320, "height": 240, "n_frames": 1,
        "decode_status": "pil-decoded",
    }


def test_decode_real_av_fallback(monkeypatch):
    """A payload PIL rejects falls through to the av probe."""
    from dublin_smart_city_graphdb_spark.operators import multimodal as M

    class FailingImageMod:
        @staticmethod
        def open(fp):
            raise OSError("cannot identify image file")

    class FakeStream:
        type, width, height, frames = "video", 1920, 1080, 120

    class FakeContainer:
        streams = [FakeStream()]

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeAv:
        @staticmethod
        def open(fp):
            return FakeContainer()

    monkeypatch.setattr(
        M, "_probe_codecs", lambda: (FailingImageMod, FakeAv)
    )
    out = M.decode_real(b"container bytes")
    assert out["decode_status"] == "av-decoded"
    assert (out["width"], out["height"], out["n_frames"]) == (1920, 1080, 120)
