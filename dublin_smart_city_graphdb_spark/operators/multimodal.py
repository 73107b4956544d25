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
    ArrayType,
    BinaryType,
    FloatType,
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


def _probe_codecs() -> tuple:
    """(PIL.Image module | None, av module | None) — the optional media
    libraries probed by import-try (VERDICT r7 task 7). This sandbox
    ships neither, so the probe returns (None, None) and callers keep
    the deterministic stub; a cluster image with Pillow / PyAV installed
    flips decode_real live with no code change."""
    try:
        from PIL import Image as pil_image  # type: ignore
    except Exception:
        pil_image = None
    try:
        import av as av_mod  # type: ignore
    except Exception:
        av_mod = None
    return pil_image, av_mod


def decode_real(payload: bytes, doc_id: int = 0) -> dict:
    """Real media decode via the optional libraries when present (PIL
    for images, PyAV for audio/video containers); raises
    ``NotImplementedError`` when neither is installed — the documented
    sandbox boundary, with the deterministic stub as the fallback
    path."""
    import io

    pil_image, av_mod = _probe_codecs()
    if pil_image is not None:
        try:
            with pil_image.open(io.BytesIO(payload)) as im:
                return {
                    "n_bytes": len(payload),
                    "width": int(im.width),
                    "height": int(im.height),
                    "n_frames": int(getattr(im, "n_frames", 1)),
                    "decode_status": "pil-decoded",
                }
        except Exception:
            pass  # not an image — fall through to the av probe
    if av_mod is not None:
        try:
            with av_mod.open(io.BytesIO(payload)) as container:
                vstreams = [
                    s for s in container.streams if s.type == "video"
                ]
                v = vstreams[0] if vstreams else None
                return {
                    "n_bytes": len(payload),
                    "width": int(v.width) if v else 0,
                    "height": int(v.height) if v else 0,
                    "n_frames": int(v.frames) if v else 0,
                    "decode_status": "av-decoded",
                }
        except Exception:
            pass
    raise NotImplementedError(
        "media codecs unavailable in this environment (no PIL, no av); "
        "use the deterministic stub path (decode=_decode_stub)"
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


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize stub: a real impl would decode → scale → re-encode per batch
    (PIL/libvips, not shipped here); the deterministic fake re-encodes as a
    byte pattern sized width*height//64 so batch shapes and memory behavior
    are representative. Plumbing (schema, Arrow batches, zero shuffles) is
    the real design."""

    target = max(1, width * height // 64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                (bytes(p) * (target // max(1, len(bytes(p))) + 1))[:target]
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").values,
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, RESIZED_SCHEMA
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling stub: one output row per sampled frame (a real impl
    demuxes the container and decodes every Nth frame). The fake slices the
    payload into n_frames chunks (per the stub decoder) and keeps every Nth
    — exercising the row-expanding mapInPandas shape (output rows ≠ input
    rows) that real frame extraction needs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(p)
                meta = _decode_stub(int(i), payload)
                n = meta["n_frames"]
                step = max(1, len(payload) // max(1, n))
                for k in range(0, n, every_n):
                    ids.append(int(i))
                    idxs.append(k)
                    frames.append(payload[k * step:(k + 1) * step])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, FRAMES_SCHEMA
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Feature-extraction stub → ``array<float>`` embedding column usable by
    the similarity-search operators (ann_cosine_topk / ann_lsh_topk). The
    fake derives deterministic unit-norm-ish features from payload byte
    statistics; a real impl would run a vision/audio encoder per Arrow
    batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                payload = bytes(p)
                vec = [
                    float((sum(payload[j::dim]) % 1000) - 500) / 500.0
                    if payload
                    else 0.0
                    for j in range(dim)
                ]
                feats.append(vec)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").values,
                    "features": feats,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, FEATURES_SCHEMA
    )
