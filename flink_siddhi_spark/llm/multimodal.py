"""Multimodal column handling: image/audio/video as opaque binary + typed
metadata, with decode / feature-extraction as Arrow-batched ``mapInPandas``
stages.

The decode step itself is STUBBED (no image/audio libraries in this
environment): ``decode_image_stub`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder derives "pixels"
from the payload bytes. The Spark-side plumbing — binary columns, metadata
structs, Arrow batch shapes, partition-friendly mapInPandas signatures — is
real and tested; swap the stub for PIL/ffmpeg in production.

Scale notes: binary payloads ride in parquet as-is; mapInPandas streams
Arrow batches (bounded memory per task); metadata-only queries never touch
the payload column thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata adapter: treat document text bytes as an opaque media payload
    with typed metadata (shape a real image table would have)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            (F.octet_length(payload) % 640).alias("width"),
            (F.octet_length(payload) % 480).alias("height"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes, fake: bool = False) -> list[int]:
    """Decode an image payload to a pixel histogram. STUB: real decoding needs
    an imaging library not present in this environment."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library (PIL/opencv); "
            "run with fake=True for the deterministic test decoder"
        )
    # deterministic fake: 16-bin histogram of byte values
    hist = [0] * 16
    for b in payload:
        hist[b % 16] += 1
    return hist


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("histogram", T.ArrayType(T.LongType())),
    ]
)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "histogram": pdf["payload"].map(
                        lambda p: decode_image_stub(bytes(p), fake=fake)
                    ),
                }
            )
            yield out

    return df.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata-only projection — payload column pruned at the parquet scan."""
    return df.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def resize_stub(payload: bytes, w: int, h: int, fake: bool = False) -> bytes:
    """Resize an image payload. STUB: real resizing needs an imaging library;
    the deterministic fake keeps every (len//(w*h))-th byte."""
    if not fake:
        raise NotImplementedError(
            "image resizing requires an imaging library (PIL/opencv); "
            "run with fake=True for the deterministic test resizer"
        )
    stride = max(1, len(payload) // (w * h))
    return payload[::stride][: w * h]


def resize_images(df: DataFrame, width: int = 8, height: int = 8,
                  fake: bool = True) -> DataFrame:
    """Arrow-batched thumbnailing over binary payloads (mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "thumb": pdf["payload"].map(
                        lambda p: resize_stub(bytes(p), width, height, fake=fake)
                    ),
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 4, frame_bytes: int = 64,
                  fake: bool = True) -> DataFrame:
    """Sample every n-th fixed-size "frame" from a (fake) video payload —
    the one-row-in / many-rows-out mapInPandas shape a real ffmpeg-backed
    sampler would use. Deterministic fake: frames are consecutive
    ``frame_bytes`` slices of the payload."""
    if not fake:
        raise NotImplementedError(
            "video decoding requires ffmpeg; run with fake=True for the "
            "deterministic test sampler"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload)
                n_frames = max(1, len(p) // frame_bytes)
                for fno in range(0, n_frames, every_n):
                    ids.append(mid)
                    nos.append(fno)
                    frames.append(p[fno * frame_bytes:(fno + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return df.select("media_id", "payload").mapInPandas(run, FRAME_SCHEMA)
