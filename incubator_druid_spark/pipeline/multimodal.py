"""Multimodal column handling: image/audio/video as opaque binary + metadata.

Convention: a multimodal table carries
    content   binary          — the encoded media bytes
    media     struct<mime:string, width:int, height:int, duration_ms:long,
                     sample_rate:int, n_frames:int>   — typed metadata

The Spark-side plumbing (schemas, batch iteration via mapInPandas, partition
sizing) is real and tested; the actual codecs (PIL/ffmpeg/soundfile) are NOT
in this container, so the decode kernels are stubbed: ``fake=True`` produces
deterministic synthetic outputs (hash-derived) with the correct shapes, and
``fake=False`` raises NotImplementedError at the exact point a codec call
would occur.  Swapping in a real codec changes only the marked kernel lines.

Scale notes: mapInPandas streams Arrow batches — bytes never materialize as
Python lists; `spark.sql.files.maxPartitionBytes` bounds per-task memory, and
decode parallelism is the scan's partition count (no shuffle introduced).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])


def attach_media_metadata(df: DataFrame, content_col: str = "content",
                          mime: str = "application/octet-stream") -> DataFrame:
    """Add a typed `media` struct (mime sniffed from magic bytes JVM-side)."""
    c = F.col(content_col)
    sniffed = (F.when(F.hex(F.substring(c, 1, 3)) == "FFD8FF", "image/jpeg")
                .when(F.hex(F.substring(c, 1, 4)) == "89504E47", "image/png")
                .when(F.substring(c, 1, 4).cast("string") == "RIFF", "audio/wav")
                .otherwise(mime))
    return df.withColumn("media", F.struct(
        sniffed.alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_frames"),
    ))


def _fake_pixels(data: bytes, w: int, h: int) -> list[float]:
    """Deterministic stand-in for a decoded+pooled image: hash-seeded floats."""
    h0 = hashlib.sha256(data or b"").digest()
    return [h0[i % 32] / 255.0 for i in range(8)]


_IMAGE_FEATURE_SCHEMA = ("id long, mime string, feat array<double>, "
                         "width int, height int")


def decode_image_features(df: DataFrame, id_col: str = "id",
                          content_col: str = "content",
                          target: tuple[int, int] = (224, 224),
                          fake: bool = True) -> DataFrame:
    """decode → resize(target) → 8-dim pooled feature, via mapInPandas.

    Batch shape: Arrow record batches; per-row the kernel sees raw bytes.
    """
    tw, th = target

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # REAL CODEC GOES HERE: PIL.Image.open(io.BytesIO(b)).resize(...)
                raise NotImplementedError(
                    "image codec not available in this environment")
            out = pd.DataFrame({
                "id": pdf[id_col],
                "mime": "image/fake",
                "feat": [_fake_pixels(b, tw, th) for b in pdf[content_col]],
                "width": tw,
                "height": th,
            })
            yield out

    return (df.select(id_col, content_col)
              .mapInPandas(kernel, schema=_IMAGE_FEATURE_SCHEMA))


_FRAME_SCHEMA = "id long, frame_idx int, frame_feat array<double>"


def sample_video_frames(df: DataFrame, id_col: str = "id",
                        content_col: str = "content", every_n: int = 10,
                        max_frames: int = 4, fake: bool = True) -> DataFrame:
    """Frame sampling: one output row per sampled frame (explode shape)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # REAL CODEC GOES HERE: ffmpeg/av frame iteration
                raise NotImplementedError(
                    "video codec not available in this environment")
            ids, idxs, feats = [], [], []
            for rid, b in zip(pdf[id_col], pdf[content_col]):
                n = min(max_frames, 1 + (len(b or b"") // max(every_n, 1)) % max_frames)
                for i in range(n):
                    ids.append(rid)
                    idxs.append(i * every_n)
                    feats.append(_fake_pixels((b or b"") + bytes([i]), 0, 0))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_feat": feats})

    return (df.select(id_col, content_col)
              .mapInPandas(kernel, schema=_FRAME_SCHEMA))


_AUDIO_SCHEMA = "id long, duration_ms long, sample_rate int, loudness double"


def extract_audio_features(df: DataFrame, id_col: str = "id",
                           content_col: str = "content",
                           fake: bool = True) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # REAL CODEC GOES HERE: soundfile.read(io.BytesIO(b))
                raise NotImplementedError(
                    "audio codec not available in this environment")
            yield pd.DataFrame({
                "id": pdf[id_col],
                "duration_ms": [len(b or b"") * 8 for b in pdf[content_col]],
                "sample_rate": 16000,
                "loudness": [(sum(b[:64]) % 1000) / 1000.0 if b else 0.0
                             for b in pdf[content_col]],
            })

    return (df.select(id_col, content_col)
              .mapInPandas(kernel, schema=_AUDIO_SCHEMA))
