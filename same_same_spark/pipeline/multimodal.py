"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata.

Mirrors the reference's multimodal document model
(``internal/storage/local/schema.go:85-159``: content types
text|image|audio|video|document|custom with format-specific metadata
structs) and its image ingestion path
(``internal/ingestion/image.go:41-117``), re-expressed as Spark schema
+ Arrow batch processing.

Image decode is REAL for PNG, BMP, GIF (first frame), lossless WebP
(VP8L, :mod:`same_same_spark.pipeline.webpcodec`) and huffman-DCT
JPEG (baseline, extended sequential, and progressive, interleaved or
per-component scans) via the pure-stdlib codecs
(:mod:`same_same_spark.pipeline.imagecodec`; PIL is used instead when
installed, covering lossy WebP too — without it that variant raises
``UnsupportedImageError``). Audio decode is REAL for WAV/PCM
(:mod:`same_same_spark.pipeline.audiocodec` — 8/16/24/32-bit PCM,
float32/64, extensible headers). Video decode is REAL for AVI
containers carrying MJPEG or uncompressed-DIB streams
(:mod:`same_same_spark.pipeline.videocodec`); compressed audio
(MP3/OGG/FLAC) and modern video codecs (H.264 & co.) stay gated;
:func:`fake_features` provides a deterministic md5-derived stand-in so
the Spark-side plumbing — schema, partitioning, mapInPandas batch
shape, feature-column contract — is oracle-checkable end to end
regardless of media libs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONTENT_TYPES = ("text", "image", "audio", "video", "document", "custom")

# Typed metadata struct per media payload (schema.go:95-159 re-expressed)
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("content_type", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".gif", ".bmp", ".webp")  # image.go:45-52
AUDIO_EXTS = (".wav",)  # real stdlib decode; mp3/ogg/flac stay gated

FEATURE_DIM = 8


def media_table(
    df: DataFrame,
    content_col: str = "content",
    content_type: str = "image",
    fmt: str | None = None,
) -> DataFrame:
    """Wrap a BINARY content column with the typed metadata struct and
    the per-row checksum invariant (``schema.go:147-153``)."""
    c = F.col(content_col)
    meta = F.struct(
        F.lit(content_type).alias("content_type"),
        F.lit(fmt).cast("string").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("double").alias("duration_sec"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.sha2(c, 256).alias("checksum"),
    )
    return df.withColumn("media_meta", meta)


def read_binary_dir(spark, path: str, pattern: str = "*.jpg") -> DataFrame:
    """S5 — directory scan of media files (``image.go:41-117``) as the
    built-in binaryFile source: (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(path)
    )


def fake_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Deterministic stand-in feature extractor over BINARY content.

    ``feature[i] = (md5(content ∥ ':' ∥ i)60bit mod 2^20) / 2^20`` —
    reproducible in SQL, so the Arrow plumbing is oracle-checkable.
    Runs as mapInPandas (the exact shape a real decoder would use:
    Arrow batches in, one feature row per input row out).
    """
    schema = f"{id_col} LONG, features ARRAY<DOUBLE>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = []
            for blob in pdf[content_col]:
                raw = bytes(blob) if blob is not None else b""
                vec = []
                for i in range(dim):
                    h = hashlib.md5(raw + b":" + str(i).encode()).hexdigest()
                    vec.append((int(h[:15], 16) % (1 << 20)) / float(1 << 20))
                feats.append(vec)
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, content_col).mapInPandas(extract, schema)


def fake_features_sql(id_expr: str, content_expr: str, table: str, dim: int = FEATURE_DIM) -> str:
    """DuckDB twin of :func:`fake_features` (content as BLOB/VARCHAR)."""
    comps = ", ".join(
        f"(('0x' || substr(md5({content_expr} || ':{i}'), 1, 15))::BIGINT "
        f"% 1048576) / 1048576.0"
        for i in range(dim)
    )
    return f"SELECT {id_expr} AS doc_id, [{comps}] AS features FROM {table}"


def frame_sample_plan(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling PLAN: one output row per (video, frame
    index) with a deterministic time offset — the explode/partition
    shape, no decode. :func:`decode_video_frames` runs the same
    mid-bucket rule WITH real decode for AVI (MJPEG / DIB) payloads;
    this plan-only variant remains for codecs the container gates."""
    return df.select(
        F.col(id_col),
        F.col("media_meta"),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    ).withColumn(
        "time_frac",
        (F.col("frame_idx") + 0.5) / F.lit(float(n_frames)),
    )


def decode_audio_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Real audio decode → deterministic per-clip scalar features.

    WAV/PCM and FLAC decode via the pure-stdlib codecs
    (:mod:`same_same_spark.pipeline.audiocodec` /
    :mod:`same_same_spark.pipeline.flaccodec`); MP3/OGG raise
    ``UnsupportedAudioError`` (a ``NotImplementedError``
    subclass — the honest gate). One feature row per clip, Arrow
    batches in/out, exactly the image-path shape.
    """
    schema = (
        f"{id_col} LONG, sample_rate INT, n_channels INT, "
        "n_frames LONG, duration_sec DOUBLE, rms DOUBLE, "
        "peak DOUBLE, zcr DOUBLE"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from same_same_spark.pipeline.audiocodec import (
            audio_features,
            decode_audio,
        )

        for pdf in batches:
            rows = []
            for blob in pdf[content_col]:
                samples, rate = decode_audio(bytes(blob))
                rows.append(audio_features(samples, rate))
            out = pd.DataFrame(rows)
            out.insert(0, id_col, pdf[id_col].values)
            yield out[
                [
                    id_col, "sample_rate", "n_channels", "n_frames",
                    "duration_sec", "rms", "peak", "zcr",
                ]
            ]

    return df.select(id_col, content_col).mapInPandas(extract, schema)


def decode_video_frames(
    df: DataFrame,
    n_frames: int = 4,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Real video decode: AVI container parse → deterministic
    mid-bucket frame sampling → per-frame mean-RGB features, one
    output row per (video, sampled frame).

    MJPEG and uncompressed-DIB streams decode for real
    (:mod:`same_same_spark.pipeline.videocodec`); H.264 & co. raise
    ``UnsupportedVideoError`` (the honest gate). Same mid-bucket
    sampling rule as :func:`frame_sample_plan`, so the planned and
    decoded frame sets line up."""
    schema = (
        f"{id_col} LONG, frame_idx INT, time_sec DOUBLE, "
        "height INT, width INT, features ARRAY<DOUBLE>"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from same_same_spark.pipeline.videocodec import sample_frames

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[content_col]):
                meta, frames = sample_frames(bytes(blob), n_frames)
                for idx, t, rgb in frames:
                    feats = (
                        rgb.astype(np.float64).mean(axis=(0, 1)) / 255.0
                    ).tolist()
                    rows.append(
                        {
                            id_col: doc_id,
                            "frame_idx": int(idx),
                            "time_sec": float(t),
                            "height": int(rgb.shape[0]),
                            "width": int(rgb.shape[1]),
                            "features": feats,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "frame_idx", "time_sec", "height", "width",
                    "features",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(extract, schema)


def decode_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    size: tuple[int, int] = (32, 32),
) -> DataFrame:
    """Real image decode → Lanczos3 resize → mean-channel features.

    Decode order per blob: PIL when installed (every registered
    format), else the pure-stdlib codec
    (:mod:`same_same_spark.pipeline.imagecodec` — real PNG/BMP/GIF,
    lossless-WebP and huffman JPEG decode incl. progressive and
    lossless; lossy/animated WebP and hierarchical/arithmetic JPEG
    raise ``UnsupportedImageError``, a ``NotImplementedError``
    subclass, the narrowed honest gate).
    """

    schema = f"{id_col} LONG, features ARRAY<DOUBLE>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import io

            import PIL.Image as Image

            def to_rgb(blob: bytes) -> np.ndarray:
                img = Image.open(io.BytesIO(blob)).convert("RGB")
                return np.asarray(img.resize(size, Image.LANCZOS))
        except ImportError:
            from same_same_spark.pipeline.imagecodec import (
                decode_image,
                resize_lanczos3,
            )

            def to_rgb(blob: bytes) -> np.ndarray:
                return resize_lanczos3(decode_image(blob), size)

        for pdf in batches:
            feats = []
            for blob in pdf[content_col]:
                arr = to_rgb(bytes(blob)).astype(np.float64) / 255.0
                feats.append(arr.mean(axis=(0, 1)).ravel().tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, content_col).mapInPandas(extract, schema)
