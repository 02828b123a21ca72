"""Multimodal column conventions + processing plumbing.

Convention (SURVEY.md §2 Part C): media payloads are opaque ``binary``
columns with a typed metadata struct beside them —

    payload   binary            -- raw bytes (image/audio/video/blob)
    media     struct<kind:string, mime:string, n_bytes:bigint, sha256:string>

Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so each
task processes a column batch of payloads without row-at-a-time pickling;
at 100 TB the payload column stays columnar on disk (parquet binary) and the
pipeline is scan → batch UDF → write, with metadata-only queries never
touching payload bytes (column pruning).

The actual media codecs (PIL/librosa/ffmpeg) are NOT in this environment —
decode bodies are stubbed behind ``MEDIA_DECODERS`` with a deterministic
fake; the Spark-side plumbing (schema, batching, partitioning) is real and
tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def attach_media_meta(df: DataFrame, payload_col: str, kind: str, mime: str, out: str = "media") -> DataFrame:
    """Derive the metadata struct from a binary payload column (JVM-side)."""
    p = F.col(payload_col)
    return df.withColumn(
        out,
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(mime).alias("mime"),
            F.length(p).cast("bigint").alias("n_bytes"),
            F.sha2(p, 256).alias("sha256"),
        ),
    )


def _fake_image_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real image-feature extractor.

    Real deployment: replace with PIL/torchvision decode + model features.
    The fake hashes the payload into a fixed-width pseudo-feature vector so
    the plumbing (batch shapes, schema, determinism) is fully testable.
    """
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:8]]


def _real_decode_unavailable(payload: bytes):
    raise NotImplementedError(
        "media codecs (PIL/librosa/ffmpeg) are not installed in this "
        "environment; wire a real decoder into MEDIA_DECODERS to enable"
    )


# Pluggable decode registry: swap the fake for a real codec in deployment.
MEDIA_DECODERS = {
    "fake": _fake_image_features,
    "image": _real_decode_unavailable,
    "audio": _real_decode_unavailable,
    "video": _real_decode_unavailable,
}


def extract_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    decoder: str = "fake",
    feature_dim: int = 8,
) -> DataFrame:
    """payload → feature vector via Arrow-batched mapInPandas.

    Output: (id, features: array<double>). Batches flow driver-free; the
    payload column is pruned out after extraction so downstream stages never
    reshuffle raw bytes.
    """
    decode = MEDIA_DECODERS[decoder]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "features": [decode(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def frame_sample_plan(df: DataFrame, id_col: str, payload_col: str, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing (decode stubbed).

    Emits one row per sampled frame index based on metadata only — the shape
    a real ffmpeg-backed sampler would produce. Demonstrates the explode
    pattern: one payload row → n frame rows, all JVM-side until decode.
    """
    n_frames = (F.length(F.col(payload_col)) / F.lit(1000)).cast("int") + 1  # fake frame count from size
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode.

    Real deployment: PIL ``Image.open(...).resize((w, h)).tobytes()``. The
    fake derives size-dependent bytes from (payload sha, target dims) so
    output width is deterministic and the batch plumbing is testable.
    """
    seed = hashlib.sha256(payload + f"{width}x{height}".encode()).digest()
    out_len = max(1, (width * height) // 64)
    return (seed * (out_len // len(seed) + 1))[:out_len]


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """payload → resized payload via Arrow-batched mapInPandas (decode stubbed).

    Output: (id, payload: binary, width, height) — the standard vision
    pre-processing step (resize to model input dims) as a columnar batch
    pass. At 100 TB the op is scan → batch UDF → write with NO shuffle at
    all (narrow transformation); partition sizing comes from the input
    splits, so executors stream batches without materializing whole files.
    """
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "payload": [_fake_resize(p, width, height) for p in pdf[payload_col]],
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def audio_chunk_plan(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    sample_rate: int = 16_000,
    bytes_per_sample: int = 2,
    chunk_seconds: int = 30,
) -> DataFrame:
    """Audio chunking plumbing (decode stubbed): one row per fixed-length
    window, with byte offsets a real PCM slicer would read.

    Metadata-only (length arithmetic + explode, all JVM-side): duration is
    derived from payload size, windows are half-open [start_s, end_s). The
    ASR-pipeline pre-step: 30 s windows feed speech models; byte ranges let
    the downstream decode read ONLY its slice of the blob.
    """
    bytes_per_sec = sample_rate * bytes_per_sample
    dur_s = (F.length(F.col(payload_col)) / F.lit(bytes_per_sec)).cast("double")
    n_chunks = F.ceil(dur_s / chunk_seconds).cast("int")
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))).alias("chunk_idx"),
        dur_s.alias("duration_s"),
    ).select(
        id_col,
        "chunk_idx",
        (F.col("chunk_idx") * chunk_seconds).alias("start_s"),
        F.least((F.col("chunk_idx") + 1) * F.lit(float(chunk_seconds)), F.col("duration_s")).alias("end_s"),
        (F.col("chunk_idx") * chunk_seconds * bytes_per_sec).cast("bigint").alias("byte_start"),
        F.least(
            ((F.col("chunk_idx") + 1) * F.lit(chunk_seconds) * bytes_per_sec).cast("bigint"),
            (F.col("duration_s") * bytes_per_sec).cast("bigint"),
        ).alias("byte_end"),
    )
