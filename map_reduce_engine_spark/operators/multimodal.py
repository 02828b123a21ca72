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
