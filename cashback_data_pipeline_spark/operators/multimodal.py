"""Multimodal column plumbing — image/audio/video as opaque binary.

Design for 100 TB multimodal corpora (north-star):

- payloads are ``BinaryType`` columns with a typed metadata struct
  (modality, mime, width/height/duration, byte size) so Catalyst can
  filter/prune on metadata WITHOUT touching payload bytes;
- heavy per-item work (decode, resize, frame-sample, feature-extract)
  runs as Arrow-batched ``mapInPandas`` over payload+id ONLY — select
  the minimum columns into the UDF so the parquet reader never
  materializes payloads for metadata-only queries;
- actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container: the
  decode kernels below are deterministic fakes behind the same
  signatures, and ``decode_image_real`` raises NotImplementedError with
  the dependency note. The Spark-side plumbing — schemas, batch shapes,
  partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), False),
                ]
            ),
            False,
        ),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, feature array<float>, payload_sha string"


def attach_byte_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata columns computable without decoding: byte length + sha256
    (dedup key for binary payloads) — both codegen'd builtins."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "payload_sha", F.sha2(F.col(payload_col), 256)
    )


def dedup_binary_exact(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Exact binary dedup: group on sha256(payload) — the shuffle carries
    64-char digests, never payloads (same shape as text exact dedup)."""
    from cashback_data_pipeline_spark.operators.dedup import dedup_exact

    hashed = df.withColumn("__sha", F.sha2(F.col(payload_col), 256))
    return dedup_exact(hashed, ["__sha"], id_col).drop("__sha")


def decode_image_real(payload: bytes) -> "object":
    """Real image decode — requires an imaging library not present in
    this container. Cite: would be PIL.Image.open(io.BytesIO(payload));
    plug it into extract_features' kernel when available."""
    raise NotImplementedError("image codec not available in this environment (needs PIL/opencv)")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: sha256 bytes → dim floats in
    [0, 1). Stable across runs/engines — lets the distributed plumbing be
    tested end-to-end without codecs."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload", dim: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes.

    The real pipeline swaps ``_fake_feature`` for decode+model inference;
    the batch shape (mapInPandas over minimal columns, feature as
    array<float>) is the production plan either way."""
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "feature": pdf[payload_col].map(lambda p: _fake_feature(p, dim)),
                    "payload_sha": pdf[payload_col].map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling PLAN: explode each video row into (media_id,
    frame_ts_ms) rows from metadata only — the decode of each sampled
    frame is then an extract_features call on the exploded set. Pure
    relational fan-out; payload untouched until the per-frame kernel."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("modality") == "video")
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                    lambda i: i * every_ms,
                )
            ).alias("frame_ts_ms"),
        )
    )
