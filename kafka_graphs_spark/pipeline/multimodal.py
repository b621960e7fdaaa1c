"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct. The Spark-side plumbing (schema, Arrow batching,
mapInPandas signatures, partition sizing) is real and tested; the actual
codec calls are STUBBED — the decode libraries (PIL/ffmpeg/librosa) are
not in this container. Each stub either raises NotImplementedError
(``strict=True``) or produces a deterministic fake derived from the bytes,
so pipelines are end-to-end runnable and cross-engine verifiable.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURE_DIM = 8


def attach_media(df: DataFrame, id_col: str, payload_col, media_type: str) -> DataFrame:
    """Wrap an id + binary payload into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload_col.cast("binary").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> list:
    """Deterministic stand-in for a codec: md5 bytes → FEATURE_DIM floats.

    Mirrored by SQL oracle (md5 hex pairs → [0,1) floats) so the whole
    binary pipeline is correctness-checked without real codecs.
    """
    import hashlib

    digest = hashlib.md5(payload).digest()
    return [digest[i] / 256.0 for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """(media_id, media_type, features array<double>) via Arrow-batched decode.

    The real implementation would decode payloads (PIL/torchaudio/ffmpeg)
    inside this same mapInPandas: one Python worker per partition, Arrow
    batch transfer, no per-row overhead. ``strict=True`` raises, marking
    the codec boundary explicitly.
    """
    if strict:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "run with strict=False for the deterministic fake decoder"
        )

    def decode_batches(it: Iterator):
        import pandas as pd

        for pdf in it:
            feats = pdf["payload"].map(lambda p: _fake_decode(bytes(p)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return media.mapInPandas(
        decode_batches, schema="media_id long, media_type string, features array<double>"
    )


def resize_images(media: DataFrame, width: int, height: int, strict: bool = True) -> DataFrame:
    """Stub: image resize. Raises unless strict=False (identity passthrough)."""
    if strict:
        raise NotImplementedError("image resize requires PIL — not in this container")
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def sample_frames(media: DataFrame, every_ms: int, strict: bool = True) -> DataFrame:
    """Stub: video frame sampling. Schema contract only."""
    if strict:
        raise NotImplementedError("video decode requires ffmpeg — not in this container")
    return media.select(
        "media_id",
        F.explode(F.array(F.lit(0))).alias("frame_idx"),
        F.col("payload").alias("frame_payload"),
    )
