"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a typed metadata struct; decode/feature-extraction run as Arrow-batched
``mapInPandas`` stages so one partition streams through Python in
bounded batches. The decode kernels themselves are STUBBED (no
image/audio libraries in this container) behind deterministic fakes —
the Spark-side contract (schema, batch iteration, partitioning) is
real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # image | audio | video
    T.StructField("payload", T.BinaryType()),       # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),  # 16-dim fake embedding
])


def synth_media(spark, n: int = 64, parts: int = 4) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(0, n, 1, parts)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.abs(F.xxhash64("id", F.lit("kind"))) % 3 + 1).cast("int"),
    )
    payload = F.sha2(F.concat(F.lit("media-"), F.col("id").cast("string")), 256).cast("binary")
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            (F.abs(F.xxhash64("id", F.lit("w"))) % 1920 + 1).cast("int").alias("width"),
            (F.abs(F.xxhash64("id", F.lit("h"))) % 1080 + 1).cast("int").alias("height"),
            (F.abs(F.xxhash64("id", F.lit("d"))) % 60000).cast("int").alias("duration_ms"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB decode kernel. Real deployment would call PIL/librosa/ffmpeg
    here; this container has none, so we derive a deterministic 16-dim
    feature from a sha256 of the payload. Raise NotImplementedError to
    surface accidental use as a real decoder.
    """
    h = hashlib.sha256(payload + kind.encode()).digest()
    return [b / 255.0 for b in h[:16]]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams bounded pandas batches per partition — the
    pattern a real image-decode stage would use (batch-size-bounded
    memory, no row-at-a-time Python dispatch for the surrounding plan).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "feature": feats,
            })

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def _resize_stub(payload: bytes, w: int, h: int, target_w: int, target_h: int) -> bytes:
    """STUB resize kernel (real deployment: PIL.Image.resize). The fake
    derives deterministic bytes from the payload + target dims so tests
    can assert the plumbing without an image library."""
    return hashlib.sha256(payload + f"{w}x{h}->{target_w}x{target_h}".encode()).digest()


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ])),
])


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Image resize over ``mapInPandas`` bounded batches: non-image rows
    are filtered out JVM-side *before* Python (pushdown keeps the Arrow
    transfer to the rows that need decoding); output metadata carries
    the new dimensions."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": [
                    _resize_stub(p, m["width"], m["height"], target_w, target_h)
                    for p, m in zip(pdf["payload"], pdf["meta"])
                ],
                "meta": [
                    {
                        "width": target_w,
                        "height": target_h,
                        "duration_ms": m["duration_ms"],
                        "codec": m["codec"],
                    }
                    for m in pdf["meta"]
                ],
            })
            yield out

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload", "meta"
    ).mapInPandas(batches, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video into frame
    timestamps (explode) — the decode of each frame is the stubbed
    kernel. Shows the explode-then-decode shape used at scale."""
    frames = F.sequence(
        F.lit(0), F.greatest((F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0))
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.posexplode(frames).alias("frame_idx", "_"),)
        .select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("frame_ms"))
    )
