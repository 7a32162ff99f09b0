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


def _decode_gray_stub(payload: bytes) -> "pd.Series":
    """STUB image decode → 8×8 grayscale grid (real deployment:
    ``PIL.Image.open(...).convert('L').resize((8, 8))``). The fake
    treats the payload's own bytes AS the pixel grid (tiled/truncated
    to 64), so byte-level payload similarity carries through to pixel
    similarity — which is what lets the perceptual-hash pipeline be
    tested honestly on planted near-duplicates without an image lib.

    NULL/empty payloads decode to the all-zero grid (phash 0) — the
    same value any constant-pixel image hashes to — rather than
    crashing the executor task on ``b'' * 65 == b''``."""
    import numpy as np

    if not payload:
        payload = b"\x00"
    buf = (payload * (64 // max(1, len(payload)) + 1))[:64]
    return np.frombuffer(bytes(buf), dtype=np.uint8)


def ahash64(media: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) per image — a REAL perceptual-hash
    algorithm (mean-threshold the 8×8 grayscale grid; only the pixel
    decode underneath is the documented stub): bit i set iff pixel i is
    above the grid mean. Runs as one Arrow-batched ``mapInPandas``
    stage over the binary payloads; emits ``(media_id, phash)`` only —
    downstream joins never shuffle the payload bytes."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf["payload"]:
                g = _decode_gray_stub(p).astype(np.float64)
                bits = np.packbits((g > g.mean()).astype(np.uint8), bitorder="little")
                out.append(int(np.frombuffer(bits.tobytes(), dtype=np.int64)[0]))
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash": pd.array(out, dtype="int64")})

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(batches, "media_id long, phash long")


def phash_neardup_pairs(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-duplicate pairs: aHash fingerprints → byte-banded
    candidate join (full recall for hamming ≤ 7 by pigeonhole) → exact
    ``bit_count(xor)`` verify — the same banding machinery as text
    SimHash (``dedup.hash_neardup_pairs``), applied to the image hash.
    At 100 TB the payload bytes stay in the one decode stage; the
    near-dup join moves 16 bytes per image."""
    from .dedup import hash_neardup_pairs

    return hash_neardup_pairs(ahash64(media), "phash", "media_id", max_hamming)


def _pcm_stub(payload: bytes) -> "pd.Series":
    """STUB audio decode → int8-centered PCM samples (real deployment:
    ``librosa.load``/ffmpeg). The fake treats each payload byte as one
    sample offset by -128, so byte-level payload structure carries
    through to energy structure — NULL/empty payloads decode to one
    silent sample rather than crashing the task."""
    import numpy as np

    if not payload:
        payload = b"\x80"
    return np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int32) - 128


def audio_frame_energy(media: DataFrame, frame_samples: int = 16,
                       silence_rms_e4: int = 50_000) -> DataFrame:
    """Per-frame RMS energy over audio payloads — the energy/VAD
    segmentation primitive audio data prep runs first (silence
    trimming, speech-span detection). One Arrow-batched ``mapInPandas``
    stage: payload bytes stay in the decode stage, downstream sees only
    (media_id, frame_idx, n_samples, rms_e4, is_silence). The final
    partial frame is kept (real trailing audio). Energy is emitted as
    BIGINT e4 — exact, portable, sortable."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_id, out_fi, out_ns, out_rms = [], [], [], []
        for pdf in it:
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                s = _pcm_stub(p)
                for fi in range(0, len(s), frame_samples):
                    frame = s[fi : fi + frame_samples]
                    rms = math.sqrt(float((frame.astype("int64") ** 2).mean()))
                    out_id.append(mid)
                    out_fi.append(fi // frame_samples)
                    out_ns.append(len(frame))
                    out_rms.append(int(math.floor(rms * 10_000 + 0.5)))
            yield pd.DataFrame({
                "media_id": pd.array(out_id, dtype="int64"),
                "frame_idx": pd.array(out_fi, dtype="int32"),
                "n_samples": pd.array(out_ns, dtype="int32"),
                "rms_e4": pd.array(out_rms, dtype="int64"),
            })
            out_id, out_fi, out_ns, out_rms = [], [], [], []

    frames = media.filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(
        batches, "media_id long, frame_idx int, n_samples int, rms_e4 long"
    )
    return frames.withColumn("is_silence", F.col("rms_e4") < silence_rms_e4)
