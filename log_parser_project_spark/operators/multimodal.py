"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a typed metadata struct; decode/feature-extraction run as Arrow-batched
``mapInPandas`` stages so one partition streams through Python in
bounded batches. Decode kernels dispatch on the payload's container
magic: RIFF/WAVE audio decodes for REAL via the stdlib ``wave`` module
(always available), PNG/JPEG images decode via PIL behind an import
guard (raising loudly when the payload is a real image but no decoder
is installed — silent fallback would fake pixel similarity); payloads
with no known magic take the deterministic fake path, which is what
the synthetic tables use so the Spark-side contract (schema, batch
iteration, partitioning) stays testable in this container.
"""

from __future__ import annotations

import hashlib
import io
import math
import wave
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


def _pil_image():
    """PIL import guard: returns ``PIL.Image`` or None. Image payloads
    are only decoded for real when the library exists; the caller
    decides whether its absence is an error (real image payload) or
    fine (fake payload path)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _image_magic(payload: bytes) -> bool:
    return payload[:4] == b"\x89PNG" or payload[:3] == b"\xff\xd8\xff"


def _wav_magic(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def make_wav(samples, rate: int = 8000, sampwidth: int = 2, channels: int = 1) -> bytes:
    """Encode int PCM ``samples`` (iterable; int16 range for
    sampwidth=2, 0..255 for sampwidth=1) as a real WAV container —
    stdlib only, used by tests and by any caller synthesizing audio
    fixtures. Interleaved when ``channels`` > 1."""
    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        a = np.asarray(list(samples))
        w.writeframes(
            a.astype("<i2").tobytes() if sampwidth == 2
            else a.astype(np.uint8).tobytes()
        )
    return buf.getvalue()


def _decode_feature(payload: bytes, kind: str) -> list[float]:
    """16-dim feature per payload, dispatched on container magic:

    - RIFF/WAVE audio → REAL decode (stdlib ``wave``): 16 equal-segment
      RMS values over the PCM, normalized to [0, 1] by int16 full scale.
    - PNG/JPEG image → REAL decode via PIL when installed (4×4 grayscale
      grid / 255); loud error when the payload is a real image but no
      decoder exists.
    - anything else (the synthetic tables' seeded bytes) → the
      deterministic fake: sha256-derived values, which keeps the
      Spark-side plumbing testable with no media libraries installed.
    """
    import numpy as np

    if _wav_magic(payload):
        s = _pcm_decode(payload).astype(np.float64)
        segs = np.array_split(s, 16) if len(s) >= 16 else [s] * 16
        return [
            float(min(1.0, math.sqrt((seg**2).mean()) / 32768.0)) if len(seg) else 0.0
            for seg in segs
        ]
    if _image_magic(payload):
        img = _pil_image()
        if img is None:
            raise RuntimeError(
                "payload is a real PNG/JPEG but no image decoder (PIL) is "
                "installed — refusing to fake pixel features"
            )
        g = np.asarray(
            img.open(io.BytesIO(bytes(payload))).convert("L").resize((4, 4)),
            dtype=np.float64,
        )
        return [float(v / 255.0) for v in g.ravel()]
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
                _decode_feature(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "feature": feats,
            })

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def _resize_kernel(payload: bytes, w: int, h: int, target_w: int, target_h: int) -> bytes:
    """Resize kernel. Real PNG/JPEG payloads resize via PIL when
    installed (re-encoded as PNG; loud error otherwise — see
    ``_decode_feature``); payloads with no image magic take the
    deterministic fake (sha256 of payload + dims) so the plumbing is
    testable with no image library."""
    if _image_magic(payload):
        img = _pil_image()
        if img is None:
            raise RuntimeError(
                "payload is a real PNG/JPEG but no image decoder (PIL) is "
                "installed — refusing to fake a resize"
            )
        out = io.BytesIO()
        img.open(io.BytesIO(bytes(payload))).resize((target_w, target_h)).save(
            out, format="PNG"
        )
        return out.getvalue()
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
                    _resize_kernel(p, m["width"], m["height"], target_w, target_h)
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


def _decode_gray(payload: bytes) -> "pd.Series":
    """Image decode → 8×8 grayscale grid. Real PNG/JPEG payloads decode
    via PIL (``convert('L').resize((8, 8))``) behind the import guard
    (loud error when absent — faking pixels for a real image would
    fabricate similarity); payloads with no image magic take the
    deterministic fake, which treats the payload's own bytes AS the
    pixel grid (tiled/truncated to 64), so byte-level payload
    similarity carries through to pixel similarity — what lets the
    perceptual-hash pipeline be tested honestly on planted
    near-duplicates without an image lib.

    NULL/empty payloads decode to the all-zero grid (phash 0) — the
    same value any constant-pixel image hashes to — rather than
    crashing the executor task on ``b'' * 65 == b''``."""
    import numpy as np

    if payload and _image_magic(payload):
        img = _pil_image()
        if img is None:
            raise RuntimeError(
                "payload is a real PNG/JPEG but no image decoder (PIL) is "
                "installed — refusing to fake pixels"
            )
        return np.asarray(
            img.open(io.BytesIO(bytes(payload))).convert("L").resize((8, 8)),
            dtype=np.uint8,
        ).ravel()
    if not payload:
        payload = b"\x00"
    buf = (payload * (64 // max(1, len(payload)) + 1))[:64]
    return np.frombuffer(bytes(buf), dtype=np.uint8)


def ahash64(media: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) per image — a REAL perceptual-hash
    algorithm (mean-threshold the 8×8 grayscale grid; pixel decode is
    real for PNG/JPEG+PIL, deterministic fake otherwise — see
    ``_decode_gray``): bit i set iff pixel i is
    above the grid mean. Runs as one Arrow-batched ``mapInPandas``
    stage over the binary payloads; emits ``(media_id, phash)`` only —
    downstream joins never shuffle the payload bytes."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf["payload"]:
                g = _decode_gray(p).astype(np.float64)
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


def _pcm_decode(payload: bytes) -> "pd.Series":
    """Audio decode → int32 PCM samples. RIFF/WAVE payloads decode for
    REAL via the stdlib ``wave`` module (PCM 8/16-bit, any channel
    count — multi-channel averages to mono, the energy convention);
    payloads with no WAV magic take the deterministic fake (each byte
    one sample offset by -128), keeping byte-level payload structure
    visible as energy structure for the synthetic tables. NULL/empty
    payloads decode to one silent sample rather than crashing the
    task."""
    import numpy as np

    if payload and _wav_magic(payload):
        with wave.open(io.BytesIO(bytes(payload))) as w:
            nch, sw = w.getnchannels(), w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if sw == 2:
            s = np.frombuffer(raw, dtype="<i2").astype(np.int32)
        elif sw == 1:
            # WAV 8-bit is unsigned; center like the fake path
            s = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
        else:
            raise ValueError(f"unsupported WAV sample width: {sw} bytes")
        if nch > 1:
            s = s[: len(s) - len(s) % nch].reshape(-1, nch).mean(axis=1)
            s = np.rint(s).astype(np.int32)
        return s if len(s) else np.zeros(1, dtype=np.int32)
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

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_id, out_fi, out_ns, out_rms = [], [], [], []
        for pdf in it:
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                s = _pcm_decode(p)
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
