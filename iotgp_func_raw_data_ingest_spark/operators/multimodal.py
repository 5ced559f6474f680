"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the media itself is an opaque
``binary`` column (or a pointer to object storage) with a typed metadata
struct alongside; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each task processes a column batch of blobs without
JVM↔Python per-row overhead.

Decoding: REAL for binary PPM (P6), uncompressed 24-bit BMP, and PCM
WAV — ``decode_image_array`` / ``decode_audio_array`` parse those
formats with numpy + stdlib alone (no media library needed; byte-exact
tests in tests/test_multimodal_decode.py) and ``extract_features_real``
emits true pixel/sample-statistics features for them. Formats that
genuinely need a media library (JPEG/PNG/MP3/video) stay behind the
``_real_decoder`` deployment hook with a deterministic byte-derived
fallback, and the DEFAULT ``extract_features`` keeps that fallback for
everything so gate-verified outputs never depend on which decoders an
environment happens to have.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("n_bytes", LongType()),
                    StructField("content_hash", StringType()),
                    StructField("source_uri", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata struct computed JVM-side from the binary payload."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.length(p).cast("long").alias("n_bytes"),
            F.md5(p).alias("content_hash"),
            F.concat(F.lit("synthetic://"), F.col("media_id").cast("string")).alias("source_uri"),
        ),
    )


def _real_decoder():
    """Deployment hook: return a ``(payload, kind) -> list[float]`` decoder
    or None. A real deployment wires PIL/torchaudio/pyav here; merely
    importing a decode lib is NOT enough to pick resize/normalize policy,
    so this deliberately returns None until explicitly configured (and a
    PIL-present environment must not change results — see test)."""
    return None


def _decode_one(payload: bytes, kind: str) -> list[float]:
    """STUB decoder. Uses ``_real_decoder()`` when a deployment wires one;
    otherwise a deterministic pseudo-feature vector from a sha256 of the
    bytes so the distributed plumbing is fully exercisable."""
    decoder = _real_decoder()
    if decoder is not None:
        return decoder(payload, kind)
    digest = hashlib.sha256(payload or b"").digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame) -> DataFrame:
    """Binary payloads → fixed-dim feature vectors via mapInPandas.

    Arrow batches stream through Python; output schema is fixed so the
    downstream plan (similarity search over `features`) is fully typed.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "features": [
                        _decode_one(b, k) for b, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _batches, schema=FEATURES_SCHEMA
    )


def frame_sample(media: DataFrame, n_frames: int = 4, frame_bytes: int = 16) -> DataFrame:
    """'Video' frame sampling pattern: slice the payload into n evenly
    spaced fixed-size windows, one output row per frame — JVM-side
    (substring on binary), no Python. A real decoder would replace the
    byte slicing with keyframe extraction; the explode/partition shape is
    identical."""
    p = F.col("payload")
    # explicit floor: Spark's double→int cast truncates but other engines
    # round — floor is unambiguous and SQL-replayable
    step = F.greatest(F.floor(F.length(p) / n_frames).cast("int"), F.lit(1))
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.struct(
            i.cast("int").alias("frame_no"),
            F.substring(p, (i * step + 1).cast("int"), frame_bytes).alias("frame_bytes"),
        ),
    )
    return media.select(
        "media_id", "kind", F.explode(frames).alias("frame")
    ).select(
        "media_id",
        "kind",
        F.col("frame.frame_no").alias("frame_no"),
        F.col("frame.frame_bytes").alias("frame_payload"),
    )


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: document text bytes as the payload
    (kind round-robins image/audio/video). Lets every multimodal operator
    run on the driver's tables without binary test data."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
    )


# ---------------------------------------------------------------------------
# Real decoders for container-friendly formats
# ---------------------------------------------------------------------------
#
# PIL-class libraries are absent here, but two real image formats are
# decodable with numpy alone: binary PPM (P6) and uncompressed 24-bit
# BMP. This makes the decode stage REAL for those formats — header
# parse, pixel extraction, channel statistics — while JPEG/PNG remain
# behind the _real_decoder deployment hook. Opt-in (use_real_decoders)
# so the default pipeline stays byte-identical to the gate-verified
# behavior.


def decode_image_array(payload: bytes):
    """Decode a P6 PPM or uncompressed 24-bit BMP into an (H, W, 3)
    uint8 numpy array; None for anything else (unsupported without a
    real imaging library)."""
    import numpy as np

    if payload is None or len(payload) < 16:
        return None
    if payload[:2] == b"P6":
        # header: magic, width, height, maxval as whitespace-separated
        # tokens (comments '#...' allowed), then one whitespace byte and
        # raw RGB data
        tokens: list[bytes] = []
        i = 2
        while len(tokens) < 3 and i < len(payload):
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":  # comment to end of line
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
                continue
            start = i
            while i < len(payload) and not payload[i : i + 1].isspace():
                i += 1
            tokens.append(payload[start:i])
        i += 1  # the single whitespace after maxval
        try:
            w, h, maxval = (int(t) for t in tokens)
        except (ValueError, TypeError):
            return None
        if maxval != 255 or w <= 0 or h <= 0:
            return None
        need = w * h * 3
        data = payload[i : i + need]
        if len(data) < need:
            return None
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if payload[:2] == b"BM":
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or compression != 0 or w <= 0 or h == 0:
            return None
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = (w * 3 + 3) // 4 * 4  # rows padded to 4 bytes
        if off + stride * h > len(payload):
            return None
        rows = np.frombuffer(
            payload[off : off + stride * h], dtype=np.uint8
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if flip:
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR -> RGB
    return None


def image_stats_features(payload: bytes) -> list[float] | None:
    """Real 8-dim feature vector from a decodable image: width, height,
    per-channel means, grayscale std, aspect ratio — the shape a
    downstream similarity index consumes. None if undecodable."""
    arr = decode_image_array(payload)
    if arr is None:
        return None
    import numpy as np

    h, w = float(arr.shape[0]), float(arr.shape[1])
    means = arr.reshape(-1, 3).mean(axis=0)
    gray = arr.astype(np.float64).mean(axis=2)
    return [
        w,
        h,
        float(means[0]),
        float(means[1]),
        float(means[2]),
        float(gray.std()),
        w / h,
        float(gray.mean()),
    ]


def extract_features_real(media: DataFrame) -> DataFrame:
    """extract_features with the real PPM/BMP decode path: images that
    decode get true pixel-statistics features; everything else falls
    back to the deterministic stub (so mixed corpora still produce a
    complete, fixed-schema feature table). Same mapInPandas shape — the
    Spark plan is identical to the stubbed path."""
    import pandas as pd  # noqa: F811 - local to the executor closure

    def _one(payload, kind):
        if kind == "image":
            feats = image_stats_features(payload)
            if feats is not None:
                return feats
        if kind == "audio":
            feats = audio_stats_features(payload)
            if feats is not None:
                return feats
        return _decode_one(payload, kind)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "features": [
                        _one(b, k) for b, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _batches, schema=FEATURES_SCHEMA
    )


def decode_audio_array(payload: bytes):
    """Decode an uncompressed PCM WAV (8/16-bit) into (samples, channels)
    float64 in [-1, 1] plus the sample rate — stdlib ``wave`` + numpy,
    no audio library needed. Returns (array, rate) or None."""
    import io
    import wave

    import numpy as np

    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(payload)) as w:
            n, ch, width, rate = (
                w.getnframes(), w.getnchannels(), w.getsampwidth(), w.getframerate()
            )
            raw = w.readframes(n)
    except Exception:
        return None
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        return None
    if ch > 1:
        arr = arr.reshape(-1, ch)
    else:
        arr = arr.reshape(-1, 1)
    return arr, rate


def audio_stats_features(payload: bytes) -> list[float] | None:
    """Real 8-dim audio features from a decodable WAV: duration_s,
    sample rate, channels, RMS, peak, zero-crossing rate, DC offset,
    dynamic range. None if undecodable."""
    decoded = decode_audio_array(payload)
    if decoded is None:
        return None
    import numpy as np

    arr, rate = decoded
    mono = arr.mean(axis=1)
    n = len(mono)
    if n == 0:
        return None
    zc = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / max(n - 1, 1)
    return [
        n / float(rate),
        float(rate),
        float(arr.shape[1]),
        float(np.sqrt((mono**2).mean())),
        float(np.abs(mono).max()),
        zc,
        float(mono.mean()),
        float(mono.max() - mono.min()),
    ]
