"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the media itself is an opaque
``binary`` column (or a pointer to object storage) with a typed metadata
struct alongside; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each task processes a column batch of blobs without
JVM↔Python per-row overhead.

The decode step is STUBBED here — this container has no image/audio
libraries. ``decode_image_features`` tries to import PIL and, absent
that, emits a deterministic fake feature vector derived from the bytes.
The Spark-side plumbing (schema, batch iteration, partitioning) is real
and tested; swapping in a real decoder changes only ``_decode_one``.
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
