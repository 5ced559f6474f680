"""Validated engine configuration.

Reference parity: the reference validates required settings eagerly and
fails fast (``src/function_app.py:24-58`` — `_req/_req_int/_req_bool/_opt`
plus import-time checks). We do the same but at construction time, not
import time, and the values feed a SparkSession + writer options instead of
environment lookups inside the hot path (the reference re-reads env per
call, ``src/function_app.py:65,72`` — an anti-pattern we drop).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

_VALID_COMPRESSION = {"none", "uncompressed", "snappy", "gzip", "lzo", "lz4", "zstd"}


@dataclass(frozen=True)
class EngineConfig:
    """All knobs the engine consumes, validated on construction.

    Mirrors the reference's app settings (``infra/function-app.tf:76-99``):

    - ``max_batch_size``  ← MAX_BATCH_SIZE (prod 2000): max rows per output
      parquet file; mapped to Spark's ``maxRecordsPerFile``.
    - ``parquet_compression`` ← PARQUET_COMPRESSION (prod SNAPPY).
    - ``destination_fallback`` ← DESTINATION_FALLBACK (prod "assorted"):
      routing folder when a message has no usable Destination.
    - ``output_prefix`` ← OUTPUT_PREFIX (optional path prefix).
    """

    output_path: str = "/tmp/iotgp_lake"
    output_prefix: str = ""
    max_batch_size: int = 2000
    parquet_compression: str = "snappy"
    destination_fallback: str = "assorted"
    log_level: str = "WARN"
    # Spark tuning (local-mode defaults; a cluster deployment overrides).
    shuffle_partitions: int = 32
    session_timezone: str = "UTC"
    extra_spark_conf: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.output_path:
            raise ValueError("output_path is required")
        if self.max_batch_size <= 0:
            raise ValueError(f"max_batch_size must be > 0, got {self.max_batch_size}")
        if self.parquet_compression.lower() not in _VALID_COMPRESSION:
            raise ValueError(
                f"parquet_compression must be one of {sorted(_VALID_COMPRESSION)}, "
                f"got {self.parquet_compression!r}"
            )
        if not self.destination_fallback:
            raise ValueError("destination_fallback is required")
        if self.shuffle_partitions <= 0:
            raise ValueError("shuffle_partitions must be > 0")

    @classmethod
    def from_env(cls, **overrides) -> "EngineConfig":
        """Build from environment variables named like the reference's
        app settings; unset vars fall back to the dataclass defaults."""
        env = os.environ
        kwargs = {
            "output_path": env.get("OUTPUT_PATH", cls.output_path),
            "output_prefix": env.get("OUTPUT_PREFIX", cls.output_prefix),
            "max_batch_size": int(env.get("MAX_BATCH_SIZE", cls.max_batch_size)),
            "parquet_compression": env.get("PARQUET_COMPRESSION", cls.parquet_compression),
            "destination_fallback": env.get("DESTINATION_FALLBACK", cls.destination_fallback),
            "log_level": env.get("LOG_LEVEL", cls.log_level),
        }
        kwargs.update(overrides)
        return cls(**kwargs)
