"""SparkSession construction with scale-aware defaults.

Design notes for the 100 TB target (tested on local[32]):

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy switches replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is only the AQE *initial* value; on a
  real cluster set it ~2-3× total cores and let AQE coalesce.
- Arrow enabled for every Python<->JVM exchange (pandas UDFs, toPandas).
- UTC session timezone so timestamp semantics match the DuckDB oracle and
  are cluster-location-independent.
- Parquet writes default to snappy (reference parity,
  ``infra/function-app.tf:83``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from iotgp_func_raw_data_ingest_spark.config import EngineConfig


def get_spark(
    app_name: str = "iotgp_func_raw_data_ingest_spark",
    config: EngineConfig | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster pass None and let spark-submit supply it.
    """
    cfg = config or EngineConfig()
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", cfg.session_timezone)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", cfg.parquet_compression)
        .config("spark.sql.parquet.filterPushdown", "true")
        # TESTDATA's events.parquet stores TIMESTAMP(NANOS); read as long
        # and convert in tables.load_table (Spark has no ns timestamps).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in cfg.extra_spark_conf.items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(cfg.log_level)
    return spark
