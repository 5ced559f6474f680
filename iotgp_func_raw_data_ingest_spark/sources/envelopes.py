"""Envelope sources: raw event bodies as a DataFrame/stream of `body` rows.

The reference consumes Event Hub events (src/function_app.py:302-310). In
Spark that surface is:

- production: ``spark.readStream.format("kafka")`` against Event Hubs'
  Kafka-compatible endpoint (value → CAST AS STRING = the body);
- local/dev & tests: text/json file sources or an in-memory list.

Each returns a DataFrame with a single ``body: string`` column feeding
``operators.ingest.ingest_pipeline``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

BODY_SCHEMA = StructType([StructField("body", StringType())])


def envelopes_from_list(spark: SparkSession, bodies: list[str]) -> DataFrame:
    """Test/dev source: in-memory event bodies."""
    return spark.createDataFrame([(b,) for b in bodies], BODY_SCHEMA)


def envelopes_from_text(spark: SparkSession, path: str) -> DataFrame:
    """One event body per line (newline-delimited raw bodies)."""
    return spark.read.text(path).select(F.col("value").alias("body"))


def envelopes_from_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Streaming source: Kafka surface (works for Event Hubs' Kafka
    endpoint). Body = value bytes decoded as UTF-8 — reference S2
    (`azeventhub.get_body().decode("utf-8")`, src/function_app.py:319)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("body"))
    )


def envelopes_stream_from_text(spark: SparkSession, path: str) -> DataFrame:
    """Streaming file source for local dev: drop newline-delimited body
    files into ``path`` and they are ingested exactly-once."""
    # text source with an explicit single-field schema names the column
    # after the schema field — already `body`.
    return spark.readStream.schema(BODY_SCHEMA).format("text").load(path)
