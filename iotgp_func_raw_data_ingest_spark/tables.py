"""Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. We read with
explicit ``spark.read.parquet`` (no schema inference cost — parquet footers
carry the schema) and register temp views so both the DataFrame and SQL
surfaces can be exercised.

Scale note: at 100 TB each "table" would be a partitioned directory; the
loader takes any Hadoop-compatible path, and all queries in plans/ are
written against views, so swapping the storage layout touches only this
module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        # The driver has shipped events.ts under two parquet encodings so
        # far; normalize BOTH to a session-tz TIMESTAMP so every downstream
        # plan can rely on unix_micros(ts) / time-windowing semantics:
        #
        # - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; with
        #   spark.sql.legacy.parquet.nanosAsLong (set in session.py and
        #   plans.registry.prep) it arrives as epoch-nanos LongType.
        #   Convert ns → µs with integer division (double division would
        #   lose precision at 1.7e18) — test data is µs-aligned, so this
        #   is lossless and matches DuckDB to the microsecond.
        # - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
        #   TIMESTAMP_NTZ. Cast to TIMESTAMP: the wall-clock fields are
        #   reinterpreted in the session timezone, which registry.prep pins
        #   to UTC — identical instants to what DuckDB reads. Scale note:
        #   Spark 4 pushes comparison predicates THROUGH this cast into the
        #   parquet scan (verified: PushedFilters shows the ts bound with
        #   an NTZ literal), so the normalization costs a no-op projection,
        #   not a lost pushdown. The scan-level alternative
        #   (spark.sql.parquet.inferTimestampNTZ.enabled=false) would also
        #   retype orders/lineitem date columns mid-round; not worth it.
        field = dict((f.name, f.dataType) for f in df.schema.fields).get("ts")
        if isinstance(field, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(field, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view of the same name."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
