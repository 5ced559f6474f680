"""Registry mapping query names to Spark builders + DuckDB oracle SQL.

Determinism contract (driver compares row-count + schema + order-insensitive
value-hash between Spark and DuckDB):

- Column names must match exactly → alias every computed column BOTH sides.
- Floating aggregates (sum/avg over doubles) differ between engines at the
  ~1e-12 relative level because summation order differs → both sides ROUND
  to 2 decimals. Raw doubles read from parquet (no arithmetic) are exact.
- Top-k queries always order by a unique key as the final tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query builder and (optionally) its oracle SQL.

    Queries with no SQL-expressible oracle (LSH similarity, streaming
    state) pass ``oracle=None`` → the driver records a rows-only check.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def prep(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Per-query session prep: pin UTC timestamp semantics (the driver owns
    the SparkSession — don't assume its timezone) and load + register the
    test tables as temp views."""
    from iotgp_func_raw_data_ingest_spark.tables import register_views

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet stores TIMESTAMP(NANOS) — see tables.load_table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return register_views(spark, sf_dir)
