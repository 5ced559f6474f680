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


class LazyTables:
    """Dict-like table accessor that loads (and registers as a temp view)
    each table on first access — a query touching 2 tables pays 2 parquet
    footer reads, not 10. Queries built with spark.sql over views must
    touch the views they need (``t["lineitem"]``) before calling sql()."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self._cache:
            from iotgp_func_raw_data_ingest_spark.tables import load_table

            df = load_table(self._spark, self._sf_dir, name)
            df.createOrReplaceTempView(name)
            self._cache[name] = df
        return self._cache[name]


def prep(spark: SparkSession, sf_dir: str) -> LazyTables:
    """Per-query session prep: pin UTC timestamp semantics (the driver owns
    the SparkSession — don't assume its timezone) and expose the test
    tables as a lazy loader."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet stores TIMESTAMP(NANOS) — see tables.load_table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return LazyTables(spark, sf_dir)
