"""Query plans: the engine's public query surface.

Every operator the engine claims is registered here twice:

- ``QUERIES[name]`` — a callable ``(spark, sf_dir) -> DataFrame`` building
  the Spark plan (DataFrame API or spark.sql).
- ``ORACLES[name]`` — an equivalent ANSI-SQL string runnable by DuckDB on
  the same parquet tables, used by the driver's correctness gate.

Names are stable; ``__spark_entry__.py`` re-exports both dicts.
"""

from iotgp_func_raw_data_ingest_spark.plans.registry import ORACLES, QUERIES, register

# Importing these modules populates the registry.
from iotgp_func_raw_data_ingest_spark.plans import relational  # noqa: E402,F401
from iotgp_func_raw_data_ingest_spark.plans import relational2  # noqa: E402,F401
from iotgp_func_raw_data_ingest_spark.plans import relational3  # noqa: E402,F401
from iotgp_func_raw_data_ingest_spark.plans import relational4  # noqa: E402,F401
from iotgp_func_raw_data_ingest_spark.plans import relational5  # noqa: E402,F401
from iotgp_func_raw_data_ingest_spark.plans import relational6  # noqa: E402,F401
from iotgp_func_raw_data_ingest_spark.plans import llm_ops  # noqa: E402,F401
from iotgp_func_raw_data_ingest_spark.plans import ingest_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
