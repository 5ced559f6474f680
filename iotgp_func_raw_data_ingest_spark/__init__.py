"""iotgp_func_raw_data_ingest_spark — a PySpark-native analytics engine.

A brand-new engine with the query / data-processing capabilities of the
reference IoT raw-data ingest pipeline (`spazemail/iotgp-func-raw-data-ingest`,
see SURVEY.md), re-expressed Spark-first:

- **Ingest surface**: envelope decode → decompress → parse → normalize →
  route → partitioned Parquet lake, runnable both on static DataFrames and
  under Structured Streaming (reference parity: src/function_app.py).
- **Query surface**: a full relational operator set (scans, joins, aggs,
  windows, sorts, set ops, scalar functions) over the lake and the driver's
  TPC-H-ish tables, plus LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) designed for 100 TB scale.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join selection, and whole-stage codegen; Python touches data only through
Arrow-batched Pandas UDFs in the few spots Spark lacks a builtin
(deflate/zlib decompression, vectorized cosine top-k).
"""

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.session import get_spark
from iotgp_func_raw_data_ingest_spark.tables import TABLE_NAMES, load_tables, register_views

__all__ = [
    "EngineConfig",
    "get_spark",
    "TABLE_NAMES",
    "load_tables",
    "register_views",
]

__version__ = "0.1.0"
