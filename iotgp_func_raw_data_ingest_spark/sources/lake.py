"""Parquet-lake sink for routed ingest rows (reference R2-R5, Spark-first).

The reference groups messages by (folder, source_db, table) in a Python
dict, merges columns by union-with-null-padding, slices into
MAX_BATCH_SIZE chunks, and uploads one parquet per chunk
(src/function_app.py:336-414). Spark replaces all of that with built-ins:

- grouping/routing  → ``partitionBy("folder", "source_db", "table")``
  (a hash shuffle on exactly the reference's routing key);
- chunking          → ``option("maxRecordsPerFile", max_batch_size)``;
- union-of-keys     → map column (generic mode) or per-route projection
  (typed mode), instead of manual null-padding;
- atomic visibility → Spark's commit protocol (strictly better than the
  reference's non-atomic ``overwrite=True`` blob puts, :230).

Two write modes:

- **generic**: one distributed write of the full batch; rows stay
  ``map<string,string>``. Scales to any number of routes; schema
  evolution is free (new keys are just new map entries).
- **typed** (reference-parity layout): per route, project the union of
  observed keys to real columns and write row-per-record parquet under
  ``folder/source_db/table/``. Route cardinality = number of logical
  tables (small); each per-route write is still fully distributed.
  Written with mergeSchema-friendly parquet so later batches may add
  columns (the reference's per-batch union-of-keys schema drift,
  SURVEY.md §7.4).

Divergences from the reference, recorded: row-per-record parquet instead
of the single-row LIST<STRING> layout (queryable, prunable; SURVEY.md
§1.5), Spark part-file naming instead of wall-clock filenames (§7.4),
sorted column order instead of first-seen (distributed first-seen is
non-deterministic).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig


def write_lake_generic(routed: DataFrame, cfg: EngineConfig, path: str | None = None) -> str:
    """One distributed partitioned write; rows stay map<string,string>."""
    target = path or cfg.output_path
    (
        routed.write.mode("append")
        .option("maxRecordsPerFile", cfg.max_batch_size)
        .option("compression", cfg.parquet_compression)
        .partitionBy("folder", "source_db", "table")
        .parquet(target)
    )
    return target


def routed_keys(routed: DataFrame) -> dict[tuple[str, str, str], list[str]]:
    """Union of observed row keys per route — the distributed equivalent of
    the reference's `_merge_columnars` key union (:177-191). One Spark job;
    output size = (#routes × #columns), tiny by construction."""
    rows = (
        routed.select("folder", "source_db", "table", F.explode(F.map_keys("row")).alias("k"))
        .distinct()
        .collect()
    )
    out: dict[tuple[str, str, str], list[str]] = {}
    for r in rows:
        out.setdefault((r.folder, r.source_db, r.table), []).append(r.k)
    return {route: sorted(ks) for route, ks in out.items()}


def write_lake_typed(
    routed: DataFrame,
    cfg: EngineConfig,
    path: str | None = None,
    failed_routes: list[tuple[tuple[str, str, str], str]] | None = None,
) -> list[str]:
    """Reference-parity layout: one directory per route with real string
    columns (union of keys, missing → null) and ≤ max_batch_size rows per
    file. Returns the written directories.

    Per-route catch-continue (reference E2, src/function_app.py:416-417):
    a poison route (e.g. a row key that is an invalid parquet column name)
    is skipped with a warning and the remaining routes are still written.
    Pass ``failed_routes`` to receive ``(route, error)`` for each failure.
    """
    target = (path or cfg.output_path).rstrip("/")
    if cfg.output_prefix:
        target = f"{target}/{cfg.output_prefix.strip('/')}"
    keysets = routed_keys(routed)
    if keysets:
        routed = routed.cache()
    written: list[str] = []
    try:
        for (folder, source_db, table), keys in keysets.items():
            dest = f"{target}/{folder}/{source_db}/{table}"
            part = routed.filter(
                (F.col("folder") == folder)
                & (F.col("source_db") == source_db)
                & (F.col("table") == table)
            )
            projected = part.select(
                *[F.col("row").getItem(k).alias(k) for k in keys]
            )
            try:
                (
                    projected.write.mode("append")
                    .option("maxRecordsPerFile", cfg.max_batch_size)
                    .option("compression", cfg.parquet_compression)
                    .parquet(dest)
                )
            except Exception as exc:  # noqa: BLE001 - route isolation
                warnings.warn(
                    f"route {(folder, source_db, table)} failed, continuing: {exc}",
                    stacklevel=2,
                )
                if failed_routes is not None:
                    failed_routes.append(((folder, source_db, table), str(exc)))
                continue
            written.append(dest)
    finally:
        if keysets:
            routed.unpersist()
    return written


def read_lake_table(
    spark: SparkSession, lake_path: str, folder: str, source_db: str, table: str
) -> DataFrame:
    """Read one logical table back, merging schemas across batches (the
    reference's per-batch union-of-keys drift is resolved at read time)."""
    return spark.read.option("mergeSchema", "true").parquet(
        f"{lake_path.rstrip('/')}/{folder}/{source_db}/{table}"
    )
