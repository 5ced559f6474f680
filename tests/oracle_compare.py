"""Local replica of the driver's Spark-vs-DuckDB correctness compare.

The driver (per __spark_entry__.py docstring) checks row-count + schema +
order-insensitive value-hash with columns sorted by name. We reproduce
that here — canonicalize every cell to a string, sort columns by name,
sort rows — so mismatches surface in `pytest` before a driver round does.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import numpy as np

from iotgp_func_raw_data_ingest_spark.tables import TABLE_NAMES


def _canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        # exact: parity requires bit-equality after both engines' rounding
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "a:[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), _canon_cell(x)) for k, x in v.items())
        return "m:{" + ",".join(f"{k}={x}" for k, x in items) + "}"
    return f"s:{v}"


def canonical_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    rows.sort()
    return rows


def duckdb_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for name in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    spdf = spark_df.toPandas()
    ddf = duckdb_oracle(oracle_sql, sf_dir)
    if sorted(spdf.columns) != sorted(ddf.columns):
        return False, f"columns differ: spark={sorted(spdf.columns)} duckdb={sorted(ddf.columns)}"
    if len(spdf) != len(ddf):
        return False, f"row count differs: spark={len(spdf)} duckdb={len(ddf)}"
    srows, drows = canonical_rows(spdf), canonical_rows(ddf)
    if srows != drows:
        diffs = [(a, b) for a, b in zip(srows, drows) if a != b][:5]
        return False, f"values differ; first diffs (spark vs duckdb): {diffs}"
    return True, "ok"
