"""Semantic invariants for round-7 tranche 3 (q226 stream dim refresh,
q227 SQL DML with column defaults)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans import QUERIES
from tests.conftest import SF_SMOKE


def test_dim_refresh_splits_segments_by_tranche(spark):
    """Every (segment, event_type) row carries either the v1 or v2
    label, both versions appear (the refresh really happened mid-
    stream), and totals cover every joinable event exactly once."""
    rows = QUERIES["q226_stream_dim_refresh"](spark, SF_SMOKE).collect()
    v1 = [r for r in rows if not r["segment"].startswith("R2-")]
    v2 = [r for r in rows if r["segment"].startswith("R2-")]
    assert v1 and v2
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    joinable = events.join(
        cust.select(F.col("c_custkey").alias("user_id")), "user_id"
    ).count()
    assert sum(r["n_events"] for r in rows) == joinable
    # v2 segment names are the dimension's segments prefixed: stripping
    # "R2-" must land in the customer dimension's segment domain (segs1
    # alone may not cover segs2 — a segment can appear only in tranche
    # B), and v1 names must come from the same domain un-prefixed.
    expected = {
        r["c_mktsegment"]
        for r in cust.select("c_mktsegment").distinct().collect()
    }
    segs1 = {r["segment"] for r in v1}
    segs2 = {r["segment"][3:] for r in v2}
    assert segs2 and segs2 <= expected
    assert segs1 and segs1 <= expected
    assert all(r["segment"].startswith("R2-") for r in v2)


def test_sql_dml_defaults_resolved_at_write(spark):
    """The partial-column and DEFAULT-keyword inserts must land the
    declared defaults; the census matches a hand computation."""
    rows = {r["status"]: r for r in QUERIES["q227_sql_dml_defaults"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"open", "new", "bulk"}
    assert rows["open"]["n"] == 1 and rows["open"]["sum_score"] == 2.0
    # two defaulted rows (ids 2 and 3) at score 1.5 each
    assert rows["new"]["n"] == 2 and rows["new"]["sum_score"] == 3.0
    assert rows["new"]["sum_id"] == 5
    n_bulk = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .filter(F.col("event_id") <= 20)
        .count()
    )
    assert rows["bulk"]["n"] == n_bulk
