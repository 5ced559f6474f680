"""Semantic invariants for the round-7 tranche 2 (q224 parameterized
SQL, q225 composed entity resolution)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans import QUERIES
from tests.conftest import SF_SMOKE


def test_parameterized_sql_binding_equals_literal(spark):
    """Bound-parameter + IDENTIFIER + GROUP/ORDER BY ALL must produce
    exactly the literal query's rows (binding is front-end only)."""
    got = QUERIES["q224_parameterized_sql"](spark, SF_SMOKE).collect()
    lit = spark.sql(
        """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(user_id) AS BIGINT) AS sum_uid
        FROM events WHERE value > 50.0
        GROUP BY event_type ORDER BY event_type
        """
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in lit]
    assert len(got) > 0


def test_entity_resolution_census_covers_every_entity_once(spark):
    """ER output must partition the input slice: cluster sizes sum to
    the slice count, every survivor is a real member key, balances are
    conserved, and multi-member clusters only arise from real radius-2
    name matches within a nation."""
    rows = QUERIES["q225_entity_resolution"](spark, SF_SMOKE).collect()
    cust = (
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .filter(F.col("c_custkey") < 2000)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    )
    n_slice = cust.count()
    assert sum(r["n_members"] for r in rows) == n_slice
    keys = {r["c_custkey"] for r in cust.collect()}
    assert all(r["survivor_key"] in keys for r in rows)
    assert all(r["cluster_id"] in keys for r in rows)
    # balance conservation at 2dp aggregation granularity
    total = round(sum(r["sum_acctbal"] for r in rows), 1)
    direct = round(
        cust.agg(F.sum("c_acctbal")).first()[0], 1
    )
    assert abs(total - direct) < 0.5
    # cluster_id is the min member key -> no cluster id exceeds its survivor
    # unless the survivor outranks by balance (survivor >= cluster_id min rule)
    assert all(r["cluster_id"] <= r["survivor_key"] or r["n_members"] == 1 for r in rows)
