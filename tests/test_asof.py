"""Edge-case tests for the as-of join operator (operators/asof.py)."""

from __future__ import annotations

from iotgp_func_raw_data_ingest_spark.operators.asof import asof_join


def _dfs(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "eid long, k long, t string").selectExpr(
        "eid", "k", "CAST(t AS TIMESTAMP) AS t"
    )
    right = spark.createDataFrame(right_rows, "k2 long, t2 string, v long").selectExpr(
        "k2", "CAST(t2 AS TIMESTAMP) AS t2", "v"
    )
    return left, right


def _run(spark, left, right):
    out = asof_join(
        left, right,
        key_left="k", key_right="k2",
        time_left="t", time_right="t2",
        right_cols=["v"], tiebreak="v",
    )
    return {r.eid: r.v for r in out.collect()}


def test_asof_basic_latest_at_or_before(spark):
    left, right = _dfs(
        spark,
        [(1, 7, "2024-01-01 10:00:00"), (2, 7, "2024-01-01 12:00:00")],
        [(7, "2024-01-01 09:00:00", 100), (7, "2024-01-01 11:00:00", 200)],
    )
    assert _run(spark, left, right) == {1: 100, 2: 200}


def test_asof_no_prior_row_gives_null(spark):
    left, right = _dfs(
        spark,
        [(1, 7, "2024-01-01 08:00:00")],
        [(7, "2024-01-01 09:00:00", 100)],
    )
    assert _run(spark, left, right) == {1: None}


def test_asof_exact_timestamp_matches(spark):
    """A right row AT the left row's timestamp is visible (<= semantics)."""
    left, right = _dfs(
        spark,
        [(1, 7, "2024-01-01 09:00:00")],
        [(7, "2024-01-01 09:00:00", 100)],
    )
    assert _run(spark, left, right) == {1: 100}


def test_asof_tie_on_right_time_deterministic(spark):
    """Two right rows at the same (key, time): greatest tiebreak wins."""
    left, right = _dfs(
        spark,
        [(1, 7, "2024-01-01 10:00:00")],
        [(7, "2024-01-01 09:00:00", 100), (7, "2024-01-01 09:00:00", 300)],
    )
    assert _run(spark, left, right) == {1: 300}


def test_asof_keys_isolated(spark):
    """A right row for one key never leaks into another key's matches."""
    left, right = _dfs(
        spark,
        [(1, 7, "2024-01-01 10:00:00"), (2, 8, "2024-01-01 10:00:00")],
        [(7, "2024-01-01 09:00:00", 100)],
    )
    assert _run(spark, left, right) == {1: 100, 2: None}
