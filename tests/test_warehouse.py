"""Semantic invariants for the warehouse-maintenance tranche
(q211 incremental join view, q212 table diff, q213 SCD2) plus direct
unit tests of operators/viewmaint.py."""

from __future__ import annotations

from iotgp_func_raw_data_ingest_spark.plans import QUERIES
from tests.conftest import SF_SMOKE


def test_incremental_view_covers_every_order_once(spark):
    rows = QUERIES["q211_incremental_join_view"](spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    keys = [r["o_orderkey"] for r in rows]
    assert len(keys) == orders.count()  # every order enriched
    assert len(set(keys)) == len(keys)  # no delta term double-counted


def test_table_diff_census_partitions_both_generations(spark):
    rows = {r["status"]: r for r in QUERIES["q212_table_diff"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    n_v1 = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert (
        rows["removed"]["n"] + rows["changed"]["n"] + rows["unchanged"]["n"]
        == n_v1
    )
    assert rows["added"]["n"] > 0 and rows["changed"]["n"] > 0


def test_diff_tables_handles_nulls_and_changes(spark):
    from iotgp_func_raw_data_ingest_spark.operators.viewmaint import diff_tables

    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "x"), (3, None), (5, "e")], "k int, v string"
    )
    got = {
        r["k"]: r["status"]
        for r in diff_tables(old, new, ["k"], ["v"]).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",  # null -> 'x'
        3: "changed",  # 'c' -> null
        4: "removed",
        5: "added",
    }


def test_scd2_intervals_are_contiguous_and_exclusive(spark):
    rows = QUERIES["q213_scd2_build"](spark, SF_SMOKE).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    sentinel = "9999-12-31 23:59:59.999999"
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r["version"])
        assert [v["version"] for v in vs] == list(range(1, len(vs) + 1))
        assert sum(v["is_current"] for v in vs) == 1 and vs[-1]["is_current"]
        assert vs[-1]["eff_to"] == sentinel
        for a, b in zip(vs, vs[1:]):
            assert a["eff_to"] == b["eff_from"]  # contiguous, right-open
            assert a["event_type"] != b["event_type"]  # real changes only
            assert a["eff_from"] < a["eff_to"]


def test_scd2_replays_one_users_history_exactly(spark):
    from iotgp_func_raw_data_ingest_spark.operators.viewmaint import (
        scd2_from_events,
    )

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "a"),
            (1, "2024-01-01 00:01:00", 11, "a"),
            (1, "2024-01-01 00:02:00", 12, "b"),
            (1, "2024-01-01 00:02:00", 13, "c"),  # tiebreak on event_id
            (1, "2024-01-01 00:03:00", 14, "c"),
        ],
        "user_id int, ts string, event_id int, event_type string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts", "event_id", "event_type")
    got = [
        (r["version"], r["event_type"], r["is_current"])
        for r in sorted(
            scd2_from_events(df, "user_id", "event_type", "ts", "event_id").collect(),
            key=lambda r: r["version"],
        )
    ]
    assert got == [(1, "a", False), (2, "b", False), (3, "c", True)]


def test_scd2_leading_null_attr_run_opens_a_version(spark):
    """A key whose history OPENS with NULL attrs must still get version 1.

    Regression for the r6 ADVICE item: lag(attr) is NULL on the first
    row, so NULL.eqNullSafe(NULL attr) was TRUE and the leading NULL run
    emitted no version at all — the first version appeared only at the
    first non-NULL change, and a key with an all-NULL history vanished
    from the dimension entirely."""
    from iotgp_func_raw_data_ingest_spark.operators.viewmaint import (
        scd2_from_events,
    )

    df = spark.createDataFrame(
        [
            # user 1: leading NULL run, then a value, then NULL again
            (1, "2024-01-01 00:00:00", 10, None),
            (1, "2024-01-01 00:01:00", 11, None),
            (1, "2024-01-01 00:02:00", 12, "b"),
            (1, "2024-01-01 00:03:00", 13, None),
            # user 2: all-NULL history — must still be one current version
            (2, "2024-01-01 00:00:00", 20, None),
            (2, "2024-01-01 00:01:00", 21, None),
        ],
        "user_id int, ts string, event_id int, event_type string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts", "event_id", "event_type")
    out = scd2_from_events(df, "user_id", "event_type", "ts", "event_id").collect()
    u1 = sorted(
        [(r["version"], r["event_type"], r["is_current"]) for r in out if r["user_id"] == 1]
    )
    u2 = sorted(
        [(r["version"], r["event_type"], r["is_current"]) for r in out if r["user_id"] == 2]
    )
    assert u1 == [(1, None, False), (2, "b", False), (3, None, True)]
    assert u2 == [(1, None, True)]
    # effective_from of version 1 is the key's FIRST event, not the first change
    v1 = next(r for r in out if r["user_id"] == 1 and r["version"] == 1)
    assert str(v1["effective_from"]).startswith("2024-01-01 00:00:00")
