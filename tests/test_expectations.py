"""Declarative expectations battery (operators/expectations.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import expectations as E


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (2, "b", 200.0),   # duplicate key, out-of-range value
            (3, None, None),   # null name and value
        ],
        "id long, name string, v double",
    )


def test_fused_row_level_expectations(spark):
    out = E.validate_expectations(
        _df(spark),
        [
            E.expect_not_null("name_not_null", "name"),
            E.expect_between("v_in_range", "v", 0, 100),
            E.expect_in_set("name_domain", "name", ["a", "b"]),
            E.expect_matches("name_format", "name", "^[ab]$"),
        ],
    )
    got = {r["expectation"]: (r["violations"], r["n_rows"], r["ok"]) for r in out.collect()}
    # nulls count as violations for every row-level kind
    assert got["name_not_null"] == (1, 4, False)
    assert got["v_in_range"] == (2, 4, False)      # 200.0 and NULL
    assert got["name_domain"] == (1, 4, False)     # NULL not in set
    assert got["name_format"] == (1, 4, False)


def test_unique_and_foreign_key(spark):
    df = _df(spark)
    ref = spark.createDataFrame([(1,), (2,)], "k long")
    out = E.validate_expectations(
        df,
        [
            E.expect_unique("id_unique", ["id"]),
            E.expect_foreign_key("id_fk", ["id"], ref, ["k"]),
        ],
    )
    got = {r["expectation"]: (r["violations"], r["n_rows"], r["ok"]) for r in out.collect()}
    assert got["id_unique"] == (1, 4, False)   # one extra row for key 2
    assert got["id_fk"] == (1, 4, False)       # id=3 has no referent


def test_report_preserves_declaration_order_and_all_pass(spark):
    df = _df(spark).filter(F.col("name").isNotNull())
    exps = [
        E.expect_between("v_wide", "v", 0, 1000),
        E.expect_not_null("id_nn", "id"),
        E.expect_unique("full_row_unique", ["id", "v"]),
    ]
    rows = E.validate_expectations(df, exps).collect()
    assert [r["expectation"] for r in rows] == ["v_wide", "id_nn", "full_row_unique"]
    assert all(r["ok"] for r in rows)


def test_duplicate_names_rejected(spark):
    with pytest.raises(ValueError):
        E.validate_expectations(
            _df(spark),
            [E.expect_not_null("x", "id"), E.expect_not_null("x", "name")],
        )


def test_empty_table_trivially_passes(spark):
    df = _df(spark).filter(F.lit(False))
    ref = spark.createDataFrame([(1,)], "k long")
    rows = E.validate_expectations(
        df,
        [
            E.expect_not_null("nn", "name"),
            E.expect_unique("uq", ["id"]),
            E.expect_foreign_key("fk", ["id"], ref, ["k"]),
        ],
    ).collect()
    assert [(r["violations"], r["n_rows"], r["ok"]) for r in rows] == [(0, 0, True)] * 3


def test_names_with_quotes_are_safe(spark):
    rows = E.validate_expectations(
        _df(spark), [E.expect_not_null("customer's \"id\"", "id")]
    ).collect()
    assert rows[0]["expectation"] == "customer's \"id\""
    assert rows[0]["ok"]
