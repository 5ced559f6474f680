"""operators/skew.heavy_hitters semantics on a constructed distribution."""

from __future__ import annotations

from iotgp_func_raw_data_ingest_spark.operators.skew import heavy_hitters


def test_heavy_hitters_ranks_and_shares(spark):
    # 10 rows of key "hot", 5 of "warm", 1 each of "c1".."c5" → 20 rows, 7 keys
    rows = (
        [("hot",)] * 10 + [("warm",)] * 5 + [(f"c{i}",) for i in range(1, 6)]
    )
    df = spark.createDataFrame(rows, ["k"])
    out = {r["key"]: r for r in heavy_hitters(df, "k", k=3).collect()}
    assert set(out) == {"hot", "warm", "c1"}  # c1 wins the 1-row tie by key
    assert out["hot"]["rank"] == 1 and out["hot"]["n_rows"] == 10
    assert out["hot"]["share"] == 0.5
    # skew = n / mean-per-key = 10 / (20/7)
    assert out["hot"]["skew"] == round(10 * 7 / 20, 4)
    assert out["warm"]["rank"] == 2 and out["warm"]["share"] == 0.25


def test_heavy_hitters_uses_window_group_limit(spark):
    df = spark.range(100).selectExpr("id % 10 AS k")
    plan = (
        heavy_hitters(df, "k", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the rank<=k predicate must compile to a pushed-down top-k form
    # (per-partition limit + merge), not a full single-partition sort of
    # the key domain
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan
