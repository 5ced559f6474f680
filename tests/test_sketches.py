"""Theta-sketch distinct set algebra (operators/sketches.py).

Below the nominal entry count a Theta sketch retains every hash, so the
estimates are EXACT — the tests pin the full retained/churned/new
decomposition against hand-computed set algebra, plus the invariance
that makes sketches trustworthy at scale: partitioning must not change
the answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import sketches as SK


def _snap(spark, rows):
    return spark.createDataFrame(rows, "g string, uid long")


def test_theta_overlap_exact_at_small_cardinality(spark):
    a = _snap(spark, [("x", 1), ("x", 2), ("x", 3), ("x", 2), ("y", 10)])
    b = _snap(spark, [("x", 2), ("x", 3), ("x", 4), ("y", 11), ("y", 10)])
    out = SK.theta_overlap(
        SK.theta_distinct(a, ["g"], "uid"),
        SK.theta_distinct(b, ["g"], "uid"),
        ["g"],
    )
    got = {r["g"]: (r["union_est"], r["overlap_est"], r["only_a_est"], r["only_b_est"])
           for r in out.collect()}
    # x: A={1,2,3} B={2,3,4} -> union 4, overlap 2, only_a 1, only_b 1
    assert got["x"] == (4, 2, 1, 1)
    # y: A={10} B={10,11} -> union 2, overlap 1, only_a 0, only_b 1
    assert got["y"] == (2, 1, 0, 1)


def test_theta_estimates_are_partitioning_invariant(spark):
    rows = [("g", i % 37) for i in range(500)]
    base = _snap(spark, rows)
    other = _snap(spark, [("g", i) for i in range(20, 60)])
    ref = SK.theta_overlap(
        SK.theta_distinct(base, ["g"], "uid"),
        SK.theta_distinct(other, ["g"], "uid"),
        ["g"],
    ).collect()[0]
    for n_parts in (1, 7):
        again = SK.theta_overlap(
            SK.theta_distinct(base.repartition(n_parts), ["g"], "uid"),
            SK.theta_distinct(other.repartition(n_parts), ["g"], "uid"),
            ["g"],
        ).collect()[0]
        assert (
            again["union_est"], again["overlap_est"],
            again["only_a_est"], again["only_b_est"],
        ) == (
            ref["union_est"], ref["overlap_est"],
            ref["only_a_est"], ref["only_b_est"],
        )
    # exact below nominal entries: 37 base ids, 40 other ids, 17 shared
    assert (ref["union_est"], ref["overlap_est"]) == (60, 17)
    assert (ref["only_a_est"], ref["only_b_est"]) == (20, 23)
