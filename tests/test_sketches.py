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


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "key long")


def test_cms_never_undercounts_and_merges(spark):
    rows = [(i % 13,) for i in range(400)]
    df = spark.createDataFrame(rows, "key long")
    cms = SK.cms_table(df, "key", depth=4, width=256)
    probes = _keys(spark, range(13))
    est = {
        r["key"]: r["cms_est"]
        for r in SK.cms_lookup(cms, probes, "key", depth=4, width=256).collect()
    }
    exact = {
        r["key"]: r["n"]
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for k, n in exact.items():
        assert est[k] >= n  # CM estimates never undercount
    # a key never inserted reads only collision mass (>= 0, never None)
    unseen = SK.cms_lookup(
        cms, _keys(spark, [999_999]), "key", depth=4, width=256
    ).collect()[0]
    assert unseen["cms_est"] >= 0
    # mergeability: union of two disjoint half-builds re-summed per cell
    # equals the one-shot sketch (cells are sums)
    half_a = SK.cms_table(df.filter(F.col("key") < 6), "key", depth=4, width=256)
    half_b = SK.cms_table(df.filter(F.col("key") >= 6), "key", depth=4, width=256)
    merged = (
        half_a.unionByName(half_b)
        .groupBy("d", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    one_shot = {(r["d"], r["pos"]): r["cnt"] for r in cms.collect()}
    assert {(r["d"], r["pos"]): r["cnt"] for r in merged.collect()} == one_shot


def test_cms_relation_is_bounded_by_depth_times_width(spark):
    df = spark.createDataFrame([(i,) for i in range(5_000)], "key long")
    cms = SK.cms_table(df, "key", depth=4, width=64)
    assert cms.count() <= 4 * 64


def test_bloom_no_false_negatives_and_bit_bound(spark):
    members = list(range(0, 300, 3))
    build = _keys(spark, members)
    bits = SK.bloom_bits(build, "key", n_hashes=3, n_bits=512)
    assert bits.count() <= 512
    probes = _keys(spark, range(300))
    got = {
        r["key"]: r["bloom_hit"]
        for r in SK.bloom_probe(bits, probes, "key", n_hashes=3, n_bits=512).collect()
    }
    for m in members:
        assert got[m], f"false negative for member {m}"
    # non-members mostly rejected (fill ~0.44 -> fp ~9%; assert loosely)
    non_members = [k for k in range(300) if k % 3 != 0]
    fp = sum(1 for k in non_members if got[k])
    assert fp < len(non_members) * 0.5


def test_bloom_merge_is_bit_or(spark):
    a = SK.bloom_bits(_keys(spark, range(50)), "key", n_hashes=2, n_bits=256)
    b = SK.bloom_bits(_keys(spark, range(50, 100)), "key", n_hashes=2, n_bits=256)
    merged = a.unionByName(b).distinct()
    full = SK.bloom_bits(_keys(spark, range(100)), "key", n_hashes=2, n_bits=256)
    assert {r["pos"] for r in merged.collect()} == {r["pos"] for r in full.collect()}
