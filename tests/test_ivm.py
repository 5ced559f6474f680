"""Incremental view maintenance over the change feed (sources/ivm.py):
initial/incremental/noop lifecycle, exact equality with a from-scratch
aggregate after updates+deletes+inserts, decimal exactness, zero-count
group drop-out, null measures, corruption refusal (negative counts),
pruned-watermark and spec-drift errors, and crash-window healing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources import ivm
from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
from iotgp_func_raw_data_ingest_spark.sources.lake import merge_lake_table_pruned
from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
    delete_keys_from_table,
)


def _seed(spark, base, n=300, files=6):
    lake = str(base / "lake")
    route = f"{lake}/curated/crm/accounts"
    df = spark.range(1, n + 1).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("seg"),
        F.round(F.col("id") * 1.5, 2).cast("decimal(12,2)").alias("bal"),
    )
    df.repartitionByRange(files, "k").write.parquet(route)
    snap.enable_snapshots(spark, route)
    return lake, route, EngineConfig(output_path=lake), str(base / "view")


def _recompute(spark, route):
    return {
        (r["seg"]): (r["n_rows"], r["sum_bal"])
        for r in snap.read_route_snapshot(spark, route)
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("bal").alias("sum_bal"),
        )
        .collect()
    }


def _view_rows(spark, view):
    return {
        r["seg"]: (r["n_rows"], r["sum_bal"])
        for r in ivm.read_view(spark, view).collect()
    }


def test_lifecycle_matches_recompute_exactly(spark, tmp_path):
    lake, route, cfg, view = _seed(spark, tmp_path)
    r = ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    assert r["mode"] == "initial" and r["applied_to"] == 1
    assert _view_rows(spark, view) == _recompute(spark, route)

    # mutation 1: pruned merge (updates + deletes + inserts)
    src = (
        spark.range(280, 301)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 5).cast("string").alias("seg"),
            F.lit(7.25).cast("decimal(12,2)").alias("bal"),
            F.when(F.col("id") % 3 == 0, "d").otherwise("u").alias("op"),
        )
        .unionByName(
            spark.range(9000, 9010).select(
                F.col("id").alias("k"),
                F.lit("9").alias("seg"),  # brand-new group appears
                F.lit(1.50).cast("decimal(12,2)").alias("bal"),
                F.lit("i").alias("op"),
            )
        )
    )
    merge_lake_table_pruned(
        spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
        matched_update={"bal": "s.bal"},
        matched_update_condition="s.op = 'u'",
        matched_delete_condition="s.op = 'd'",
    )
    r = ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    assert r["mode"] == "incremental"
    assert r["applied_from"] == 1 and r["applied_to"] == 2
    assert r["groups_delta"] > 0
    assert _view_rows(spark, view) == _recompute(spark, route)

    # mutation 2: keyed delete
    doomed = spark.range(1, 301).filter(F.col("id") % 7 == 0).select(
        F.col("id").alias("k")
    )
    delete_keys_from_table(spark, route, "k", doomed)
    r = ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    assert r["mode"] == "incremental" and r["applied_to"] == 3
    assert _view_rows(spark, view) == _recompute(spark, route)

    # no new generation → noop
    r = ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    assert r["mode"] == "noop" and r["groups_delta"] == 0

    meta = ivm.read_view_meta(spark, view)
    assert meta["applied_generation"] == 3
    assert meta["source_route"] == route


def test_group_drops_out_at_zero_and_nulls_cancel(spark, tmp_path):
    lake, route, cfg, view = _seed(spark, tmp_path, n=50, files=2)
    # make group '0' include a null-measure row via schema-true insert
    src = spark.createDataFrame(
        [(9001, "0", None, "i")], "k long, seg string, bal decimal(12,2), op string"
    )
    merge_lake_table_pruned(
        spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
        matched_update={"bal": "s.bal"},
    )
    ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    assert _view_rows(spark, view) == _recompute(spark, route)

    # delete ALL of group '3' (k % 5 == 3) and the null row
    doomed = (
        spark.range(1, 51)
        .filter(F.col("id") % 5 == 3)
        .select(F.col("id").alias("k"))
        .unionByName(spark.createDataFrame([(9001,)], "k long"))
    )
    delete_keys_from_table(spark, route, "k", doomed)
    ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    got = _view_rows(spark, view)
    assert "3" not in got  # count hit zero → group gone
    assert got == _recompute(spark, route)


def test_refuses_negative_groups_and_leaves_view_intact(spark, tmp_path):
    lake, route, cfg, view = _seed(spark, tmp_path, n=40, files=2)
    ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    # corrupt the view: shrink every count to 0 behind IVM's back
    broken = ivm.read_view(spark, view).withColumn("n_rows", F.lit(0).cast("bigint"))
    broken_rows = broken.collect()
    schema = broken.schema
    spark.createDataFrame(broken_rows, schema).write.mode("overwrite").parquet(view)
    # the overwrite nuked the sidecar too — put one back at generation 1
    jvm, _, fs = ivm._hadoop_fs(spark, view)
    ivm._write_meta(
        jvm, fs, view,
        {"source_route": route, "group_cols": ["seg"], "sum_cols": ["bal"],
         "applied_generation": 1},
    )
    doomed = spark.range(1, 10).select(F.col("id").alias("k"))
    delete_keys_from_table(spark, route, "k", doomed)
    with pytest.raises(IOError, match="negative"):
        ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    # staged refresh discarded, corrupt-but-prior view still in place
    assert not os.path.exists(view + ".compact-tmp")
    assert all(n == 0 for n, _ in _view_rows(spark, view).values())


def test_pruned_watermark_and_spec_drift_raise(spark, tmp_path):
    lake, route, cfg, view = _seed(spark, tmp_path, n=40, files=2)
    ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    with pytest.raises(ValueError, match="spec drift"):
        ivm.refresh_view_from_changes(spark, route, view, ["seg"], [])
    delete_keys_from_table(
        spark, route, "k", spark.range(1, 5).select(F.col("id").alias("k"))
    )
    delete_keys_from_table(
        spark, route, "k", spark.range(5, 9).select(F.col("id").alias("k"))
    )
    snap.prune_generations(spark, route, keep_last=1)
    with pytest.raises(ValueError, match="pruned"):
        ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])


def test_guardrails(spark, tmp_path):
    lake, route, cfg, view = _seed(spark, tmp_path, n=20, files=1)
    with pytest.raises(ValueError, match="group_cols"):
        ivm.refresh_view_from_changes(spark, route, view, [], ["bal"])
    # a route without a ledger
    bare = f"{lake}/curated/crm/bare"
    spark.range(5).write.parquet(bare)
    with pytest.raises(ValueError, match="snapshots"):
        ivm.refresh_view_from_changes(spark, bare, view, ["id"])
    # an existing non-IVM directory must not be overwritten
    not_view = str(tmp_path / "not_view")
    spark.range(3).write.parquet(not_view)
    with pytest.raises(IOError, match="refusing"):
        ivm.refresh_view_from_changes(spark, route, not_view, ["seg"])


def test_initial_build_crash_window(spark, tmp_path):
    """A crash during the initial build (staged tmp fully written,
    final rename never ran) must leave NO view — the next call clears
    the stage and builds cleanly; a sidecar-less view can never exist."""
    lake, route, cfg, view = _seed(spark, tmp_path, n=30, files=1)
    # simulate: stage dir present with data + sidecar, no view
    staged = view + ".compact-tmp"
    spark.range(1).write.parquet(staged)
    jvm, _, fs = ivm._hadoop_fs(spark, staged)
    ivm._write_meta(
        jvm, fs, staged,
        {"source_route": route, "group_cols": ["seg"], "sum_cols": ["bal"],
         "applied_generation": 1},
    )
    assert not os.path.exists(view)
    r = ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    assert r["mode"] == "initial"
    assert not os.path.exists(staged)
    assert _view_rows(spark, view) == _recompute(spark, route)


def test_crash_window_healing(spark, tmp_path):
    lake, route, cfg, view = _seed(spark, tmp_path, n=60, files=2)
    ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    delete_keys_from_table(
        spark, route, "k", spark.range(1, 7).select(F.col("id").alias("k"))
    )
    # crash window A: staged tmp written, swap never started
    os.makedirs(view + ".compact-tmp/junk")
    r = ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    assert r["mode"] == "incremental"
    assert _view_rows(spark, view) == _recompute(spark, route)
    # crash window B: first rename done (view moved aside), second never ran
    delete_keys_from_table(
        spark, route, "k", spark.range(7, 12).select(F.col("id").alias("k"))
    )
    os.rename(view, view + ".compact-old")
    r = ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    assert r["mode"] == "incremental"
    assert not os.path.exists(view + ".compact-old")
    assert _view_rows(spark, view) == _recompute(spark, route)


def test_persisted_schema_stable_across_refreshes(spark, tmp_path):
    """The combine re-aggregate must not widen the persisted decimal
    sum column each refresh (decimal(22,2) -> (32,2) -> (38,2) drift):
    the on-disk view schema after any number of incremental refreshes
    equals the initial build's."""
    lake, route, cfg, view = _seed(spark, tmp_path)
    ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
    initial_types = dict(ivm.read_view(spark, view).dtypes)
    assert initial_types["sum_bal"] == "decimal(22,2)"

    for lo, hi in ((280, 301), (1, 20)):
        src = spark.range(lo, hi).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).cast("string").alias("seg"),
            F.lit(2.75).cast("decimal(12,2)").alias("bal"),
            F.lit("u").alias("op"),
        )
        merge_lake_table_pruned(
            spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
            matched_update={"bal": "s.bal"},
            matched_update_condition="s.op = 'u'",
            matched_delete_condition="s.op = 'd'",
        )
        r = ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
        assert r["mode"] == "incremental"
        assert dict(ivm.read_view(spark, view).dtypes) == initial_types

    assert _view_rows(spark, view) == _recompute(spark, route)
