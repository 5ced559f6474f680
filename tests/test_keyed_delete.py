"""Unit tests for maintenance.delete_keys_from_table: file pruning,
exact survivorship, and manifest-driven crash recovery."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
    _finish_keyed_delete,
    delete_keys_from_table,
)


def _build_table(spark, path: str):
    # user_id-partitioned 8-file layout: doomed keys hit a subset of files
    df = spark.range(1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 64).alias("user_id"),
        (F.col("id") % 7).cast("string").alias("event_type"),
    )
    df.repartition(8, "user_id").write.parquet(path)
    return df


def test_delete_rewrites_only_affected_files(spark, tmp_path):
    table = str(tmp_path / "t")
    _build_table(spark, table)
    before = {f for f in os.listdir(table) if f.startswith("part-")}

    # pick two REAL co-located users (sharing one physical file), so the
    # multiple-doomed-keys-per-file path is genuinely exercised
    tagged = (
        spark.read.parquet(table)
        .select("user_id", F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    by_file: dict[str, list[int]] = {}
    for r in tagged:
        by_file.setdefault(r["f"], []).append(r["user_id"])
    colocated = next(sorted(us)[:2] for us in by_file.values() if len(us) >= 2)

    doomed = spark.createDataFrame([(u,) for u in colocated], "user_id long")
    expected_rows = (
        spark.read.parquet(table)
        .filter(F.col("user_id").isin(colocated))
        .count()
    )
    report = delete_keys_from_table(spark, table, "user_id", doomed)
    assert report["files_total"] == 8
    assert 1 <= report["files_rewritten"] < 8  # pruned, not a full rewrite
    assert report["rows_deleted"] == expected_rows

    after = {f for f in os.listdir(table) if f.startswith("part-")}
    # untouched files keep their exact names (never rewritten)
    assert len(before & after) == 8 - report["files_rewritten"]

    got = spark.read.parquet(table)
    assert got.filter(F.col("user_id").isin(colocated)).count() == 0
    assert got.count() == 1000 - report["rows_deleted"]


def test_delete_with_no_matches_is_a_noop(spark, tmp_path):
    table = str(tmp_path / "t")
    _build_table(spark, table)
    report = delete_keys_from_table(
        spark, table, "user_id", spark.createDataFrame([(999,)], "user_id long")
    )
    assert report["files_rewritten"] == 0 and report["rows_deleted"] == 0
    assert spark.read.parquet(table).count() == 1000


def test_crashed_commit_heals_from_manifest(spark, tmp_path):
    """Simulate a crash AFTER the ready marker: a hand-built ready stage
    holding replacement content must be committed by the next
    invocation — originals named in the manifest deleted, staged files
    moved in, stage dropped."""
    table = str(tmp_path / "t")
    _build_table(spark, table)
    victim = sorted(f for f in os.listdir(table) if f.startswith("part-"))[0]

    # stage = the victim's rows with user_id 5 removed
    victim_df = spark.read.parquet(f"{table}/{victim}")
    stage = f"{table}/.delete-stage-test"
    victim_df.filter("user_id <> 5").coalesce(1).write.parquet(stage)
    with open(f"{stage}/_manifest.json", "w") as fh:
        json.dump({"affected": [victim]}, fh)
    open(f"{stage}/_ready", "w").close()
    n_victim, n_kept = victim_df.count(), victim_df.filter("user_id <> 5").count()
    total_before = spark.read.parquet(table).count()

    moved = _finish_keyed_delete(spark, table, ".delete-stage-test")
    assert moved == 1
    assert not os.path.exists(stage)
    assert not os.path.exists(f"{table}/{victim}")
    assert spark.read.parquet(table).count() == total_before - (n_victim - n_kept)

    # and the healing path inside delete_keys_from_table itself: an
    # UNREADY stranded stage is cleared without touching live data —
    # once it has aged past the live-writer grace window (backdated
    # here; a FRESH unready stage is presumed live and left alone, see
    # test_stage_lease.py)
    os.makedirs(f"{table}/.delete-stage-aborted")
    stale = 1_700_000_000
    os.utime(f"{table}/.delete-stage-aborted", (stale, stale))
    report = delete_keys_from_table(
        spark, table, "user_id", spark.createDataFrame([(999,)], "user_id long")
    )
    assert report["rows_deleted"] == 0
    assert not os.path.exists(f"{table}/.delete-stage-aborted")


def test_delete_null_and_empty_key_sets(spark, tmp_path):
    """The pinned key set (one localCheckpoint feeding both broadcast
    builds + the range probe that pushes a min/max pre-filter into the
    PLAN scan) must keep NULL-key semantics: NULL keys never equal-join,
    so a NULL-only or empty key set is a file-level no-op, and NULLs
    mixed into a real key set change nothing."""
    table = str(tmp_path / "t")
    _build_table(spark, table)

    for label, keys in (
        ("empty", spark.createDataFrame([], "user_id long")),
        ("all-null", spark.createDataFrame([(None,)], "user_id long")),
    ):
        report = delete_keys_from_table(spark, table, "user_id", keys)
        assert report["files_rewritten"] == 0, label
        assert report["rows_deleted"] == 0, label
    assert spark.read.parquet(table).count() == 1000

    mixed = spark.createDataFrame([(None,), (5,)], "user_id long")
    report = delete_keys_from_table(spark, table, "user_id", mixed)
    assert report["rows_deleted"] > 0
    got = spark.read.parquet(table)
    assert got.filter(F.col("user_id") == 5).count() == 0
    assert got.count() == 1000 - report["rows_deleted"]
