"""merge_lake_table_pruned: file pruning, full-merge equivalence,
per-clause counts, manifest-driven crash recovery, and the incremental
meta update. The clause-semantics core is shared with merge_lake_table
(covered row-level in test_merge.py); these tests pin what the PRUNED
variant adds — cost ∝ touched files, never a full-route rewrite."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    _finish_staged_replace,
    merge_lake_table,
    merge_lake_table_pruned,
    read_lake_table,
    read_route_meta,
    write_route_meta,
)

ROUTE = ("curated", "crm", "accounts")


def _seed(spark, base, n=1000, files=8):
    """n-row route hash-clustered into `files` part files on the key, so
    a small key set touches a strict subset of files."""
    lake = str(base / "lake")
    route = f"{lake}/curated/crm/accounts"
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).cast("string").alias("seg"),
        (F.col("id") % 97).cast("double").alias("bal"),
    )
    df.repartition(files, "k").write.parquet(route)
    return lake, route, EngineConfig(output_path=lake)


def _rows(spark, route):
    return sorted(
        ((r["k"], r["seg"], r["bal"]) for r in spark.read.parquet(route).collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1], t[2]),
    )


def test_pruned_rewrites_only_affected_files(spark, tmp_path):
    lake, route, cfg = _seed(spark, tmp_path)
    before_files = {f for f in os.listdir(route) if f.startswith("part-")}
    # two co-located keys (same physical file) + one new key
    tagged = (
        spark.read.parquet(route)
        .select("k", F.input_file_name().alias("f"))
        .collect()
    )
    by_file: dict[str, list[int]] = {}
    for r in tagged:
        by_file.setdefault(r["f"], []).append(r["k"])
    colocated = sorted(next(iter(by_file.values())))[:2]
    src = spark.createDataFrame(
        [(colocated[0], "UPD", 1.5), (colocated[1], "UPD", 2.5), (10_000, "NEW", 9.0)],
        "k long, seg string, bal double",
    )
    report = merge_lake_table_pruned(
        spark, lake, *ROUTE, src, ["k"], cfg,
        matched_update={"seg": "s.seg", "bal": "s.bal"},
    )
    assert report["files_total"] == 8
    assert 1 <= report["files_rewritten"] < 8
    assert report["rows_updated"] == 2
    assert report["rows_inserted"] == 1
    assert report["rows_deleted"] == 0
    after_files = {f for f in os.listdir(route) if f.startswith("part-")}
    # untouched originals keep their exact names — never rewritten
    assert len(before_files & after_files) == 8 - report["files_rewritten"]
    out = {r["k"]: (r["seg"], r["bal"]) for r in spark.read.parquet(route).collect()}
    assert out[colocated[0]] == ("UPD", 1.5)
    assert out[colocated[1]] == ("UPD", 2.5)
    assert out[10_000] == ("NEW", 9.0)
    assert len(out) == 1001


def test_pruned_matches_full_merge(spark, tmp_path):
    """Equivalence oracle: the pruned merge must produce byte-identical
    row sets to the full-rewrite merge for the same three-clause spec."""
    lake_a, route_a, cfg_a = _seed(spark, tmp_path / "a", n=500, files=6)
    lake_b, route_b, cfg_b = _seed(spark, tmp_path / "b", n=500, files=6)
    src = spark.createDataFrame(
        # updates (k%50==0 → matched), deletes via bal>90 condition,
        # inserts (k ≥ 500), and a NULL-keyed row (always inserts)
        [(0, "u", 10.0), (50, "u", 95.0), (100, "u", 20.0),
         (777, "n", 1.0), (888, "n", 2.0), (None, "nullk", 3.0)],
        "k long, seg string, bal double",
    )
    kwargs = dict(
        matched_update={"seg": "s.seg", "bal": "ROUND(s.bal + 0.5, 2)"},
        matched_update_condition="s.bal < 90",
        matched_delete_condition="s.bal > 90",
    )
    merge_lake_table(spark, lake_a, *ROUTE, src, ["k"], cfg_a, **kwargs)
    report = merge_lake_table_pruned(
        spark, lake_b, *ROUTE, src, ["k"], cfg_b, **kwargs
    )
    assert _rows(spark, route_a) == _rows(spark, route_b)
    assert report["rows_deleted"] == 1   # k=50, s.bal 95 > 90
    assert report["rows_updated"] == 2   # k=0, k=100
    assert report["rows_inserted"] == 3  # 777, 888, NULL-keyed
    assert report["files_rewritten"] < 6


def test_pruned_insert_only_touches_nothing(spark, tmp_path):
    """A source with no matching keys rewrites ZERO files — inserts are
    appended as new part files; every original survives untouched."""
    lake, route, cfg = _seed(spark, tmp_path, n=200, files=4)
    before_files = {f for f in os.listdir(route) if f.startswith("part-")}
    src = spark.createDataFrame(
        [(9_001, "N", 1.0), (9_002, "N", 2.0)], "k long, seg string, bal double"
    )
    report = merge_lake_table_pruned(spark, lake, *ROUTE, src, ["k"], cfg)
    assert report["files_rewritten"] == 0
    assert report["rows_inserted"] == 2
    assert report["rows_carried"] == 0
    after_files = {f for f in os.listdir(route) if f.startswith("part-")}
    assert before_files <= after_files  # originals all still there
    assert spark.read.parquet(route).count() == 202


def test_pruned_noop_when_nothing_matches_and_insert_disabled(spark, tmp_path):
    lake, route, cfg = _seed(spark, tmp_path, n=100, files=2)
    src = spark.createDataFrame([(9_999, "N", 1.0)], "k long, seg string, bal double")
    report = merge_lake_table_pruned(
        spark, lake, *ROUTE, src, ["k"], cfg, insert_when_not_matched=False
    )
    assert report == {
        "files_total": 2, "files_rewritten": 0, "rows_deleted": 0,
        "rows_updated": 0, "rows_inserted": 0, "rows_carried": 0,
    }
    assert spark.read.parquet(route).count() == 100


def test_pruned_ansi_cardinality(spark, tmp_path):
    """Same ANSI rule as the full merge: duplicate matched keys raise,
    duplicate unmatched keys insert one row each."""
    lake, route, cfg = _seed(spark, tmp_path, n=50, files=2)
    dup_unmatched = spark.createDataFrame(
        [(9_000, "a", 1.0), (9_000, "b", 2.0)], "k long, seg string, bal double"
    )
    report = merge_lake_table_pruned(
        spark, lake, *ROUTE, dup_unmatched, ["k"], cfg
    )
    assert report["rows_inserted"] == 2
    dup_matched = spark.createDataFrame(
        [(7, "a", 1.0), (7, "b", 2.0)], "k long, seg string, bal double"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_lake_table_pruned(spark, lake, *ROUTE, dup_matched, ["k"], cfg)


def test_pruned_crash_windows(spark, tmp_path):
    """The three windows of the staged-replace protocol: (a) an aborted
    (unready) stage is cleared; (b) a READY stage from a crashed commit
    is healed by the next invocation BEFORE it plans; (c) the finish
    step is idempotent across a mid-commit crash (original already
    deleted, staged file not yet moved)."""
    lake, route, cfg = _seed(spark, tmp_path, n=200, files=4)

    # (a) aborted stage: no _ready marker → cleared once past the
    # live-writer grace window (backdated here — a fresh unready stage
    # is presumed to belong to a live writer; see test_stage_lease.py),
    # data untouched
    os.makedirs(f"{route}/.merge-stage-aborted")
    with open(f"{route}/.merge-stage-aborted/part-junk.parquet", "w") as fh:
        fh.write("junk")
    stale = 1_700_000_000
    os.utime(f"{route}/.merge-stage-aborted/part-junk.parquet", (stale, stale))
    os.utime(f"{route}/.merge-stage-aborted", (stale, stale))
    src = spark.createDataFrame([(9_100, "N", 1.0)], "k long, seg string, bal double")
    merge_lake_table_pruned(spark, lake, *ROUTE, src, ["k"], cfg)
    assert not os.path.exists(f"{route}/.merge-stage-aborted")
    assert spark.read.parquet(route).count() == 201

    # (b) READY stage simulating a crash after the marker: replacement
    # content for one victim file, sealed manifest — the next merge
    # invocation must commit it first
    victim = sorted(
        f for f in os.listdir(route) if f.startswith("part-")
    )[0]
    victim_df = spark.read.parquet(f"{route}/{victim}")
    n_victim = victim_df.count()
    stage = f"{route}/.merge-stage-crashed"
    victim_df.withColumn("seg", F.lit("HEALED")).coalesce(1).write.parquet(stage)
    with open(f"{stage}/_manifest.json", "w") as fh:
        json.dump({"affected": [victim]}, fh)
    open(f"{stage}/_ready", "w").close()
    total_before = spark.read.parquet(route).count()
    src2 = spark.createDataFrame([(9_200, "N", 2.0)], "k long, seg string, bal double")
    merge_lake_table_pruned(spark, lake, *ROUTE, src2, ["k"], cfg)
    assert not os.path.exists(stage)
    assert not os.path.exists(f"{route}/{victim}")
    got = spark.read.parquet(route)
    assert got.count() == total_before + 1  # healed swap is 1:1 + new insert
    assert got.filter(F.col("seg") == "HEALED").count() == n_victim

    # (c) idempotent finish: build a ready stage, run finish, delete one
    # staged artifact mid-way is impossible to interleave here — instead
    # re-run finish after a manual partial commit (original pre-deleted)
    victim2 = sorted(
        f for f in os.listdir(route) if f.startswith("part-")
    )[0]
    v2_df = spark.read.parquet(f"{route}/{victim2}")
    n_v2 = v2_df.count()
    stage2 = f"{route}/.merge-stage-partial"
    v2_df.withColumn("seg", F.lit("TWICE")).coalesce(1).write.parquet(stage2)
    with open(f"{stage2}/_manifest.json", "w") as fh:
        json.dump({"affected": [victim2]}, fh)
    open(f"{stage2}/_ready", "w").close()
    os.remove(f"{route}/{victim2}")  # simulate crash AFTER original delete
    moved = _finish_staged_replace(spark, route, ".merge-stage-partial")
    assert moved == 1
    got2 = spark.read.parquet(route)
    assert got2.filter(F.col("seg") == "TWICE").count() == n_v2
    assert not os.path.exists(stage2)


def test_pruned_updates_meta_incrementally(spark, tmp_path):
    lake, route, cfg = _seed(spark, tmp_path, n=300, files=3)
    write_route_meta(spark, route, {"row_count": 300, "kind": "test"})
    src = spark.createDataFrame(
        # one delete (bal 96 > 90 for k=96), two inserts
        [(96, "d", 0.0), (9_001, "N", 1.0), (9_002, "N", 2.0)],
        "k long, seg string, bal double",
    )
    report = merge_lake_table_pruned(
        spark, lake, *ROUTE, src, ["k"], cfg,
        matched_delete_condition="t.bal > 90",
    )
    assert report["rows_deleted"] == 1 and report["rows_inserted"] == 2
    meta = read_route_meta(spark, route)
    assert meta["row_count"] == 301  # 300 - 1 + 2, no full-route census
    assert meta["kind"] == "test"
    assert spark.read.parquet(route).count() == 301


def test_pruned_evolve_schema(spark, tmp_path):
    lake, route, cfg = _seed(spark, tmp_path, n=100, files=2)
    src = spark.createDataFrame(
        [(1, "u", 5.0, "eu"), (9_001, "N", 9.0, "us")],
        "k long, seg string, bal double, region string",
    )
    merge_lake_table_pruned(
        spark, lake, *ROUTE, src, ["k"], cfg,
        matched_update={"bal": "s.bal", "region": "s.region"},
        evolve_schema=True,
    )
    out = read_lake_table(spark, lake, *ROUTE)
    assert "region" in out.columns  # mergeSchema read unions evolved files
    rows = {r["k"]: r["region"] for r in out.collect()}
    assert rows[1] == "eu" and rows[9_001] == "us"
    assert rows[2] is None  # untouched file NULL-pads under mergeSchema


def test_pruned_composite_key(spark, tmp_path):
    """Multi-column keys: the range pre-filter becomes a per-column
    bounding box (a superset of the needed files — correctness never
    depends on it) and the semi-join/merge run on the full key tuple."""
    lake = str(tmp_path / "lake")
    route = f"{lake}/curated/crm/accounts"
    df = spark.range(400).select(
        (F.col("id") % 20).alias("k1"),
        (F.col("id") / 20).cast("long").alias("k2"),
        F.lit("T").alias("seg"),
        F.col("id").cast("double").alias("bal"),
    )
    df.repartition(4, "k1", "k2").write.parquet(route)
    cfg = EngineConfig(output_path=lake)
    src = spark.createDataFrame(
        [(3, 0, "u", 1.0), (3, 19, "u", 2.0), (99, 99, "n", 3.0)],
        "k1 long, k2 long, seg string, bal double",
    )
    report = merge_lake_table_pruned(
        spark, lake, *ROUTE, src, ["k1", "k2"], cfg,
        matched_update={"seg": "s.seg", "bal": "s.bal"},
    )
    assert report["rows_updated"] == 2
    assert report["rows_inserted"] == 1
    out = {
        (r["k1"], r["k2"]): (r["seg"], r["bal"])
        for r in spark.read.parquet(route).collect()
    }
    assert out[(3, 0)] == ("u", 1.0)      # id=3
    assert out[(3, 19)] == ("u", 2.0)     # id=383
    assert out[(99, 99)] == ("n", 3.0)    # insert
    assert len(out) == 401


def test_pruned_nonparquet_format(spark, tmp_path):
    """The staged-replace protocol is format-agnostic (input_file_name
    + manifest + rename work for any file source) — pin the json leg."""
    lake = str(tmp_path / "lake")
    route = f"{lake}/curated/crm/accounts"
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.lit("T").alias("seg"),
        F.col("id").cast("double").alias("bal"),
    )
    df.repartitionByRange(4, "k").write.json(route)
    cfg = EngineConfig(output_path=lake)
    src = spark.createDataFrame(
        [(99, "u", 5.0), (500, "n", 1.0)], "k long, seg string, bal double"
    )
    report = merge_lake_table_pruned(
        spark, lake, *ROUTE, src, ["k"], cfg, fmt="json",
        matched_update={"bal": "s.bal"},
    )
    assert report["files_rewritten"] == 1
    assert report["rows_updated"] == 1 and report["rows_inserted"] == 1
    out = {r["k"]: r["bal"] for r in spark.read.json(route).collect()}
    assert out[99] == 5.0 and out[500] == 1.0 and len(out) == 101


def test_pruned_empty_source_is_noop(spark, tmp_path):
    """An empty CDC batch (routine in production) must not stage an
    empty part file into the route — a true no-op."""
    lake, route, cfg = _seed(spark, tmp_path, n=50, files=2)
    before = sorted(os.listdir(route))
    src = spark.createDataFrame([], "k long, seg string, bal double")
    report = merge_lake_table_pruned(spark, lake, *ROUTE, src, ["k"], cfg)
    assert report["files_rewritten"] == 0 and report["rows_inserted"] == 0
    assert sorted(os.listdir(route)) == before


def test_pruned_heals_crashed_full_merge_swap(spark, tmp_path):
    """A prior compaction/upsert/full-merge that died between its two
    renames leaves the route at <path>.compact-old with nothing live —
    the pruned merge must restore it before planning instead of raising
    route-not-found."""
    lake, route, cfg = _seed(spark, tmp_path, n=50, files=2)
    os.rename(route, f"{route}.compact-old")
    src = spark.createDataFrame([(9_000, "N", 1.0)], "k long, seg string, bal double")
    report = merge_lake_table_pruned(spark, lake, *ROUTE, src, ["k"], cfg)
    assert report["rows_inserted"] == 1
    assert spark.read.parquet(route).count() == 51
    assert not os.path.exists(f"{route}.compact-old")


def test_pruned_not_matched_condition(spark, tmp_path):
    """Conditional insert through the PRUNED path: a CDC delete
    tombstone for an absent key must no-op (not insert the tombstone),
    while a passing unmatched row still inserts — including when the
    source matches zero files (the empty-slice insert-only plan)."""
    lake, route, cfg = _seed(spark, tmp_path, n=100, files=4)
    src = spark.createDataFrame(
        # all keys unmatched: 500 passes, 501 fails ('d'), 502 NULL cond
        [(500, "N", 5.0, "u"), (501, "X", 6.0, "d"), (502, "Y", 7.0, None)],
        "k long, seg string, bal double, op string",
    )
    report = merge_lake_table_pruned(
        spark, lake, *ROUTE, src, ["k"], cfg,
        not_matched_condition="s.op <> 'd'",
    )
    assert report["files_rewritten"] == 0
    assert report["rows_inserted"] == 1
    out = {r["k"] for r in spark.read.parquet(route).collect()}
    assert 500 in out and 501 not in out and 502 not in out
    assert len(out) == 101


def test_cross_kind_stage_healing(spark, tmp_path):
    """A READY .delete-stage- left by a crashed keyed delete must be
    completed by the NEXT writer of ANY kind before it plans — a pruned
    merge that ignored it would read the doomed originals and the
    delete's next healer would then move stale staged copies in over
    the merge output (duplicated survivors, resurrected deletes). Same
    for a whole-route rewriter (upsert), whose swap would silently
    discard the stage's intent entirely."""
    lake, route, cfg = _seed(spark, tmp_path, n=200, files=4)
    victim = sorted(f for f in os.listdir(route) if f.startswith("part-"))[0]
    victim_df = spark.read.parquet(f"{route}/{victim}")
    dead_keys = {r["k"] for r in victim_df.limit(3).collect()}
    survivors = victim_df.filter(~F.col("k").isin(*dead_keys))
    stage = f"{route}/.delete-stage-crashed"
    survivors.coalesce(1).write.parquet(stage)
    with open(f"{stage}/_manifest.json", "w") as fh:
        json.dump({"affected": [victim]}, fh)
    open(f"{stage}/_ready", "w").close()

    src = spark.createDataFrame([(9_300, "N", 1.0)], "k long, seg string, bal double")
    merge_lake_table_pruned(spark, lake, *ROUTE, src, ["k"], cfg)
    out = {r["k"] for r in spark.read.parquet(route).collect()}
    assert not (dead_keys & out)          # the crashed delete landed first
    assert 9_300 in out
    assert out == set(range(200)) - dead_keys | {9_300}
    assert not os.path.exists(stage)

    # whole-route rewriter: upsert over a pending READY merge stage
    victim2 = sorted(f for f in os.listdir(route) if f.startswith("part-"))[0]
    v2 = spark.read.parquet(f"{route}/{victim2}")
    n_v2 = v2.count()
    stage2 = f"{route}/.merge-stage-crashed"
    v2.withColumn("seg", F.lit("HEALED")).coalesce(1).write.parquet(stage2)
    with open(f"{stage2}/_manifest.json", "w") as fh:
        json.dump({"affected": [victim2]}, fh)
    open(f"{stage2}/_ready", "w").close()
    from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table

    upsert_lake_table(
        spark, lake, *ROUTE,
        spark.createDataFrame([(9_400, "U", 2.0)], "k long, seg string, bal double"),
        ["k"], cfg,
    )
    got = spark.read.parquet(route)
    assert got.filter(F.col("seg") == "HEALED").count() == n_v2
    assert got.filter(F.col("k") == 9_400).count() == 1
    assert not os.path.exists(stage2)


def test_finish_staged_replace_raises_on_failed_rename(spark, tmp_path):
    """The staged files become the only copy of their rows once the
    originals die: a failed move must RAISE and leave the READY stage in
    place for an idempotent retry — silently continuing and dropping the
    stage would be permanent data loss. And because the COMMIT moves
    staged files in BEFORE deleting originals (reader atomicity:
    transient duplicates, never missing rows), a failed move must also
    leave every original intact."""
    lake, route, cfg = _seed(spark, tmp_path, n=100, files=2)
    files = sorted(f for f in os.listdir(route) if f.startswith("part-"))
    victim, blocker = files[0], files[1]
    stage = f"{route}/.merge-stage-collide"
    os.makedirs(stage)
    # staged part file whose name collides with a LIVE route file that
    # is NOT in the manifest — local FS rename onto an existing path
    # returns false, modeling a transient FS failure mid-commit
    import shutil as _shutil

    _shutil.copy(f"{route}/{victim}", f"{stage}/{blocker}")
    with open(f"{stage}/_manifest.json", "w") as fh:
        json.dump({"affected": [victim]}, fh)
    open(f"{stage}/_ready", "w").close()
    with pytest.raises(IOError, match="left in place"):
        _finish_staged_replace(spark, route, ".merge-stage-collide")
    # the stage survives for retry; the staged copy was not destroyed;
    # move-first ordering means the manifest's original is ALSO intact
    assert os.path.exists(f"{stage}/{blocker}")
    assert os.path.exists(f"{stage}/_ready")
    assert os.path.exists(f"{route}/{victim}")


def test_pruned_probe_null_key_edges(spark, tmp_path):
    """The fused source probe (one agg job for emptiness + range bounds
    + duplicate detection, replacing three separate actions) must keep
    the NULL-key exemptions of the ANSI rule it folded in:

    - rows with ANY null key column never match a target row, so
      duplicates among them must NOT raise (COUNT(DISTINCT ...) skips
      any-NULL tuples and the keyed-row count excludes them the same
      way — parity by construction, pinned here);
    - an all-null-key source skips the PLAN scan entirely (no non-null
      key tuple can match) yet still inserts through the unmatched
      clause;
    - a genuinely duplicated, MATCHED composite key still raises.
    """
    lake = str(tmp_path / "lake")
    route = f"{lake}/curated/crm/accounts"
    df = spark.range(100).select(
        (F.col("id") % 10).alias("k1"),
        (F.col("id") / 10).cast("long").alias("k2"),
        F.lit("T").alias("seg"),
        F.col("id").cast("double").alias("bal"),
    )
    df.repartition(2, "k1", "k2").write.parquet(route)
    cfg = EngineConfig(output_path=lake)

    # duplicate tuples whose k2 is NULL: exempt from the cardinality
    # rule (never matched), each inserts one row
    dup_null = spark.createDataFrame(
        [(3, None, "a", 1.0), (3, None, "b", 2.0)],
        "k1 long, k2 long, seg string, bal double",
    )
    report = merge_lake_table_pruned(
        spark, lake, *ROUTE, dup_null, ["k1", "k2"], cfg
    )
    assert report["rows_inserted"] == 2 and report["rows_updated"] == 0

    # all-null-key batch: the probe's distinct count is 0 -> PLAN skipped,
    # inserts still land
    all_null = spark.createDataFrame(
        [(None, None, "x", 7.0)], "k1 long, k2 long, seg string, bal double"
    )
    report = merge_lake_table_pruned(
        spark, lake, *ROUTE, all_null, ["k1", "k2"], cfg
    )
    assert report["files_rewritten"] == 0 and report["rows_inserted"] == 1

    # duplicated AND matched composite key: still the ANSI error
    dup_matched = spark.createDataFrame(
        [(3, 0, "a", 1.0), (3, 0, "b", 2.0)],
        "k1 long, k2 long, seg string, bal double",
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_lake_table_pruned(
            spark, lake, *ROUTE, dup_matched, ["k1", "k2"], cfg
        )
