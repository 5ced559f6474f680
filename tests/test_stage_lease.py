"""Single-writer-per-route contract guards (lake module docstring):
healing must not delete a LIVE writer's in-flight (unready) stage —
that writer would later seal (manifest + _ready) a gutted stage and
commit a replacement with files missing, i.e. silent data loss. The
guard is a quiet-period grace window on unready-stage clearing, with a
``_lease`` file naming the owning writer for diagnostics; READY stages
are sealed by construction and heal regardless of age. Commit ordering
is move-first (reader atomicity: transient duplicates, never missing
rows) — pinned in test_merge_pruned/test_keyed_delete; here we pin the
mid-commit idempotence under the NEW ordering."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    _finish_staged_replace,
    heal_staged_replaces,
    merge_lake_table_pruned,
    write_stage_lease,
)

STALE = 1_700_000_000  # any epoch far past every grace window


def _seed(spark, base, n=200, files=4):
    lake = str(base / "lake")
    route = f"{lake}/curated/crm/accounts"
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("string").alias("seg"),
        F.col("id").cast("double").alias("bal"),
    )
    df.repartition(files, "k").write.parquet(route)
    return lake, route, EngineConfig(output_path=lake)


def _backdate(path: str) -> None:
    for root, dirs, names in os.walk(path, topdown=False):
        for f in names:
            os.utime(os.path.join(root, f), (STALE, STALE))
        os.utime(root, (STALE, STALE))


def test_fresh_unready_stage_survives_concurrent_heal(spark, tmp_path):
    """The silent-data-loss scenario from the r9 verdict: writer A is
    mid-staging (unready stage, fresh mtimes) when writer B's pre-plan
    healing sweeps the route. B must SKIP A's stage — and B's own merge
    must still complete correctly around it."""
    lake, route, cfg = _seed(spark, tmp_path)
    # writer A: lease + a half-written staging dir, all fresh
    stage_a = f"{route}/.merge-stage-writer-a"
    write_stage_lease(spark, stage_a, "merge")
    with open(f"{stage_a}/part-half-written.parquet", "w") as fh:
        fh.write("in-flight")

    # writer B: a pruned merge on the same route (its preamble heals)
    src = spark.createDataFrame(
        [(1, "UPD", 9.5), (9_000, "NEW", 1.0)], "k long, seg string, bal double"
    )
    report = merge_lake_table_pruned(
        spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
        matched_update={"seg": "s.seg", "bal": "s.bal"},
    )
    assert report["rows_updated"] == 1 and report["rows_inserted"] == 1
    # A's in-flight stage survived B's heal, byte for byte
    assert os.path.exists(f"{stage_a}/_lease")
    assert open(f"{stage_a}/part-half-written.parquet").read() == "in-flight"
    # and B's own (completed) stage is gone — only A's remains
    stages = [d for d in os.listdir(route) if d.startswith(".merge-stage-")]
    assert stages == [".merge-stage-writer-a"]


def test_quiet_unready_stage_is_cleared(spark, tmp_path):
    """Once an unready stage has been quiet past the grace window it is
    a genuine abort (crashed writer) and healing clears it."""
    lake, route, cfg = _seed(spark, tmp_path, n=50, files=2)
    stage = f"{route}/.delete-stage-crashed-writer"
    write_stage_lease(spark, stage, "delete")
    with open(f"{stage}/part-orphan.parquet", "w") as fh:
        fh.write("junk")
    _backdate(stage)
    healed = heal_staged_replaces(spark, route)
    assert healed == 0  # cleared, not completed — it was never READY
    assert not os.path.exists(stage)
    assert spark.read.parquet(route).count() == 50  # data untouched


def test_grace_zero_forces_immediate_clear(spark, tmp_path):
    """unready_grace_seconds=0 is the operator's 'I know no writer is
    live' override — fresh unready stages clear immediately."""
    lake, route, cfg = _seed(spark, tmp_path, n=50, files=2)
    stage = f"{route}/.merge-stage-fresh"
    write_stage_lease(spark, stage, "merge")
    assert heal_staged_replaces(spark, route, unready_grace_seconds=0) == 0
    assert not os.path.exists(stage)


def test_fresh_ready_stage_heals_regardless_of_age(spark, tmp_path):
    """_ready only lands after every staged file, so a READY stage is
    sealed and safe by construction — healing completes it even when it
    is seconds old (a crash can be recent)."""
    lake, route, cfg = _seed(spark, tmp_path, n=100, files=2)
    victim = sorted(f for f in os.listdir(route) if f.startswith("part-"))[0]
    victim_df = spark.read.parquet(f"{route}/{victim}")
    n_victim = victim_df.count()
    stage = f"{route}/.merge-stage-readyfresh"
    write_stage_lease(spark, stage, "merge")
    victim_df.withColumn("seg", F.lit("SEALED")).coalesce(1).write.mode(
        "append"
    ).parquet(stage)
    with open(f"{stage}/_manifest.json", "w") as fh:
        json.dump({"affected": [victim]}, fh)
    open(f"{stage}/_ready", "w").close()
    assert heal_staged_replaces(spark, route) == 1
    assert not os.path.exists(stage)
    got = spark.read.parquet(route)
    assert got.filter(F.col("seg") == "SEALED").count() == n_victim
    assert got.count() == 100


def test_lease_names_writer_and_kind(spark, tmp_path):
    lake, route, cfg = _seed(spark, tmp_path, n=10, files=1)
    stage = f"{route}/.merge-stage-lease"
    writer_id = write_stage_lease(spark, stage, "merge")
    lease = json.loads(open(f"{stage}/_lease").read())
    assert lease["writer"] == writer_id
    assert lease["kind"] == "merge"
    assert "created_utc" in lease


def test_mid_commit_idempotence_under_move_first_order(spark, tmp_path):
    """Crash window of the NEW commit ordering: staged file already
    moved in, original not yet deleted (the transient-duplicate reader
    window). Re-running the finish must converge — no staged file left
    to move, original deleted off the manifest, stage dropped — and the
    table must hold exactly the replacement rows."""
    lake, route, cfg = _seed(spark, tmp_path, n=100, files=2)
    victim = sorted(f for f in os.listdir(route) if f.startswith("part-"))[0]
    victim_df = spark.read.parquet(f"{route}/{victim}")
    n_victim = victim_df.count()
    stage = f"{route}/.merge-stage-midcommit"
    victim_df.withColumn("seg", F.lit("MOVED")).coalesce(1).write.parquet(stage)
    staged = [f for f in os.listdir(stage) if f.startswith("part-")]
    assert len(staged) == 1
    with open(f"{stage}/_manifest.json", "w") as fh:
        json.dump({"affected": [victim]}, fh)
    open(f"{stage}/_ready", "w").close()
    # simulate the crash: replacement already moved in, original alive —
    # a racing reader at this instant sees DUPLICATES (both files), the
    # documented move-first window
    os.rename(f"{stage}/{staged[0]}", f"{route}/{staged[0]}")
    dup = spark.read.parquet(route).count()
    assert dup == 100 + n_victim  # duplicates, never missing rows
    moved = _finish_staged_replace(spark, route, ".merge-stage-midcommit")
    assert moved == 0  # nothing left to move — idempotent convergence
    assert not os.path.exists(stage)
    assert not os.path.exists(f"{route}/{victim}")
    got = spark.read.parquet(route)
    assert got.count() == 100
    assert got.filter(F.col("seg") == "MOVED").count() == n_victim


def test_validate_lake_surfaces_lease_identity(spark, tmp_path):
    """An operator inspecting a stranded stage via validate_lake sees
    WHOSE it was (writer id + kind + creation time from the _lease) —
    the diagnosis half of the single-writer contract."""
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import validate_lake

    lake, route, cfg = _seed(spark, tmp_path, n=20, files=1)
    stage = f"{route}/.merge-stage-stranded"
    writer_id = write_stage_lease(spark, stage, "merge")
    reports = validate_lake(spark, lake)
    (rep,) = [r for r in reports if r["route"] == "curated/crm/accounts"]
    tagged = [s for s in rep["stranded"] if s.startswith(".merge-stage-stranded")]
    assert len(tagged) == 1
    assert f"lease: merge/{writer_id[:8]}" in tagged[0]
    # a hand-made stage without a lease keeps the bare name (back-compat)
    os.makedirs(f"{route}/.delete-stage-bare")
    reports = validate_lake(spark, lake)
    (rep,) = [r for r in reports if r["route"] == "curated/crm/accounts"]
    assert ".delete-stage-bare" in rep["stranded"]


def test_whole_route_rewrite_refuses_fresh_unready_stage(spark, tmp_path):
    """A whole-route rewriter's swap renames the route dir aside and
    deletes it — a FRESH unready stage (possibly a live writer) inside
    would be destroyed with it. Upsert / compaction / full merge must
    refuse LOUDLY; after the stage ages past the grace window (a real
    abort) the same call proceeds."""
    import pytest

    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        compact_lake_table,
        merge_lake_table,
        upsert_lake_table,
    )

    lake, route, cfg = _seed(spark, tmp_path, n=100, files=4)
    stage = f"{route}/.merge-stage-maybe-live"
    write_stage_lease(spark, stage, "merge")
    src = spark.createDataFrame(
        [(1, "U", 2.0)], "k long, seg string, bal double"
    )
    with pytest.raises(RuntimeError, match="grace window"):
        upsert_lake_table(spark, lake, "curated", "crm", "accounts",
                          src, ["k"], cfg)
    with pytest.raises(RuntimeError, match="grace window"):
        compact_lake_table(spark, lake, "curated", "crm", "accounts", cfg)
    with pytest.raises(RuntimeError, match="grace window"):
        merge_lake_table(spark, lake, "curated", "crm", "accounts",
                         src, ["k"], cfg,
                         matched_update={"seg": "s.seg"})
    # stage AND route untouched by the refusals
    assert os.path.exists(f"{stage}/_lease")
    assert spark.read.parquet(route).count() == 100

    # aged out = genuine abort: heal clears it, the rewrite proceeds
    _backdate(stage)
    upsert_lake_table(spark, lake, "curated", "crm", "accounts",
                      src, ["k"], cfg)
    assert not os.path.exists(stage)
    got = {r["k"]: r["seg"] for r in spark.read.parquet(route).collect()}
    assert got[1] == "U" and len(got) == 100


def test_staged_writers_coexist_with_fresh_unready_stage(spark, tmp_path):
    """Staged writers (pruned merge, keyed delete) replace individual
    files — a foreign unready stage dir is untouched, so they must NOT
    refuse (already pinned for the merge in
    test_fresh_unready_stage_survives_concurrent_heal; pin the keyed
    delete here)."""
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        delete_keys_from_table,
    )

    lake, route, cfg = _seed(spark, tmp_path, n=100, files=4)
    stage = f"{route}/.delete-stage-maybe-live"
    write_stage_lease(spark, stage, "delete")
    report = delete_keys_from_table(
        spark, route, "k", spark.range(3).select(F.col("id").alias("k"))
    )
    assert report["rows_deleted"] == 3
    assert os.path.exists(f"{stage}/_lease")  # foreign stage untouched
    assert spark.read.parquet(route).count() == 97
