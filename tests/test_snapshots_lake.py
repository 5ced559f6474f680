"""Snapshot generations through the LAKE WRITERS: every mutating
operation on a snapshot-enabled route must commit a generation that a
concurrent/later reader resolves consistently — pruned merge and keyed
delete (staged replace → publish + retire), compaction / upsert / full
merge (whole-route swap → salvage history + full-listing publish),
typed appends (delta publish), plus the crash windows of each."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    _finish_staged_replace,
    compact_lake_table,
    heal_staged_replaces,
    merge_lake_table,
    merge_lake_table_pruned,
    upsert_lake_table,
    write_lake_typed,
)
from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
    delete_keys_from_table,
)


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


def _parts(route):
    return sorted(f for f in os.listdir(route) if f.startswith("part-"))


def test_pruned_merge_publishes_and_time_travels(spark, tmp_path):
    lake, route, cfg = _seed(spark, tmp_path)
    snap.enable_snapshots(spark, route)
    src = spark.createDataFrame(
        [(1, "UPD", 9.5), (9_000, "NEW", 1.0)], "k long, seg string, bal double"
    )
    report = merge_lake_table_pruned(
        spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
        matched_update={"seg": "s.seg", "bal": "s.bal"},
    )
    assert report["rows_updated"] == 1 and report["rows_inserted"] == 1
    gens = snap.list_generations(spark, route)
    assert gens == [1, 2]
    m2 = snap.read_generation(spark, route, 2)
    assert m2["kind"] == "merge"
    # latest snapshot sees the merge; gen 1 still sees the pre-merge rows
    latest = snap.read_route_snapshot(spark, route)
    assert latest.filter("k = 1").first()["seg"] == "UPD"
    assert latest.count() == 201
    g1 = snap.read_route_snapshot(spark, route, generation=1)
    assert g1.count() == 200
    assert g1.filter("k = 1").first()["seg"] != "UPD"
    # the replaced original was retired, not deleted
    assert os.listdir(f"{route}/{snap.RETIRED_DIR}")
    # snapshot file set == live part files (nothing stale, nothing torn)
    assert m2["files"] == _parts(route)


def test_keyed_delete_publishes_and_time_travels(spark, tmp_path):
    lake, route, cfg = _seed(spark, tmp_path)
    snap.enable_snapshots(spark, route)
    keys = spark.createDataFrame([(3,), (11,)], "k long")
    report = delete_keys_from_table(spark, route, "k", keys)
    assert report["rows_deleted"] == 2
    assert snap.list_generations(spark, route) == [1, 2]
    assert snap.read_generation(spark, route, 2)["kind"] == "delete"
    assert snap.read_route_snapshot(spark, route).count() == 198
    assert snap.read_route_snapshot(spark, route, generation=1).count() == 200


def test_compaction_preserves_history(spark, tmp_path):
    lake, route, cfg = _seed(spark, tmp_path, files=6)
    snap.enable_snapshots(spark, route)
    pre = _parts(route)
    compact_lake_table(spark, lake, "curated", "crm", "accounts", cfg)
    gens = snap.list_generations(spark, route)
    assert gens == [1, 2]
    m2 = snap.read_generation(spark, route, 2)
    assert m2["kind"] == "compact"
    assert m2["files"] == _parts(route)
    assert set(m2["files"]).isdisjoint(pre)
    # gen 1 resolves through _retired/ and reads the same 200 rows
    g1 = snap.resolve_snapshot(spark, route, 1)
    assert all(snap.RETIRED_DIR in p for p in g1["paths"])
    assert snap.read_route_snapshot(spark, route, generation=1).count() == 200
    assert snap.read_route_snapshot(spark, route).count() == 200


def test_upsert_and_full_merge_refresh_generation(spark, tmp_path):
    lake, route, cfg = _seed(spark, tmp_path)
    snap.enable_snapshots(spark, route)
    ups = spark.createDataFrame(
        [(0, "Z", 0.5), (5_000, "N", 2.0)], "k long, seg string, bal double"
    )
    upsert_lake_table(
        spark, lake, "curated", "crm", "accounts", ups, ["k"], cfg
    )
    assert snap.read_generation(spark, route, 2)["kind"] == "upsert"
    assert snap.read_route_snapshot(spark, route).count() == 201
    src = spark.createDataFrame([(0, "DEAD", 0.0)], "k long, seg string, bal double")
    merge_lake_table(
        spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
        matched_delete_condition="s.seg = 'DEAD'",
        insert_when_not_matched=False,
    )
    assert snap.read_generation(spark, route, 3)["kind"] == "merge_full"
    assert snap.read_route_snapshot(spark, route).count() == 200
    # all three historical generations remain readable
    assert snap.read_route_snapshot(spark, route, generation=1).count() == 200
    assert snap.read_route_snapshot(spark, route, generation=2).count() == 201


def test_typed_append_publishes_delta(spark, tmp_path):
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(output_path=lake)
    routed = spark.createDataFrame(
        [("curated", "crm", "accounts", {"k": "1", "v": "a"})],
        "folder string, source_db string, table string, row map<string,string>",
    )
    write_lake_typed(routed, cfg)
    route = f"{lake}/curated/crm/accounts"
    snap.enable_snapshots(spark, route)
    routed2 = spark.createDataFrame(
        [("curated", "crm", "accounts", {"k": "2", "v": "b"})],
        "folder string, source_db string, table string, row map<string,string>",
    )
    write_lake_typed(routed2, cfg)
    gens = snap.list_generations(spark, route)
    assert gens == [1, 2]
    m2 = snap.read_generation(spark, route, 2)
    assert m2["kind"] == "append"
    assert snap.read_route_snapshot(spark, route).count() == 2
    assert snap.read_route_snapshot(spark, route, generation=1).count() == 1


def test_staged_replace_crash_retry_is_snapshot_idempotent(
    spark, tmp_path, monkeypatch
):
    """Crash after the generation publish but before retirement: the
    healing retry must re-publish (a harmless identical-delta
    generation) and complete the retire — final state consistent."""
    lake, route, cfg = _seed(spark, tmp_path)
    snap.enable_snapshots(spark, route)
    import iotgp_func_raw_data_ingest_spark.sources.lake as lake_mod

    real_retire = snap.retire_files
    state = {"crashed": False}

    def crashing_retire(s, r, names):
        if not state["crashed"]:
            state["crashed"] = True
            raise IOError("injected crash before retirement")
        return real_retire(s, r, names)

    monkeypatch.setattr(snap, "retire_files", crashing_retire)
    src = spark.createDataFrame([(2, "UPD", 7.0)], "k long, seg string, bal double")
    with pytest.raises(Exception, match="injected crash"):
        merge_lake_table_pruned(
            spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
            matched_update={"seg": "s.seg", "bal": "s.bal"},
        )
    # the READY stage survived the crash; healing completes it
    stages = [d for d in os.listdir(route) if d.startswith(".merge-stage-")]
    assert len(stages) == 1
    heal_staged_replaces(spark, route)
    assert not [d for d in os.listdir(route) if d.startswith(".merge-stage-")]
    # the retry's second publish applied the SAME delta — file set equal
    gens = snap.list_generations(spark, route)
    m_last = snap.read_generation(spark, route, gens[-1])
    m_prev = snap.read_generation(spark, route, gens[-2])
    assert m_last["files"] == m_prev["files"]
    assert m_last["files"] == _parts(route)
    latest = snap.read_route_snapshot(spark, route)
    assert latest.count() == 200
    assert latest.filter("k = 2").first()["seg"] == "UPD"
    assert snap.read_route_snapshot(spark, route, generation=1).count() == 200


def test_swap_crash_window_salvages_history(spark, tmp_path):
    """A compaction that crashed after the swap but before disposing of
    .compact-old: the next rewrite's _recover_swap must salvage _gen /
    _retired and retire the old part files instead of deleting them."""
    lake, route, cfg = _seed(spark, tmp_path)
    snap.enable_snapshots(spark, route)
    pre = _parts(route)
    # simulate: post-swap crash state = new data live, old dir aside
    os.rename(route, f"{route}.compact-old")
    spark.range(50).select(
        F.col("id").alias("k"),
        F.lit("c").alias("seg"),
        F.lit(0.0).alias("bal"),
    ).coalesce(1).write.parquet(route)
    # the old dir still holds _gen — the route's own dir has none
    assert os.path.isdir(f"{route}.compact-old/{snap.GEN_DIR}")
    # next maintenance pass (any swap-based rewrite) recovers
    compact_lake_table(spark, lake, "curated", "crm", "accounts", cfg)
    assert not os.path.exists(f"{route}.compact-old")
    # gen 1 still resolves (through _retired) to the ORIGINAL 200 rows
    assert snap.read_route_snapshot(spark, route, generation=1).count() == 200
    for name in pre:
        assert os.path.exists(f"{route}/{snap.RETIRED_DIR}/{name}")
    # latest generation covers the current live files
    gens = snap.list_generations(spark, route)
    m = snap.read_generation(spark, route, gens[-1])
    assert m["files"] == _parts(route)
    assert snap.read_route_snapshot(spark, route).count() == 50


def test_manifest_records_staged_names(spark, tmp_path):
    """The stage manifest must name the replacement files (idempotent
    generation publish depends on it surviving the moves)."""
    lake, route, cfg = _seed(spark, tmp_path)
    import iotgp_func_raw_data_ingest_spark.sources.lake as lake_mod

    captured = {}
    real_finish = lake_mod._finish_staged_replace

    def spying_finish(s, table_path, stage_name, manifest=None):
        # read the ON-DISK manifest (not the in-line copy): this test
        # pins that the names survive to disk for crash healing
        with open(f"{table_path}/{stage_name}/_manifest.json") as fh:
            captured.update(json.load(fh))
        return real_finish(s, table_path, stage_name, manifest=manifest)

    lake_mod._finish_staged_replace = spying_finish
    try:
        src = spark.createDataFrame(
            [(4, "U", 1.0)], "k long, seg string, bal double"
        )
        merge_lake_table_pruned(
            spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
            matched_update={"seg": "s.seg"},
        )
    finally:
        lake_mod._finish_staged_replace = real_finish
    assert captured["staged"] and all(
        n.startswith("part-") for n in captured["staged"]
    )
    assert captured["affected"]
    # non-snapshot route: originals deleted outright, no _retired debris
    assert not os.path.exists(f"{route}/{snap.RETIRED_DIR}")


# ---------------------------------------------------------------------------
# validate_lake's generation-ledger sub-audit
# ---------------------------------------------------------------------------


def _snapshot_report(spark, lake):
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import validate_lake

    reports = validate_lake(spark, lake)
    assert len(reports) == 1
    return reports[0]["snapshot"]


def test_validate_snapshot_absent_without_ledger(spark, tmp_path):
    lake, route, cfg = _seed(spark, tmp_path)
    assert _snapshot_report(spark, lake) is None


def test_validate_snapshot_healthy_after_delete(spark, tmp_path):
    lake, route, cfg = _seed(spark, tmp_path)
    snap.enable_snapshots(spark, route)
    doomed = spark.range(0, 5).select(F.col("id").alias("k"))
    delete_keys_from_table(spark, route, "k", doomed)
    s = _snapshot_report(spark, lake)
    assert s["snapshot_ok"] is True
    assert s["latest_generation"] == 2 and s["generations"] == 2
    assert s["missing_files"] == [] and s["unpublished_files"] == []
    assert s["orphan_retired"] == []  # gen 1 still references the retired


def test_validate_snapshot_flags_unpublished_append(spark, tmp_path):
    """A writer that appends files WITHOUT publishing a generation makes
    snapshot readers silently miss rows — the audit must surface it."""
    lake, route, cfg = _seed(spark, tmp_path)
    snap.enable_snapshots(spark, route)
    extra = spark.range(900, 910).select(
        F.col("id").alias("k"),
        F.lit("x").alias("seg"),
        F.lit(0.0).alias("bal"),
    )
    extra.coalesce(1).write.mode("append").parquet(route)  # no publish
    s = _snapshot_report(spark, lake)
    assert s["snapshot_ok"] is False
    assert len(s["unpublished_files"]) == 1
    assert s["missing_files"] == []


def test_validate_snapshot_flags_missing_live_file(spark, tmp_path):
    """A live file referenced by the latest generation deleted out from
    under the ledger: the latest snapshot read raises — the audit names
    the file."""
    lake, route, cfg = _seed(spark, tmp_path)
    snap.enable_snapshots(spark, route)
    victim = _parts(route)[0]
    os.remove(os.path.join(route, victim))
    s = _snapshot_report(spark, lake)
    assert s["snapshot_ok"] is False
    assert s["missing_files"] == [victim]


def test_validate_snapshot_lists_orphan_retired(spark, tmp_path):
    """Retired files no committed generation references are pure vacuum
    candidates — after pruning history, the audit lists what
    prune_generations(vacuum=True) would clear, and stays snapshot_ok."""
    lake, route, cfg = _seed(spark, tmp_path)
    snap.enable_snapshots(spark, route)
    doomed = spark.range(0, 5).select(F.col("id").alias("k"))
    delete_keys_from_table(spark, route, "k", doomed)
    # drop gen 1 but keep its retired files on disk
    snap.prune_generations(spark, route, keep_last=1, vacuum=False)
    s = _snapshot_report(spark, lake)
    assert s["snapshot_ok"] is True
    assert s["generations"] == 1
    assert s["orphan_retired"]  # gen-1-only files, unreferenced now
    got = snap.prune_generations(
        spark, route, keep_last=1, vacuum=True, vacuum_grace_seconds=0
    )
    assert got["vacuumed_files"] == s["orphan_retired"]
    assert _snapshot_report(spark, lake)["orphan_retired"] == []
