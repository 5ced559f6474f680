"""Crash-injection tests for the stage-then-rename lake writers.

Each test hand-builds the exact on-disk state a hard crash (process
death, not a caught exception) leaves behind, then asserts the next
invocation heals it with no row lost and none duplicated.

The sidecar-swap windows target write_lake_typed's roll-forward commit
(sources/lake.py): ``_meta.json.new`` only ever lands in the route dir
after every data file of its batch is already there, so both crash
windows — (a) .new landed, old sidecar still present; (b) old deleted,
rename pending — recover by completing the swap. The r6 ADVICE item
this closes: the previous protocol parked the old sidecar in the
staging dir, so window (b) left the route with NO recoverable sidecar
anywhere outside a stranded .stage- dir.

compact_lake_table / delete_keys_from_table crash windows are covered
in test_lake_maintenance.py and test_keyed_delete.py; this file adds
the save-vs-sidecar window for the typed writer plus validate_lake's
healing behavior.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.operators.ingest import ingest_pipeline
from iotgp_func_raw_data_ingest_spark.sources.envelopes import envelopes_from_list
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    read_lake_table,
    write_lake_typed,
)
from iotgp_func_raw_data_ingest_spark.sources.maintenance import validate_lake
from tests.test_ingest import envelope


def _write_batch(spark, cfg, values):
    body = envelope([{"i": v} for v in values])
    routed = ingest_pipeline(envelopes_from_list(spark, [body]))
    return write_lake_typed(routed, cfg)


def test_next_write_completes_a_crashed_sidecar_swap(spark, tmp_path):
    """Window (a): _meta.json.new AND the old _meta.json both present
    (crash after landing .new, before deleting old). The next batch's
    write must first roll the stranded swap forward, then append —
    every batch's rows present exactly once, one final sidecar, no .new
    left behind."""
    cfg = EngineConfig(output_path=str(tmp_path / "lake"))
    dirs = _write_batch(spark, cfg, [1, 2, 3])
    route = dirs[0]
    # fabricate the crashed batch-2 state: its sidecar stuck at .new
    crashed = {"kind": "decoded_payload", "row_count": 999}
    with open(f"{route}/_meta.json.new", "w") as fh:
        json.dump(crashed, fh)

    dirs2 = _write_batch(spark, cfg, [4, 5])
    assert dirs2 == [route]
    assert not os.path.exists(f"{route}/_meta.json.new")
    with open(f"{route}/_meta.json") as fh:
        meta = json.load(fh)
    assert meta["row_count"] == 2  # the LATEST batch owns the sidecar
    back = read_lake_table(spark, cfg.output_path, "landing", "db", "tbl")
    assert sorted(int(r.i) for r in back.collect()) == [1, 2, 3, 4, 5]
    assert glob.glob(f"{route}/.stage-*") == []


def test_validate_lake_heals_new_only_window(spark, tmp_path):
    """Window (b): old sidecar deleted, rename pending — the route has
    ONLY _meta.json.new. validate_lake completes the swap (the batch's
    data is fully on disk by protocol) and reports the healing."""
    cfg = EngineConfig(output_path=str(tmp_path / "lake"))
    dirs = _write_batch(spark, cfg, [1, 2, 3])
    route = dirs[0]
    os.rename(f"{route}/_meta.json", f"{route}/_meta.json.new")
    assert not os.path.exists(f"{route}/_meta.json")

    reports = validate_lake(spark, cfg.output_path)
    assert len(reports) == 1
    rep = reports[0]
    assert "_meta.json.new (healed)" in rep["stranded"]
    assert rep["has_meta"] and rep["rows_match"] and rep["n_rows"] == 3
    assert os.path.exists(f"{route}/_meta.json")
    assert not os.path.exists(f"{route}/_meta.json.new")


def test_validate_lake_heals_both_present_window(spark, tmp_path):
    """Window (a) healed by the auditor instead of a next write: the
    .new sidecar must WIN (its batch's data files are already live)."""
    cfg = EngineConfig(output_path=str(tmp_path / "lake"))
    dirs = _write_batch(spark, cfg, [7, 8])
    route = dirs[0]
    shutil.copy(f"{route}/_meta.json", f"{route}/_meta.json.stale")
    os.rename(f"{route}/_meta.json", f"{route}/_meta.json.new")
    os.rename(f"{route}/_meta.json.stale", f"{route}/_meta.json")
    with open(f"{route}/_meta.json.new") as fh:
        newer = json.load(fh)
    newer["row_count"] = 2
    newer["marker"] = "from-new"
    with open(f"{route}/_meta.json.new", "w") as fh:
        json.dump(newer, fh)

    reports = validate_lake(spark, cfg.output_path)
    assert "_meta.json.new (healed)" in reports[0]["stranded"]
    with open(f"{route}/_meta.json") as fh:
        assert json.load(fh)["marker"] == "from-new"
    assert not os.path.exists(f"{route}/_meta.json.new")
    back = read_lake_table(spark, cfg.output_path, "landing", "db", "tbl")
    assert back.count() == 2


def test_crashed_stage_never_pollutes_reads_and_next_write_appends(
    spark, tmp_path
):
    """A run that died BEFORE any rename leaves only a dot-prefixed
    .stage- dir: readers must not see its rows, validate_lake must flag
    it, and a retry of the batch must land exactly once (the stage is
    not data — re-running the batch is the recovery)."""
    cfg = EngineConfig(output_path=str(tmp_path / "lake"))
    dirs = _write_batch(spark, cfg, [1, 2])
    route = dirs[0]
    # fabricate a crashed run's stage holding a fully-written batch
    stage = f"{route}/.stage-deadbeef"
    os.makedirs(stage)
    spark.createDataFrame([("9",)], "i string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)

    back = read_lake_table(spark, cfg.output_path, "landing", "db", "tbl")
    assert sorted(int(r.i) for r in back.collect()) == [1, 2]  # stage invisible
    reports = validate_lake(spark, cfg.output_path)
    assert ".stage-deadbeef" in reports[0]["stranded"]

    # the crashed batch retries: its rows land exactly once
    _write_batch(spark, cfg, [9])
    back = read_lake_table(spark, cfg.output_path, "landing", "db", "tbl")
    assert sorted(int(r.i) for r in back.collect()) == [1, 2, 9]
