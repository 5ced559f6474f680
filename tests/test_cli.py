"""CLI surface: list/run/ingest/expire verbs drive the library correctly."""

from __future__ import annotations

import base64
import json

from iotgp_func_raw_data_ingest_spark.__main__ import main


def test_cli_list_filters_by_prefix(capsys):
    assert main(["list", "q155"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["q155_heavy_hitter_keys"]


def test_cli_run_unknown_query_errors(capsys):
    assert main(["run", "q999_nope"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_run_and_explain(spark, capsys):
    assert main(["run", "q170_field_completeness",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    assert "n_rows" in capsys.readouterr().out
    assert main(["explain", "q16_topk",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_cli_ingest_writes_typed_lake(spark, tmp_path, capsys):
    rows = [{"a": 1}, {"a": 2}]
    body = json.dumps(
        {
            "Source": "db.tbl",
            "Data": base64.b64encode(json.dumps(rows).encode()).decode(),
            "MessageType": "Raw",
        }
    )
    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.txt").write_text(body + "\n")
    lake = str(tmp_path / "lake")
    assert main(["ingest", str(src), lake]) == 0
    out = capsys.readouterr().out
    assert "/db/tbl" in out
    assert spark.read.option("mergeSchema", "true").parquet(
        out.strip().splitlines()[-1]
    ).count() == 2


def test_cli_expire_dry_run(spark, tmp_path, capsys):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2)], ["day", "v"]
    ).write.partitionBy("day").parquet(path)
    assert main(["expire", path, "day", "2024-01-02", "--dry-run"]) == 0
    assert "would drop: ['2024-01-01']" in capsys.readouterr().out
    assert spark.read.parquet(path).count() == 2


def test_cli_validate(spark, tmp_path, capsys):
    from iotgp_func_raw_data_ingest_spark.config import EngineConfig
    from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table

    lake = str(tmp_path / "lake")
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    upsert_lake_table(spark, lake, "f", "db", "t", df, ["id"], EngineConfig())
    assert main(["validate", lake]) == 0
    out = capsys.readouterr().out
    assert "f/db/t: rows=1 meta=1 ok" in out


def test_cli_stream_ingest_once(spark, tmp_path):
    """stream-ingest --once drains the directory through the checkpointed
    foreachBatch sink and exits; a second --once run on the same
    checkpoint re-appends nothing (ledger + offsets)."""
    rows = [{"a": 1}, {"a": 2}]
    body = json.dumps(
        {
            "Source": "db.tbl",
            "Data": base64.b64encode(json.dumps(rows).encode()).decode(),
            "MessageType": "Raw",
        }
    )
    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.txt").write_text(body + "\n")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    assert main(["stream-ingest", str(src), lake, ckpt, "--once"]) == 0
    route = f"{lake}/assorted/db/tbl"
    assert spark.read.parquet(route).count() == 2
    # restart on the drained checkpoint: no duplicate appends
    assert main(["stream-ingest", str(src), lake, ckpt, "--once"]) == 0
    assert spark.read.parquet(route).count() == 2


def test_cli_snapshot_changes_ivm_lifecycle(spark, tmp_path, capsys):
    """The snapshot/feed/IVM verbs compose end-to-end from the CLI:
    enable → mutate (keyed delete) → log shows both generations →
    changes prints the feed → ivm-refresh builds then no-ops →
    snapshot-prune reports retention."""
    from pyspark.sql import functions as F

    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        delete_keys_from_table,
    )

    route = str(tmp_path / "lake" / "curated" / "crm" / "accounts")
    spark.range(1, 101).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("seg"),
        F.col("id").cast("decimal(10,2)").alias("bal"),
    ).repartition(2).write.parquet(route)

    assert main(["snapshot-enable", route]) == 0
    assert "generation: 1" in capsys.readouterr().out

    doomed = spark.range(1, 11).select(F.col("id").alias("k"))
    delete_keys_from_table(spark, route, "k", doomed)

    assert main(["snapshot-log", route]) == 0
    log = capsys.readouterr().out
    assert "gen 1: kind=enable" in log and "gen 2: kind=delete" in log

    assert main(["changes", route, "1", "2", "--key-cols", "k"]) == 0
    out = capsys.readouterr().out
    assert "delete" in out and "_change_type" in out

    view = str(tmp_path / "view")
    cli = ["ivm-refresh", route, view, "--group-cols", "seg",
           "--sum-cols", "bal"]
    assert main(cli) == 0
    assert capsys.readouterr().out.startswith("initial")
    assert main(cli) == 0
    assert capsys.readouterr().out.startswith("noop")

    assert main(["snapshot-prune", route, "--keep", "1"]) == 0
    assert "pruned generations: [1]" in capsys.readouterr().out

    assert main(["snapshot-log", str(tmp_path / "nolake")]) == 1


def test_cli_live_only_flags(spark, tmp_path, capsys):
    """--live-only on the changes and ivm-refresh verbs consumes the
    live-table view of a tombstone-bearing route: the live IVM build
    excludes tombstone rows, the physical one counts them."""
    from pyspark.sql import functions as F

    from iotgp_func_raw_data_ingest_spark.sources import ivm, snapshots as snap

    route = str(tmp_path / "lake" / "curated" / "crm" / "accounts")
    spark.range(1, 21).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("seg"),
        F.col("id").cast("double").alias("bal"),
        F.col("id").alias("_seq"),
        (F.col("id") <= 5).alias("_deleted"),  # 5 tombstones, 15 live
    ).coalesce(2).write.parquet(route)
    snap.enable_snapshots(spark, route)

    vlive, vphys = str(tmp_path / "v_live"), str(tmp_path / "v_phys")
    assert main(["ivm-refresh", route, vlive, "--group-cols", "seg",
                 "--live-only"]) == 0
    assert main(["ivm-refresh", route, vphys, "--group-cols", "seg"]) == 0
    capsys.readouterr()
    total = lambda v: sum(  # noqa: E731
        r["n_rows"] for r in ivm.read_view(spark, v).collect()
    )
    assert total(vlive) == 15
    assert total(vphys) == 20

    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        delete_keys_from_table,
    )

    doomed = spark.range(10, 13).select(F.col("id").alias("k"))
    delete_keys_from_table(spark, route, "k", doomed)  # gen 2: 3 live keys
    assert main(["changes", route, "1", "2", "--key-cols", "k",
                 "--live-only"]) == 0
    out = capsys.readouterr().out
    assert "delete" in out and "_change_type" in out


def test_cli_expire_tombstones_and_vacuum_grace(spark, tmp_path, capsys):
    """expire-tombstones removes at/below the horizon and reports the
    split; snapshot-prune surfaces the vacuum grace deferral and the
    --vacuum-grace override."""
    from pyspark.sql import functions as F

    from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        delete_keys_from_table,
    )

    route = str(tmp_path / "lake" / "curated" / "crm" / "accounts")
    spark.range(1, 21).select(
        F.col("id").alias("k"),
        F.col("id").cast("string").alias("name"),
        F.when(F.col("id") <= 4, True).otherwise(False).alias("_deleted"),
        (F.col("id") * 10).alias("_seq"),
    ).coalesce(1).write.parquet(route)

    assert main(["expire-tombstones", route, "25"]) == 0
    out = capsys.readouterr().out
    assert "removed 2 tombstone(s)" in out  # _seq 10, 20 <= 25

    assert main(["expire-tombstones", route, "1000"]) == 0
    assert "removed 2 tombstone(s)" in capsys.readouterr().out  # 30, 40

    # vacuum grace: a just-retired file defers the vacuum step ...
    snap.enable_snapshots(spark, route)
    delete_keys_from_table(
        spark, route, "k", spark.range(5, 8).select(F.col("id").alias("k"))
    )
    assert main(["snapshot-prune", route, "--keep", "1"]) == 0
    assert "vacuum deferred" in capsys.readouterr().out
    # ... and --vacuum-grace 0 forces it on the quiesced route
    assert main(["snapshot-prune", route, "--keep", "1",
                 "--vacuum-grace", "0"]) == 0
    assert "vacuumed files: 1" in capsys.readouterr().out


def test_cli_changes_stream_export(spark, tmp_path, capsys):
    """The changes-stream verb drains the ledger once per invocation:
    first run exports nothing (gen 1 is the enable), a mutation then
    exports its span, a third run finds the ledger quiet."""
    from pyspark.sql import functions as F

    from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        delete_keys_from_table,
    )

    route = str(tmp_path / "lake" / "curated" / "crm" / "accounts")
    spark.range(1, 51).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("bal")
    ).coalesce(2).write.parquet(route)
    snap.enable_snapshots(spark, route)

    outdir = str(tmp_path / "export")
    cli = ["changes-stream", route, outdir,
           "--checkpoint", str(tmp_path / "ckpt"), "--key-cols", "k"]
    assert main(cli) == 0
    assert "nothing new" in capsys.readouterr().out

    delete_keys_from_table(
        spark, route, "k", spark.range(1, 6).select(F.col("id").alias("k"))
    )
    assert main(cli) == 0
    assert "exported span (1, 2]: 5 change row(s)" in capsys.readouterr().out
    got = spark.read.parquet(outdir)
    assert got.count() == 5
    assert set(got.columns) >= {"k", "bal", "_change_type",
                                "from_gen", "to_gen"}

    assert main(cli) == 0
    assert "nothing new" in capsys.readouterr().out


def test_cli_changes_stream_replayed_span_is_idempotent(spark, tmp_path, capsys):
    """The documented at-least-once residual: a crash AFTER the span's
    export landed but BEFORE both commit markers (the batch ledger's and
    Spark's) replays the span on the next invocation. Because each span
    overwrites its own from_gen=N/to_gen=M directory, the replay is a
    file-level rewrite — row counts must not inflate."""
    import os

    from pyspark.sql import functions as F

    from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        delete_keys_from_table,
    )

    route = str(tmp_path / "lake" / "curated" / "crm" / "accounts")
    spark.range(1, 51).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("bal")
    ).coalesce(2).write.parquet(route)
    snap.enable_snapshots(spark, route)
    delete_keys_from_table(
        spark, route, "k", spark.range(1, 6).select(F.col("id").alias("k"))
    )

    outdir = str(tmp_path / "export")
    ckpt = str(tmp_path / "ckpt")
    cli = ["changes-stream", route, outdir,
           "--checkpoint", ckpt, "--key-cols", "k"]
    assert main(cli) == 0
    assert "exported span (1, 2]: 5 change row(s)" in capsys.readouterr().out

    # crash simulation: the export landed, neither marker did — the
    # restarted stream re-runs the sink for the same span
    for marker in os.listdir(f"{ckpt}/_committed_batches"):
        os.remove(f"{ckpt}/_committed_batches/{marker}")
    commits = sorted(
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"
    if os.path.exists(crc):
        os.remove(crc)

    assert main(cli) == 0
    assert "exported span (1, 2]: 5 change row(s)" in capsys.readouterr().out
    got = spark.read.parquet(outdir)
    assert got.count() == 5  # replay rewrote the span, duplicated nothing
    assert got.filter(F.col("from_gen") == 1).count() == 5
