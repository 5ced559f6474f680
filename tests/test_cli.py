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
