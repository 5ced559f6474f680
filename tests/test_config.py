"""EngineConfig validation (reference E5 fail-fast parity) + env loading
+ schema drift across ingest batches."""

from __future__ import annotations

import pytest

from iotgp_func_raw_data_ingest_spark.config import EngineConfig


def test_defaults_valid():
    cfg = EngineConfig()
    assert cfg.max_batch_size == 2000
    assert cfg.parquet_compression == "snappy"
    assert cfg.destination_fallback == "assorted"


@pytest.mark.parametrize(
    "kwargs",
    [
        {"max_batch_size": 0},
        {"max_batch_size": -5},
        {"parquet_compression": "brotli9000"},
        {"destination_fallback": ""},
        {"output_path": ""},
        {"shuffle_partitions": 0},
    ],
)
def test_invalid_configs_fail_fast(kwargs):
    with pytest.raises(ValueError):
        EngineConfig(**kwargs)


def test_from_env(monkeypatch):
    monkeypatch.setenv("MAX_BATCH_SIZE", "500")
    monkeypatch.setenv("PARQUET_COMPRESSION", "zstd")
    monkeypatch.setenv("DESTINATION_FALLBACK", "landing")
    cfg = EngineConfig.from_env(output_path="/tmp/x")
    assert (cfg.max_batch_size, cfg.parquet_compression, cfg.destination_fallback) == (
        500,
        "zstd",
        "landing",
    )


def test_schema_drift_across_batches(spark, tmp_path):
    """Two micro-batches with different columns for the SAME route: the
    reference's per-batch union-of-keys drift (SURVEY §7.4). Each batch
    writes its own schema; read-back with mergeSchema unions them."""
    from iotgp_func_raw_data_ingest_spark.operators.ingest import ingest_pipeline
    from iotgp_func_raw_data_ingest_spark.sources.envelopes import envelopes_from_list
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        read_lake_table,
        write_lake_typed,
    )
    from tests.test_ingest import envelope

    cfg = EngineConfig(output_path=str(tmp_path / "lake"))
    batch1 = ingest_pipeline(envelopes_from_list(spark, [envelope([{"a": 1}])]))
    write_lake_typed(batch1, cfg)
    batch2 = ingest_pipeline(
        envelopes_from_list(spark, [envelope([{"a": 2, "b": "new-col"}])])
    )
    write_lake_typed(batch2, cfg)

    merged = read_lake_table(spark, cfg.output_path, "landing", "db", "tbl")
    assert sorted(merged.columns) == ["a", "b"]
    rows = {r.a: r.b for r in merged.collect()}
    assert rows == {"1": None, "2": "new-col"}  # old rows null-padded
