"""Incremental rollup refresh + retention enforcement.

The rollup invariant under test is the one that matters at 100 TB:
N single-increment refreshes must equal one full recompute over the
union — otherwise "incremental" silently drifts from the truth.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources.lake import read_lake_table
from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
    aggregate_increment,
    expire_lake_partitions,
    incremental_rollup,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(dt.datetime(2024, 1, d, h), t, float(v)) for d, h, t, v in rows],
        "ts timestamp, event_type string, value double",
    )


ROWS_A = [(1, 0, "click", 1.0), (1, 1, "click", 2.0), (1, 0, "error", 5.0)]
ROWS_B = [(1, 2, "click", 4.0), (2, 0, "click", 8.0)]
ROWS_C = [(2, 5, "error", 1.5), (1, 3, "click", 0.5)]


def _rollup_dict(spark, lake):
    df = read_lake_table(spark, lake, "rollups", "db", "daily")
    return {
        (r["bucket_start"], r["event_type"]): (
            r["sum_v"],
            r["count_v"],
            r["min_v"],
            r["max_v"],
        )
        for r in df.collect()
    }


def test_incremental_equals_full_recompute(spark, tmp_path):
    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake")
    for rows in (ROWS_A, ROWS_B, ROWS_C):
        incremental_rollup(
            spark, lake, "rollups", "db", "daily", _events(spark, rows),
            "ts", "day", ["event_type"], "value", cfg,
        )
    incremental = _rollup_dict(spark, lake)

    full = {
        (r["bucket_start"], r["event_type"]): (
            r["sum_v"], r["count_v"], r["min_v"], r["max_v"]
        )
        for r in aggregate_increment(
            _events(spark, ROWS_A + ROWS_B + ROWS_C),
            "ts", "day", ["event_type"], "value",
        ).collect()
    }
    assert incremental == full
    # spot-check a merged bucket: Jan 1 clicks = 1+2+4+0.5 over 4 events
    jan1 = incremental[(dt.datetime(2024, 1, 1), "click")]
    assert jan1 == (7.5, 4, 0.5, 4.0)


def test_rollup_rejects_non_mergeable_agg(spark):
    with pytest.raises(ValueError):
        aggregate_increment(
            _events(spark, ROWS_A), "ts", "day", ["event_type"], "value",
            aggs=("avg",),
        )


def test_expire_lake_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("2024-01-0%d" % d, d) for d in range(1, 6)], ["day", "v"]
    )
    df.write.partitionBy("day").parquet(path)

    would = expire_lake_partitions(spark, path, "day", "2024-01-03", dry_run=True)
    assert would == ["2024-01-01", "2024-01-02"]
    # dry run deleted nothing
    assert spark.read.parquet(path).count() == 5

    dropped = expire_lake_partitions(spark, path, "day", "2024-01-03")
    assert dropped == ["2024-01-01", "2024-01-02"]
    left = spark.read.parquet(path)
    # partition-value inference types the strings as dates on read-back
    assert sorted(
        str(r.day) for r in left.select("day").distinct().collect()
    ) == ["2024-01-03", "2024-01-04", "2024-01-05"]
    # idempotent
    assert expire_lake_partitions(spark, path, "day", "2024-01-03") == []


def test_expire_missing_table_is_noop(spark, tmp_path):
    assert expire_lake_partitions(spark, str(tmp_path / "nope"), "day", "x") == []


def test_streaming_rollup_equals_batch_rollup(spark, tmp_path):
    import json as _json

    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_rollup_stream,
    )

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake")
    src = tmp_path / "in"
    src.mkdir()
    for i, rows in enumerate((ROWS_A, ROWS_B, ROWS_C)):
        lines = [
            _json.dumps(
                {"ts": f"2024-01-{d:02d}T{h:02d}:00:00", "event_type": t, "value": v}
            )
            for d, h, t, v in rows
        ]
        (src / f"b{i}.json").write_text("\n".join(lines) + "\n")
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).option("maxFilesPerTrigger", 1).json(str(src))
    q = start_rollup_stream(
        stream, lake, "rollups", "db", "daily", "ts", "day",
        ["event_type"], "value", cfg, str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = _rollup_dict(spark, lake)
    want = {
        (r["bucket_start"], r["event_type"]): (
            r["sum_v"], r["count_v"], r["min_v"], r["max_v"]
        )
        for r in aggregate_increment(
            _events(spark, ROWS_A + ROWS_B + ROWS_C),
            "ts", "day", ["event_type"], "value",
        ).collect()
    }
    assert got == want and got


def test_rollup_replay_with_batch_id_is_idempotent(spark, tmp_path):
    # crash window simulation: the same batch applied twice (as a
    # foreachBatch replay would) must NOT double-merge when batch_id is
    # threaded through to the in-directory marker
    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake")
    incremental_rollup(
        spark, lake, "rollups", "db", "daily", _events(spark, ROWS_A),
        "ts", "day", ["event_type"], "value", cfg, batch_id=0,
    )
    first = _rollup_dict(spark, lake)
    incremental_rollup(  # replay of batch 0
        spark, lake, "rollups", "db", "daily", _events(spark, ROWS_A),
        "ts", "day", ["event_type"], "value", cfg, batch_id=0,
    )
    assert _rollup_dict(spark, lake) == first
    # the next batch id still applies normally
    incremental_rollup(
        spark, lake, "rollups", "db", "daily", _events(spark, ROWS_B),
        "ts", "day", ["event_type"], "value", cfg, batch_id=1,
    )
    assert _rollup_dict(spark, lake) != first


def test_validate_lake_reports_health(spark, tmp_path):
    from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import validate_lake

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    upsert_lake_table(spark, lake, "f", "db", "good", df, ["id"], cfg)
    # a route written without a sidecar + a stranded swap dir
    df.write.parquet(f"{lake}/f/db/plain")
    df.write.parquet(f"{lake}/f/db/crashed.compact-old")
    df.write.parquet(f"{lake}/f/db/crashed")

    reports = {r["route"]: r for r in validate_lake(spark, lake)}
    assert reports["f/db/good"]["rows_match"] and reports["f/db/good"]["has_meta"]
    assert reports["f/db/good"]["n_rows"] == 2
    assert not reports["f/db/plain"]["has_meta"]
    assert reports["f/db/plain"]["rows_match"]  # no sidecar -> vacuously ok
    assert reports["f/db/crashed"]["stranded"] == [".compact-old"]
    assert "f/db/crashed.compact-old" not in reports


def test_validate_lake_missing_root(spark, tmp_path):
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import validate_lake

    assert validate_lake(spark, str(tmp_path / "nope")) == []


def test_approx_distinct_rollup_is_mergeable(spark, tmp_path):
    """approx_distinct partials are HLL sketch BINARIES: N increment
    refreshes must union to exactly the sketch a full recompute builds
    (register-max union is insertion/merge-order insensitive), and the
    read-time estimate equals the exact distinct count at toy
    cardinality."""
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        rollup_distinct_estimate,
    )

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake_hll")
    # value doubles as the "user id" being distinct-counted; duplicates
    # across increments must not inflate the estimate
    a = [(1, 0, "click", 1.0), (1, 1, "click", 2.0), (1, 2, "click", 1.0)]
    b = [(1, 3, "click", 2.0), (1, 4, "click", 3.0), (2, 0, "click", 7.0)]
    aggs = ("count", "approx_distinct")
    for rows in (a, b):
        incremental_rollup(
            spark, lake, "rollups", "db", "daily", _events(spark, rows),
            "ts", "day", ["event_type"], "value", cfg, aggs=aggs,
        )
    rolled = rollup_distinct_estimate(
        read_lake_table(spark, lake, "rollups", "db", "daily")
    )
    got = {
        (r["bucket_start"], r["event_type"]): (r["count_v"], r["approx_distinct_v"])
        for r in rolled.collect()
    }
    # Jan 1 clicks: 5 rows over values {1.0, 2.0, 3.0} -> 3 distinct
    assert got[(dt.datetime(2024, 1, 1), "click")] == (5, 3)
    assert got[(dt.datetime(2024, 1, 2), "click")] == (1, 1)

    # incremental sketch == full-recompute sketch, byte-for-byte
    full = aggregate_increment(
        _events(spark, a + b), "ts", "day", ["event_type"], "value", aggs=aggs
    )
    full_bytes = {
        (r["bucket_start"], r["event_type"]): bytes(r["approx_distinct_v"])
        for r in full.collect()
    }
    inc_bytes = {
        (r["bucket_start"], r["event_type"]): bytes(r["approx_distinct_v"])
        for r in read_lake_table(spark, lake, "rollups", "db", "daily").collect()
    }
    assert inc_bytes == full_bytes


def test_approx_quantile_rollup_is_mergeable(spark, tmp_path):
    """approx_quantile partials are KLL sketch binaries. Invariants:
    N increment refreshes answer the same quantiles as one full
    recompute, and in exact mode (n < k) the read-time estimate IS the
    disc quantile at rank ceil(q*n) — pinned against hand-computed
    values."""
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        rollup_quantile_estimate,
    )

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake_kll")
    a = [(1, 0, "click", 1.0), (1, 1, "click", 1.0), (1, 2, "click", 2.0)]
    b = [(1, 3, "click", 2.0), (1, 4, "click", 3.0), (2, 0, "click", 7.0)]
    aggs = ("count", "approx_quantile")
    for rows in (a, b):
        incremental_rollup(
            spark, lake, "rollups", "db", "daily", _events(spark, rows),
            "ts", "day", ["event_type"], "value", cfg, aggs=aggs,
        )
    fracs = {"p25": 0.25, "p50": 0.5, "p95": 0.95, "p100": 1.0}
    rolled = rollup_quantile_estimate(
        read_lake_table(spark, lake, "rollups", "db", "daily"), fracs
    )
    got = {
        (r["bucket_start"], r["event_type"]): (
            r["count_v"], r["p25"], r["p50"], r["p95"], r["p100"]
        )
        for r in rolled.collect()
    }
    # Jan 1 clicks sorted: [1,1,2,2,3]; rank ceil(q*5) -> 1.0, 2.0, 3.0, 3.0
    assert got[(dt.datetime(2024, 1, 1), "click")] == (5, 1.0, 2.0, 3.0, 3.0)
    assert got[(dt.datetime(2024, 1, 2), "click")] == (1, 7.0, 7.0, 7.0, 7.0)

    # incremental == full recompute, estimate-for-estimate
    full = rollup_quantile_estimate(
        aggregate_increment(
            _events(spark, a + b), "ts", "day", ["event_type"], "value", aggs=aggs
        ),
        fracs,
    )
    full_got = {
        (r["bucket_start"], r["event_type"]): (
            r["count_v"], r["p25"], r["p50"], r["p95"], r["p100"]
        )
        for r in full.collect()
    }
    assert got == full_got


def test_validate_lake_flags_staged_replace_dirs(spark, tmp_path):
    """A stranded .merge-stage- / .delete-stage- dir (crashed pruned
    merge or keyed delete) must surface in the route's stranded list —
    presence means a writer crashed, even though readers never see the
    dot-dir and the next maintenance writer heals it."""
    import os

    from iotgp_func_raw_data_ingest_spark.sources.maintenance import validate_lake

    lake = str(tmp_path / "lake")
    route = f"{lake}/f/db/t"
    spark.range(10).selectExpr("id AS k").write.parquet(route)
    os.makedirs(f"{route}/.merge-stage-x")
    os.makedirs(f"{route}/.delete-stage-y")
    (rep,) = validate_lake(spark, lake)
    assert ".merge-stage-x" in rep["stranded"]
    assert ".delete-stage-y" in rep["stranded"]
