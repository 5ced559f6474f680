"""Tests for the scale/streaming extensions: salted aggregation & join,
stateful streaming dedup/counters, typed-view inference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators.skew import (
    salted_join,
    salted_sum_count,
)
from iotgp_func_raw_data_ingest_spark.operators.typed import (
    infer_column_types,
    typed_view,
)
from iotgp_func_raw_data_ingest_spark.streaming.stateful import (
    running_counters,
    streaming_dedup,
)


def test_salted_sum_count_matches_plain(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plain = {
        (r.l_returnflag,): (round(r.s, 2), r.c)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        (r.l_returnflag,): (round(r.sum_l_quantity, 2), r.cnt)
        for r in salted_sum_count(
            li, ["l_returnflag"], "l_quantity", unique_col="l_orderkey", n_salts=8
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    supp = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    plain = li.join(supp, F.col("l_suppkey") == F.col("s_suppkey")).count()
    salted = salted_join(
        li, supp, "l_suppkey", "s_suppkey", unique_large="l_orderkey", n_salts=4
    ).count()
    assert salted == plain


def test_streaming_dedup_across_batches(spark, tmp_path):
    """A key arriving in two micro-batches is emitted exactly once."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.json").write_text('{"key": "a"}\n{"key": "a"}\n{"key": "b"}')
    stream = spark.readStream.schema("key string").json(str(src))
    out = streaming_dedup(stream, "key")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    first = {r.key: r.first_seen_count for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert first == {"a": 2, "b": 1}

    # second batch: duplicate 'a' absorbed, new 'c' emitted
    (src / "b2.json").write_text('{"key": "a"}\n{"key": "c"}')
    q2 = (
        out.writeStream.format("memory")
        .queryName("dedup_out2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_d"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    keys2 = {r.key for r in spark.sql("SELECT * FROM dedup_out2").collect()}
    assert "c" in keys2


def test_running_counters(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.json").write_text('{"key": "x"}\n{"key": "x"}\n{"key": "y"}')
    stream = spark.readStream.schema("key string").json(str(src))
    q = (
        running_counters(stream, "key")
        .writeStream.format("memory")
        .queryName("counter_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.key: (r.total, r.batches) for r in spark.sql("SELECT * FROM counter_out").collect()}
    assert got == {"x": (2, 1), "y": (1, 1)}


def test_typed_view_inference(spark):
    df = spark.createDataFrame(
        [
            ("1", "1.5", "2024-01-01 10:00:00", "true", "plain"),
            ("2", "2", "2024-02-02 00:00:00", "false", "3"),
            (None, "x", None, None, "txt"),
        ],
        "a string, b string, c string, d string, e string",
    )
    types = infer_column_types(df)
    assert types == {"a": "long", "b": "string", "c": "timestamp", "d": "boolean", "e": "string"}
    typed = typed_view(df, types)
    assert dict(typed.dtypes)["a"] == "bigint"
    rows = typed.orderBy("a").collect()
    assert rows[-1].a == 2 and rows[-1].d is False


def test_typed_view_on_ingested_lake(spark, tmp_path):
    """End-to-end: stringly lake table → typed view with numeric column."""
    from iotgp_func_raw_data_ingest_spark.config import EngineConfig
    from iotgp_func_raw_data_ingest_spark.operators.ingest import ingest_pipeline
    from iotgp_func_raw_data_ingest_spark.sources.envelopes import envelopes_from_list
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        read_lake_table,
        write_lake_typed,
    )
    from tests.test_ingest import envelope

    routed = ingest_pipeline(
        envelopes_from_list(spark, [envelope([{"n": 1, "s": "a"}, {"n": 2, "s": "b"}])])
    )
    cfg = EngineConfig(output_path=str(tmp_path / "lake"))
    write_lake_typed(routed, cfg)
    raw = read_lake_table(spark, cfg.output_path, "landing", "db", "tbl")
    assert dict(raw.dtypes) == {"n": "string", "s": "string"}  # parity mode
    typed = typed_view(raw)
    assert dict(typed.dtypes)["n"] == "bigint"  # typed mode
    assert typed.agg(F.sum("n")).collect()[0][0] == 3
