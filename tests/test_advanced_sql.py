"""Semantic invariants for the q198–q201 tranche (recursive CTE,
Variant JSON, Python UDTF, Python DataSource) plus direct unit tests of
the two new extension-point modules."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans import QUERIES
from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------- q198
def test_recursive_hierarchy_partitions_all_customers(spark):
    rows = QUERIES["q198_recursive_hierarchy"](spark, SF_SMOKE).collect()
    n_customers = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").count()
    # every customer lands in exactly one (root, depth) stratum
    assert sum(r["n_members"] for r in rows) == n_customers
    # roots are the custkeys < 10, each its own depth-0 singleton
    depth0 = [r for r in rows if r["depth"] == 0]
    assert all(r["n_members"] == 1 for r in depth0)
    assert {r["root"] for r in depth0} == {r["root"] for r in rows}
    assert all(0 <= r["root"] < 10 for r in rows)
    # parent(k) = k div 10 ⇒ depth d holds custkeys with d+1 more digits
    for r in rows:
        assert r["depth"] <= 5


# ---------------------------------------------------------------- q199
def test_variant_json_counts_align(spark):
    rows = QUERIES["q199_variant_json"](spark, SF_SMOKE).collect()
    n_events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert sum(r["n_events"] for r in rows) == n_events
    for r in rows:
        # '$.missing' is absent from every props payload
        assert r["n_missing"] == r["n_events"]
        assert r["max_k"] >= 0 and r["sum_k"] >= r["max_k"]


# ---------------------------------------------------------------- q200
def test_udtf_chunks_tile_each_document(spark):
    rows = QUERIES["q200_udtf_chunking"](spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    lengths = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    assert set(by_doc) == {d for d, n in lengths.items() if n > 0}
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        assert all(c["chunk_len"] == 200 for c in chunks[:-1])
        assert 1 <= chunks[-1]["chunk_len"] <= 200
        assert sum(c["chunk_len"] for c in chunks) == lengths[doc_id]


def test_udtf_overlapping_stride_stops_at_end(spark):
    from iotgp_func_raw_data_ingest_spark.operators.udtfs import register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM chunk_text('abcdefgh', 5, 3) ORDER BY chunk_id"
    ).collect()
    # starts 0 and 3; the window reaching the end stops the iteration,
    # so no chunk is a proper suffix of the previous one
    assert [(r.chunk_id, r.chunk_text, r.chunk_len) for r in rows] == [
        (0, "abcde", 5),
        (1, "defgh", 5),
    ]
    one = spark.sql("SELECT * FROM chunk_text('ab', 5, 5)").collect()
    assert [(r.chunk_id, r.chunk_text, r.chunk_len) for r in one] == [(0, "ab", 2)]
    assert spark.sql("SELECT * FROM chunk_text(CAST(NULL AS STRING), 5, 5)").count() == 0
    assert spark.sql("SELECT * FROM chunk_text('abc', 0, 0)").count() == 0


# ---------------------------------------------------------------- q201
def test_python_datasource_matches_native_reader(spark):
    from iotgp_func_raw_data_ingest_spark.sources.pydatasource import (
        register_python_datasources,
    )

    register_python_datasources(spark)
    via_pyds = (
        spark.read.format("parquet_rowgroups")
        .option("path", f"{SF_SMOKE}/documents.parquet")
        .load()
    )
    native = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert via_pyds.schema == native.schema
    assert sorted(map(tuple, via_pyds.collect())) == sorted(
        map(tuple, native.collect())
    )


def test_python_datasource_plans_one_partition_per_row_group(spark, tmp_path):
    from iotgp_func_raw_data_ingest_spark.sources.pydatasource import (
        ParquetRowGroupReader,
        register_python_datasources,
    )

    path = str(tmp_path / "rg.parquet")
    table = pa.table({"a": list(range(100)), "b": [f"s{i}" for i in range(100)]})
    pq.write_table(table, path, row_group_size=30)  # → 4 row groups

    reader = ParquetRowGroupReader({"path": path})
    assert len(reader.partitions()) == 4

    register_python_datasources(spark)
    df = spark.read.format("parquet_rowgroups").option("path", path).load()
    assert df.count() == 100
    assert df.rdd.getNumPartitions() == 4
    # column pruning via the option limits the schema
    pruned = (
        spark.read.format("parquet_rowgroups")
        .option("path", path)
        .option("columns", "a")
        .load()
    )
    assert pruned.columns == ["a"]
    assert pruned.agg({"a": "sum"}).collect()[0][0] == sum(range(100))


# ---------------------------------------------------------------- q202
def test_stream_source_slices_across_row_groups(spark, tmp_path):
    """rows_per_batch deliberately misaligned with the row-group size:
    every row must arrive exactly once, and a checkpoint restart must
    re-emit nothing."""
    from iotgp_func_raw_data_ingest_spark.sources.pydatasource import (
        ParquetReplayStreamReader,
        register_python_datasources,
    )

    path = str(tmp_path / "rg.parquet")
    pq.write_table(pa.table({"a": list(range(100))}), path, row_group_size=30)
    register_python_datasources(spark)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    for run in range(2):
        q = (
            spark.readStream.format("parquet_replay_stream")
            .option("path", path)
            .option("rows_per_batch", "17")  # straddles the 30-row groups
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(r.a for r in spark.read.parquet(out).collect())
        assert got == list(range(100)), f"run {run}: {len(got)} rows"

    # unit-level: a partition overlapping two row groups reads its exact range
    reader = ParquetReplayStreamReader({"path": path, "rows_per_batch": "17"})
    part = reader.partitions({"row": 17}, {"row": 34})[0]
    assert [t[0] for t in reader.read(part)] == list(range(17, 34))
    assert reader.latestOffset() == {"row": 100}


# ---------------------------------------------------------------- q203
def test_statestore_reader_returns_unique_dedup_keys(spark):
    rows = QUERIES["q203_statestore_introspection"](spark, SF_SMOKE).collect()
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users))  # one state row per key
    expected = {
        r.user_id
        for r in spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id")
        .collect()
    }
    assert set(users) == expected


# ---------------------------------------------------------------- q207
def test_observed_metrics_match_direct_aggregate(spark):
    row = QUERIES["q207_observed_write_accounting"](spark, SF_SMOKE).collect()[0]
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert row["n_rows"] == ev.count()
    assert row["sum_event_id"] == ev.groupBy().sum("event_id").collect()[0][0]
    assert row["n_clicks"] == ev.filter("event_type = 'click'").count()


# ---------------------------------------------------------------- q208
def test_xml_roundtrip_survives_escaping(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 'a<b&c>"d"'), (2, "x '&amp;' y"), (3, "plain")], "k long, s string"
    )
    back = (
        df.select(F.to_xml(F.struct("k", "s")).alias("doc"))
        .select(F.from_xml("doc", "k BIGINT, s STRING").alias("p"))
        .select("p.*")
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------- q209
def test_collated_grouping_folds_case(spark):
    rows = QUERIES["q209_collated_grouping"](spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    direct = {
        r["lang"]: r["n"]
        for r in docs.groupBy(docs.lang.alias("lang")).count()
        .withColumnRenamed("count", "n").collect()
    }
    got = {r["lang_ci"]: r["n_docs"] for r in rows}
    assert got == direct  # upper-cased halves folded back into one class
    assert all(k == k.lower() for k in got)


# ---------------------------------------------------------------- q210
def test_approx_top_k_exact_under_capacity(spark):
    rows = QUERIES["q210_approx_top_k"](spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    direct = {
        r["event_type"]: r["count"] for r in ev.groupBy("event_type").count().collect()
    }
    assert {r["item"]: r["cnt"] for r in rows} == direct


# ---------------------------------------------------------------- q204
def test_pipe_syntax_matches_ansi_form(spark):
    piped = QUERIES["q204_pipe_syntax"](spark, SF_SMOKE)
    from iotgp_func_raw_data_ingest_spark.plans.registry import ORACLES

    ansi = spark.sql(ORACLES["q204_pipe_syntax"])  # the oracle is ANSI enough to run in Spark too
    assert sorted(map(tuple, piped.collect())) == sorted(map(tuple, ansi.collect()))


def test_pipe_syntax_same_physical_shape(spark):
    """The pipe stages are sugar: both forms must execute the same
    physical operator set with the shipdate filter pushed to parquet."""
    import re

    from iotgp_func_raw_data_ingest_spark.plans.registry import ORACLES

    piped = QUERIES["q204_pipe_syntax"](spark, SF_SMOKE)
    ansi = spark.sql(ORACLES["q204_pipe_syntax"])

    def op_multiset(df):
        s = df._jdf.queryExecution().executedPlan().toString()
        return sorted(re.findall(r"^\s*[+:*-]*\s*\(?\d*\)?\s*([A-Za-z]+)", s, re.M))

    assert op_multiset(piped) == op_multiset(ansi)
    plan = piped._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(l_shipdate" in plan  # pushed, not residual


def test_sql_scripting_loop_matches_direct_aggregate(spark):
    """q221's loop-carried scalars must equal the closed-form aggregates
    computed directly: weighted_total = Σ(seg+1)·|seg|, and the chained
    hash replayed in Python over the same per-segment sums."""
    from tests.conftest import SF_SMOKE

    row = QUERIES["q221_sql_scripting"](spark, SF_SMOKE).collect()[0]
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    aggs = {
        r["seg"]: (r["n"], r["s"])
        for r in cust.selectExpr(
            "c_custkey % 5 AS seg", "c_nationkey"
        )
        .groupBy("seg")
        .agg(F.count("*").alias("n"), F.sum("c_nationkey").alias("s"))
        .collect()
    }
    acc, chain = 0, 1
    for seg in range(5):
        n, s = aggs.get(seg, (0, 0))
        acc += (seg + 1) * n
        chain = (chain * 31 + s) % 1000000007
    assert (row["weighted_total"], row["chained_hash"]) == (acc, chain)


def test_sql_scalar_udf_inlines_to_jvm_plan(spark):
    """q222's SQL UDF must be inlined by Catalyst: no Python evaluation
    node in the physical plan, and the scores must match computing the
    body inline."""
    from tests.conftest import SF_SMOKE

    df = QUERIES["q222_sql_scalar_udf"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    got = {r["lang"]: r["sum_score"] for r in df.collect()}
    inline = {
        r["lang"]: r["sum_score"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .selectExpr(
            "lang",
            "CAST(length(text) AS BIGINT) * 10000"
            " DIV (1 + size(split(text, ' '))) AS score",
        )
        .groupBy("lang")
        .agg(F.sum("score").alias("sum_score"))
        .collect()
    }
    assert got == inline


def test_sql_table_udf_plans_as_generate_not_python(spark):
    """q223's TVF must plan as a JVM lateral Generate (explode), never a
    Python UDTF node — the cost contrast with q200 that the module
    docstring claims."""
    from tests.conftest import SF_SMOKE

    df = QUERIES["q223_sql_table_udf"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan or "Generate" in plan
    assert "PythonUDTF" not in plan and "BatchEvalPython" not in plan
    rows = df.collect()
    assert len(rows) == 20
    pairs = [(r["n"], r["term"]) for r in rows]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
    assert all(len(r["term"]) > 3 and r["n"] >= r["n_docs"] >= 1 for r in rows)
