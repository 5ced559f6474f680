"""partitioned_prefix_sum must equal the naive global-window running sum
for any unique-key input, regardless of partition-boundary placement."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iotgp_func_raw_data_ingest_spark.operators.prefix import partitioned_prefix_sum


def _naive(df, order_col, value_col):
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("cum", F.sum(value_col).over(w))


def test_prefix_sum_matches_naive(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.pmod(F.col("id") * 7919, F.lit(97))).alias("v")
    )
    got = {
        r.k: r.cum
        for r in partitioned_prefix_sum(df, "k", "v", num_partitions=7).collect()
    }
    want = {r.k: r.cum for r in _naive(df, "k", "v").collect()}
    assert got == want


def test_prefix_sum_total_and_single_partition(spark):
    # total column matches the sum; degenerate partition counts still work
    df = spark.range(1, 51).select(F.col("id").alias("k"), F.col("id").alias("v"))
    for n in (1, 3, 64):  # fewer rows than partitions is fine too
        rows = partitioned_prefix_sum(
            df, "k", "v", total_col="tot", num_partitions=n
        ).collect()
        assert all(r.tot == 50 * 51 // 2 for r in rows)
        assert {r.k: r.cum for r in rows}[50] == 50 * 51 // 2


def test_prefix_sum_keeps_other_columns(spark):
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit(1).alias("v"), (F.col("id") * 2).alias("extra")
    )
    rows = partitioned_prefix_sum(df, "k", "v").collect()
    assert sorted(r.extra for r in rows) == [2 * i for i in range(10)]
    assert {r.k: r.cum for r in rows} == {i: i + 1 for i in range(10)}
