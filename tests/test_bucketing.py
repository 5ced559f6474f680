"""Bucketed tables: co-located joins without a shuffle — the layout
strategy that removes the per-query exchange for repeated big-big joins
at 100 TB (write once bucketed by the join key, join forever shuffle-free).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdb")
    for name, df, key in [("li_b", li, "l_orderkey"), ("o_b", o, "o_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS bucketdb.{name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .format("parquet")
            # external table under tmp_path: the session-local metastore
            # forgets managed tables between runs but their warehouse
            # directories persist → LOCATION_ALREADY_EXISTS on rerun
            .option("path", str(tmp_path / name))
            .saveAsTable(f"bucketdb.{name}")
        )

    a = spark.table("bucketdb.li_b")
    b = spark.table("bucketdb.o_b").hint("merge")  # avoid broadcast: prove bucketing
    joined = a.join(b, F.col("l_orderkey") == F.col("o_orderkey"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # bucketing replaced the shuffle
    assert joined.count() == li.count()  # every lineitem has its order
