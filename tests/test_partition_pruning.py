"""The partitioned lake must prune partitions on routing-key predicates —
the property that makes per-table reads at 100 TB touch only their
folder's files."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.operators.ingest import ingest_pipeline
from iotgp_func_raw_data_ingest_spark.sources.envelopes import envelopes_from_list
from iotgp_func_raw_data_ingest_spark.sources.lake import write_lake_generic
from tests.test_ingest import envelope


def test_generic_lake_partition_pruning(spark, tmp_path):
    bodies = [
        envelope([{"a": 1}], source="db1.t1", dest="f1"),
        envelope([{"a": 2}], source="db2.t2", dest="f2"),
        envelope([{"a": 3}], source="db3.t3", dest="f3"),
    ]
    routed = ingest_pipeline(envelopes_from_list(spark, bodies))
    cfg = EngineConfig(output_path=str(tmp_path / "lake"))
    write_lake_generic(routed, cfg)

    back = spark.read.parquet(cfg.output_path)
    one = back.filter((F.col("folder") == "f2") & (F.col("table") == "t2"))
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # pruned scan reads exactly the matching partition
    assert one.count() == 1
    assert one.collect()[0].row["a"] == "2"
    # routing columns materialize as partition values on read-back
    assert set(back.select("folder").distinct().toPandas()["folder"]) == {"f1", "f2", "f3"}
