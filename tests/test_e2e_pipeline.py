"""End-to-end operational story: ingest → typed lake → upsert
correction → z-order compaction → incremental rollup → validate →
retention. One test driving every maintenance surface in sequence, the
way a production pipeline composes them."""

from __future__ import annotations

import base64
import datetime as dt
import json

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.operators.ingest import ingest_pipeline
from iotgp_func_raw_data_ingest_spark.sources.envelopes import envelopes_from_list
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    compact_lake_table,
    read_lake_table,
    read_route_meta,
    upsert_lake_table,
    write_lake_typed,
)
from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
    incremental_rollup,
    validate_lake,
)


def _envelope(rows, source="db.readings"):
    return json.dumps(
        {
            "Source": source,
            "Destination": "landing",
            "Data": base64.b64encode(json.dumps(rows).encode()).decode(),
            "MessageType": "Raw",
        }
    )


def test_full_operational_pipeline(spark, tmp_path):
    cfg = EngineConfig(output_path=str(tmp_path / "lake"), max_batch_size=100)
    lake = cfg.output_path

    # 1. ingest two batches of envelope messages into the typed lake
    batch1 = [_envelope([{"sensor": str(i), "val": i} for i in range(50)])]
    batch2 = [_envelope([{"sensor": str(i), "val": i + 100} for i in range(50, 80)])]
    for bodies in (batch1, batch2):
        routed = ingest_pipeline(envelopes_from_list(spark, bodies))
        write_lake_typed(routed, cfg)
    t = read_lake_table(spark, lake, "landing", "db", "readings")
    assert t.count() == 80

    # 2. a correction feed upserts two sensors by key
    fixes = spark.createDataFrame(
        [("0", "9999"), ("79", "8888")], ["sensor", "val"]
    )
    before, after = upsert_lake_table(
        spark, lake, "landing", "db", "readings", fixes, ["sensor"], cfg
    )
    assert (before, after) == (80, 80)
    got = {
        r["sensor"]: r["val"]
        for r in read_lake_table(spark, lake, "landing", "db", "readings").collect()
    }
    assert got["0"] == "9999" and got["79"] == "8888" and got["5"] == "5"

    # 3. compact with a z-order re-cluster on the (string) sensor key
    fb, fa = compact_lake_table(
        spark, lake, "landing", "db", "readings", cfg,
        target_records_per_file=1000, zorder_cols=["sensor"],
    )
    assert fa <= fb
    assert read_lake_table(spark, lake, "landing", "db", "readings").count() == 80

    # 4. incremental rollup of an event increment into the same lake
    events = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, h), "reading", float(h)) for h in range(10)],
        "ts timestamp, event_type string, value double",
    )
    incremental_rollup(
        spark, lake, "rollups", "db", "hourly", events,
        "ts", "day", ["event_type"], "value", cfg, batch_id=0,
    )
    roll = read_lake_table(spark, lake, "rollups", "db", "hourly")
    assert roll.count() == 1 and roll.collect()[0]["count_v"] == 10

    # 5. the health audit sees both routes as consistent
    reports = {r["route"]: r for r in validate_lake(spark, lake)}
    assert reports["landing/db/readings"]["rows_match"]
    assert not reports["landing/db/readings"]["stranded"]
    assert reports["rollups/db/hourly"]["rows_match"]
    # the sidecar survived the compaction swap and carries the batch id
    meta = read_route_meta(spark, f"{lake}/rollups/db/hourly")
    assert meta["last_rollup_batch"] == 0
