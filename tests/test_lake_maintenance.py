"""Multi-format lake I/O and small-files compaction.

Covers the round-3 sink extensions: ORC/JSON/CSV write+read parity with
the parquet path, format validation, and the compact_lake_table rewrite
(file-count reduction, row preservation, atomic swap cleanup).
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.operators.ingest import ingest_pipeline
from iotgp_func_raw_data_ingest_spark.sources.envelopes import envelopes_from_list
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    compact_lake_table,
    read_lake_table,
    write_lake_generic,
    write_lake_typed,
)
from tests.test_ingest import envelope


@pytest.mark.parametrize("fmt", ["orc", "csv"])
def test_typed_lake_roundtrip_formats(spark, tmp_path, fmt):
    bodies = [envelope([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])]
    routed = ingest_pipeline(envelopes_from_list(spark, bodies))
    cfg = EngineConfig(output_path=str(tmp_path / f"lake_{fmt}"))
    dirs = write_lake_typed(routed, cfg, fmt=fmt)
    assert len(dirs) == 1
    back = read_lake_table(spark, cfg.output_path, "landing", "db", "tbl", fmt=fmt)
    assert back.count() == 2
    assert sorted(back.columns) == ["a", "b"]
    assert sorted((r.a, r.b) for r in back.collect()) == [("1", "x"), ("2", "y")]


def test_generic_lake_json_roundtrip(spark, tmp_path):
    bodies = [envelope([{"a": 1}]), envelope([{"q": 5}], source="other.table2")]
    routed = ingest_pipeline(envelopes_from_list(spark, bodies))
    cfg = EngineConfig(output_path=str(tmp_path / "lake_json"))
    write_lake_generic(routed, cfg, fmt="json")
    back = spark.read.format("json").load(cfg.output_path)
    # partition columns survive; the row map is JSON-stringified
    assert back.count() == 2
    tables = {r.table for r in back.select("table").collect()}
    assert tables == {"tbl", "table2"}
    a_row = back.filter(F.col("table") == "tbl").select("row").collect()[0].row
    assert '"a":"1"' in a_row.replace(" ", "")


def test_bad_format_rejected(spark, tmp_path):
    bodies = [envelope([{"a": 1}])]
    routed = ingest_pipeline(envelopes_from_list(spark, bodies))
    cfg = EngineConfig(output_path=str(tmp_path / "lake_bad"))
    with pytest.raises(ValueError, match="lake format"):
        write_lake_typed(routed, cfg, fmt="avro")
    with pytest.raises(ValueError, match="lake format"):
        read_lake_table(spark, cfg.output_path, "landing", "db", "tbl", fmt="feather")


def test_compact_lake_table(spark, tmp_path):
    n = 500
    body = envelope({"i": list(range(n))})
    routed = ingest_pipeline(envelopes_from_list(spark, [body]))
    # tiny batch size → many small files, the streaming-append pathology
    cfg = EngineConfig(output_path=str(tmp_path / "lake_c"), max_batch_size=50)
    dirs = write_lake_typed(routed.repartition(1), cfg)
    assert len(dirs) == 1
    before = len(glob.glob(f"{dirs[0]}/*.parquet"))
    assert before >= 10

    fb, fa = compact_lake_table(
        spark, cfg.output_path, "landing", "db", "tbl", cfg,
        target_records_per_file=1000,
    )
    assert fb == before
    assert fa == 1
    # contents identical after the rewrite
    back = read_lake_table(spark, cfg.output_path, "landing", "db", "tbl")
    assert back.count() == n
    got = sorted(int(r.i) for r in back.collect())
    assert got == list(range(n))
    # swap is clean: no temp/old directories left behind
    leftovers = glob.glob(f"{dirs[0]}.compact-*")
    assert leftovers == []


def test_compact_recovers_stranded_old_dir(spark, tmp_path):
    """A crash between compaction's two renames leaves the data at
    <path>.compact-old and nothing at the route path; the next
    invocation must restore it before compacting (sources/lake.py
    recovery block)."""
    import os

    n = 200
    body = envelope({"i": list(range(n))})
    routed = ingest_pipeline(envelopes_from_list(spark, [body]))
    cfg = EngineConfig(output_path=str(tmp_path / "lake_r"), max_batch_size=50)
    dirs = write_lake_typed(routed.repartition(1), cfg)
    route = dirs[0]
    # simulate the crash window: route moved aside, nothing in its place
    os.rename(route, f"{route}.compact-old")
    assert not os.path.exists(route)

    fb, fa = compact_lake_table(
        spark, cfg.output_path, "landing", "db", "tbl", cfg,
        target_records_per_file=1000,
    )
    assert fa == 1
    back = read_lake_table(spark, cfg.output_path, "landing", "db", "tbl")
    assert sorted(int(r.i) for r in back.collect()) == list(range(n))
    assert glob.glob(f"{route}.compact-*") == []


def test_compact_drops_stale_leftovers(spark, tmp_path):
    """Leftover .compact-old alongside a live route path (prior swap
    completed, cleanup died) and a half-written .compact-tmp are both
    removed on the next run."""
    import os

    n = 100
    body = envelope({"i": list(range(n))})
    routed = ingest_pipeline(envelopes_from_list(spark, [body]))
    cfg = EngineConfig(output_path=str(tmp_path / "lake_s"), max_batch_size=50)
    dirs = write_lake_typed(routed.repartition(1), cfg)
    route = dirs[0]
    os.makedirs(f"{route}.compact-old")
    with open(f"{route}.compact-old/part-stale.parquet", "w") as f:
        f.write("junk")
    os.makedirs(f"{route}.compact-tmp")
    with open(f"{route}.compact-tmp/part-half.parquet", "w") as f:
        f.write("junk")

    fb, fa = compact_lake_table(
        spark, cfg.output_path, "landing", "db", "tbl", cfg,
        target_records_per_file=1000,
    )
    assert fa == 1
    back = read_lake_table(spark, cfg.output_path, "landing", "db", "tbl")
    assert sorted(int(r.i) for r in back.collect()) == list(range(n))
    assert glob.glob(f"{route}.compact-*") == []


def test_route_meta_sidecar(spark, tmp_path):
    """write_lake_typed emits a _meta.json per route (the Spark-side
    analog of the reference's parquet footer KV metadata,
    src/function_app.py:389-414), Spark readers ignore it, and
    compaction carries it across the swap with updated fields."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import read_route_meta

    n = 120
    body = envelope({"i": list(range(n))})
    routed = ingest_pipeline(envelopes_from_list(spark, [body]))
    cfg = EngineConfig(output_path=str(tmp_path / "lake_m"), max_batch_size=50)
    dirs = write_lake_typed(routed.repartition(1), cfg)
    meta = read_route_meta(spark, dirs[0])
    assert meta == {
        "kind": "decoded_payload",
        "row_count": n,
        "folder": "landing",
        "source_db": "db",
        "table": "tbl",
        "max_records_per_file": 50,
        "format": "parquet",
    }
    # the sidecar is invisible to the table reader
    assert read_lake_table(spark, cfg.output_path, "landing", "db", "tbl").count() == n

    compact_lake_table(
        spark, cfg.output_path, "landing", "db", "tbl", cfg,
        target_records_per_file=1000,
    )
    meta2 = read_route_meta(spark, dirs[0])
    assert meta2["row_count"] == n
    assert meta2["max_records_per_file"] == 1000
    assert meta2["kind"] == "decoded_payload"
    # missing sidecar reads as None
    assert read_route_meta(spark, str(tmp_path / "nope")) is None


def test_upsert_lake_table(spark, tmp_path):
    from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake_upsert")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "name", "v"]
    )
    # first upsert into a missing route = plain write
    before, after = upsert_lake_table(
        spark, lake, "f", "db", "t", base, ["id"], cfg
    )
    assert (before, after) == (0, 3)

    # replace id=2, add id=4
    updates = spark.createDataFrame([(2, "B", 99), (4, "d", 40)], ["id", "name", "v"])
    before, after = upsert_lake_table(
        spark, lake, "f", "db", "t", updates, ["id"], cfg
    )
    assert (before, after) == (3, 4)
    got = {
        r.id: (r.name, r.v)
        for r in read_lake_table(spark, lake, "f", "db", "t").collect()
    }
    assert got == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 4: ("d", 40)}


def test_upsert_handles_schema_drift(spark, tmp_path):
    from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake_upsert_drift")
    base = spark.createDataFrame([(1, "a")], ["id", "name"])
    upsert_lake_table(spark, lake, "f", "db", "t", base, ["id"], cfg)
    # updates carry a NEW column; carried rows get null for it
    updates = spark.createDataFrame([(2, "b", 5)], ["id", "name", "extra"])
    _, after = upsert_lake_table(spark, lake, "f", "db", "t", updates, ["id"], cfg)
    assert after == 2
    got = {r.id: r.asDict() for r in read_lake_table(spark, lake, "f", "db", "t").collect()}
    assert got[1]["extra"] is None and got[2]["extra"] == 5


def test_upsert_rejects_empty_keys(spark, tmp_path):
    from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table

    cfg = EngineConfig(max_batch_size=1000)
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError):
        upsert_lake_table(spark, str(tmp_path), "f", "db", "t", df, [], cfg)


def test_upsert_first_write_is_atomic(spark, tmp_path):
    """ADVICE r4: a crash on the FIRST write must never leave data
    visible without its meta_extra batch marker (that window let a
    replayed first rollup batch double-merge). The first write now
    stages data + sealed sidecar in .compact-tmp and lands via one
    rename — simulate the crash by checking nothing is visible at the
    route until the rename, and that a replayed marker round-trips."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        read_route_meta,
        upsert_lake_table,
    )

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake_atomic")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    upsert_lake_table(
        spark, lake, "f", "db", "t", df, ["id"], cfg,
        meta_extra={"last_rollup_batch": 7},
    )
    route = f"{lake}/f/db/t"
    # data and marker became visible together
    meta = read_route_meta(spark, route)
    assert meta["last_rollup_batch"] == 7 and meta["row_count"] == 2
    import os

    assert not os.path.exists(f"{route}.compact-tmp")  # staging cleaned up

    # crash simulation: a half-written first attempt (tmp dir, no route)
    # is discarded by recovery on the next call, which then lands clean
    lake2 = str(tmp_path / "lake_atomic2")
    route2 = f"{lake2}/f/db/t"
    df.write.parquet(f"{route2}.compact-tmp")  # crashed before rename
    upsert_lake_table(
        spark, lake2, "f", "db", "t", df, ["id"], cfg,
        meta_extra={"last_rollup_batch": 0},
    )
    assert read_route_meta(spark, route2)["last_rollup_batch"] == 0
    assert not os.path.exists(f"{route2}.compact-tmp")
    got = {r.id for r in read_lake_table(spark, lake2, "f", "db", "t").collect()}
    assert got == {1, 2}


def test_upsert_dedupes_intra_batch_keys(spark, tmp_path):
    """Last-write-wins must hold WITHIN one updates batch: duplicate keys
    collapse to a single surviving row (ADVICE r4)."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake_dupes")
    dupes = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], ["id", "v"])
    _, after = upsert_lake_table(spark, lake, "f", "db", "t", dupes, ["id"], cfg)
    assert after == 2
    rows = read_lake_table(spark, lake, "f", "db", "t").collect()
    assert sorted(r.id for r in rows) == [1, 2]
    # merging another duplicate-key batch still yields one row per key
    more = spark.createDataFrame([(2, "q"), (2, "r")], ["id", "v"])
    _, after2 = upsert_lake_table(spark, lake, "f", "db", "t", more, ["id"], cfg)
    assert after2 == 2


def test_upsert_random_batches_match_dict_model(spark, tmp_path):
    """Property: N sequential upsert batches == applying dict.update N
    times (last write wins across batches). Batches are random but
    intra-batch duplicate-free, so the surviving value is fully
    determined and comparable."""
    import random

    from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table

    rng = random.Random(429)
    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake_model")
    model: dict[int, int] = {}
    for b in range(5):
        keys = rng.sample(range(20), rng.randint(1, 8))
        batch = [(k, b * 100 + k) for k in keys]
        model.update(batch)
        df = spark.createDataFrame(batch, ["id", "v"])
        before, after = upsert_lake_table(
            spark, lake, "f", "db", "t", df, ["id"], cfg
        )
        assert after == len(model)
    got = {
        r.id: r.v for r in read_lake_table(spark, lake, "f", "db", "t").collect()
    }
    assert got == model
