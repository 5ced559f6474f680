"""Streaming surface tests: file-source ingest stream → lake, and
event-time windowed aggregations (including late-data watermark drop)."""

from __future__ import annotations

import json

import pytest

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources.envelopes import (
    envelopes_stream_from_text,
)
from iotgp_func_raw_data_ingest_spark.sources.lake import read_lake_table
from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
    session_windows,
    start_ingest_stream,
    windowed_event_counts,
)
from tests.test_ingest import envelope


def test_streaming_ingest_to_lake(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "batch1.txt").write_text(
        envelope([{"a": 1}, {"a": 2}]) + "\n" + envelope({"b": ["x"]}, source="s2.t2") + "\n"
    )
    cfg = EngineConfig(output_path=str(tmp_path / "lake"))
    stream = envelopes_stream_from_text(spark, str(src))
    q = start_ingest_stream(stream, cfg, str(tmp_path / "ckpt"))
    q.awaitTermination(120)  # availableNow → terminates when drained

    t1 = read_lake_table(spark, cfg.output_path, "landing", "db", "tbl")
    assert sorted(r.a for r in t1.collect()) == ["1", "2"]
    t2 = read_lake_table(spark, cfg.output_path, "landing", "s2", "t2")
    assert [r.b for r in t2.collect()] == ["x"]


def test_streaming_windowed_counts_with_watermark(spark, tmp_path):
    """Rows later than watermark behind the max event time are dropped from
    the streaming result; on-time rows aggregate into tumbling windows."""
    src = tmp_path / "ev"
    src.mkdir()
    rows = [
        {"ts": "2024-01-01 10:05:00", "event_type": "click", "value": 1.0},
        {"ts": "2024-01-01 10:45:00", "event_type": "click", "value": 2.0},
        {"ts": "2024-01-01 13:00:00", "event_type": "view", "value": 5.0},  # advances watermark to 11:00
        {"ts": "2024-01-01 08:00:00", "event_type": "late", "value": 9.0},  # < watermark → dropped
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .json(str(src))
    )
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        (str(r.window_start), r.event_type): r.n
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    # Append mode emits only windows closed by the final watermark
    # (13:00 − 2h = 11:00): the 10:00 click window (n=2, both clicks in
    # one tumbling window) and the 08:00 window. The 13:00 view window is
    # still open → correctly NOT emitted.
    assert out.get(("2024-01-01 10:00:00", "click")) == 2
    assert ("2024-01-01 13:00:00", "view") not in out


def test_session_windows_batch(spark):
    """session_window over a static frame: bursts separated by > gap split."""
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (1, "2024-01-01 10:10:00", 1.0),
            (1, "2024-01-01 12:00:00", 1.0),
            (2, "2024-01-01 10:00:00", 1.0),
        ],
        "user_id long, ts string, value double",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    out = session_windows(df, gap="30 minutes").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(by_user[1]) == [1, 2]  # two sessions: (10:00,10:10) and (12:00)
    assert by_user[2] == [1]


def test_stream_stream_conversion_join(spark, tmp_path):
    """Purchases join to prior clicks by the same user within 1h; a
    purchase 2h after the click does NOT attribute."""
    import json as _json

    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        stream_stream_conversion_join,
    )

    cdir, pdir = tmp_path / "clicks", tmp_path / "purch"
    cdir.mkdir(), pdir.mkdir()
    (cdir / "c.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"event_id": 1, "user_id": 10, "ts": "2024-01-01 10:00:00", "value": 0.0},
                {"event_id": 2, "user_id": 20, "ts": "2024-01-01 10:00:00", "value": 0.0},
            ]
        )
    )
    (pdir / "p.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"event_id": 100, "user_id": 10, "ts": "2024-01-01 10:30:00", "value": 9.99},
                {"event_id": 200, "user_id": 20, "ts": "2024-01-01 12:30:00", "value": 5.0},
            ]
        )
    )
    schema = "event_id long, user_id long, ts timestamp, value double"
    clicks = spark.readStream.schema(schema).json(str(cdir))
    purchases = spark.readStream.schema(schema).json(str(pdir))
    out = stream_stream_conversion_join(clicks, purchases)
    q = (
        out.writeStream.format("memory")
        .queryName("conv_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM conv_out").collect()
    assert [(r.user_id, r.click_id, r.purchase_id) for r in rows] == [(10, 1, 100)]


def test_committed_batch_ledger_skips_replay(spark, tmp_path):
    """foreachBatch is at-least-once; the sink's committed-batch ledger
    makes replays idempotent. Pre-marking batch 0 as committed must make
    the stream skip it entirely (the replay path)."""
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        batch_committed,
        mark_batch_committed,
    )

    ckpt = str(tmp_path / "ckpt")
    assert not batch_committed(spark, ckpt, 0)
    mark_batch_committed(spark, ckpt, 0)
    assert batch_committed(spark, ckpt, 0)

    src = tmp_path / "in"
    src.mkdir()
    (src / "b.txt").write_text(envelope([{"a": 1}]) + "\n")
    cfg = EngineConfig(output_path=str(tmp_path / "lake"))
    stream = envelopes_stream_from_text(spark, str(src))
    q = start_ingest_stream(stream, cfg, ckpt)
    q.awaitTermination(120)
    import glob as _glob

    assert _glob.glob(f"{cfg.output_path}/**/*.parquet", recursive=True) == []


def test_streaming_upsert_merges_by_key(spark, tmp_path):
    from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_upsert_stream,
    )

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], ["id", "name", "v"]
    )
    upsert_lake_table(spark, lake, "f", "db", "t", base, ["id"], cfg)

    src = tmp_path / "updates"
    src.mkdir()
    (src / "u1.json").write_text(
        '{"id": 2, "name": "B", "v": 99}\n{"id": 3, "name": "c", "v": 30}\n'
    )
    updates = spark.readStream.schema("id long, name string, v long").json(str(src))
    q = start_upsert_stream(
        updates, lake, "f", "db", "t", ["id"], cfg, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)  # availableNow → terminates when drained

    from iotgp_func_raw_data_ingest_spark.sources.lake import read_lake_table

    got = {
        r.id: (r.name, r.v)
        for r in read_lake_table(spark, lake, "f", "db", "t").collect()
    }
    assert got == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30)}


def test_write_ordered_tranches_pins_arrival_order(spark, tmp_path):
    """The streaming gate queries (q181/q182) depend on micro-batch
    ORDER: _write_ordered_tranches must produce one file per tranche
    with strictly increasing pinned mtimes and index-ordered names, so
    FileStreamSource's (mtime, path) ordering replays them
    deterministically. An empty tranche writes a 0-row file (an empty
    micro-batch), keeping batch ids aligned with tranche indexes."""
    import os

    from iotgp_func_raw_data_ingest_spark.plans.streaming_queries2 import (
        _write_ordered_tranches,
    )

    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    _write_ordered_tranches(
        [
            df.filter("id < 4"),
            df.filter("id >= 4"),
            df.filter("id > 100"),  # empty — still one (0-row) file
        ],
        str(tmp_path / "in"),
    )
    files = sorted(os.listdir(tmp_path / "in"))
    assert files == ["tranche-0.parquet", "tranche-1.parquet", "tranche-2.parquet"]
    mtimes = [os.stat(tmp_path / "in" / f).st_mtime for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3  # pinned
    back = spark.read.parquet(str(tmp_path / "in" / "tranche-0.parquet"))
    assert back.count() == 4
    empty = spark.read.parquet(str(tmp_path / "in" / "tranche-2.parquet"))
    assert empty.count() == 0


def test_stream_static_enrich_joins_each_batch(spark, tmp_path):
    from iotgp_func_raw_data_ingest_spark.plans.streaming_queries2 import (
        _write_ordered_tranches,
    )
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        stream_static_enrich,
    )

    rows = spark.createDataFrame(
        [(1, 10, 5.0), (2, 11, 6.0), (3, 99, 7.0), (4, 10, 8.0)],
        "event_id long, user_id long, value double",
    )
    dim = spark.createDataFrame(
        [(10, "gold"), (11, "silver")], "user_id long, tier string"
    )
    _write_ordered_tranches(
        [rows.filter("event_id <= 2"), rows.filter("event_id > 2")],
        str(tmp_path / "in"),
    )
    stream = (
        spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    q = (
        stream_static_enrich(stream, dim, "user_id")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_id"], r["tier"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # user 99 has no dim row -> inner join drops event 3
    assert got == {(1, "gold"), (2, "silver"), (4, "gold")}


def test_stream_dedup_within_watermark_drops_redelivery(spark, tmp_path):
    from datetime import datetime

    from iotgp_func_raw_data_ingest_spark.plans.streaming_queries2 import (
        _write_ordered_tranches,
    )
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        stream_dedup_within_watermark,
    )

    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = spark.createDataFrame(
        [(1, ts(0), "a"), (2, ts(1), "b"), (3, ts(2), "c")],
        "k long, ts timestamp, payload string",
    )
    _write_ordered_tranches(
        [rows, rows.filter("k != 2")],  # re-deliver keys 1 and 3 verbatim
        str(tmp_path / "in"),
    )
    stream = (
        spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    q = (
        stream_dedup_within_watermark(stream, ["k"], "ts", "1 hour")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out")).collect()
    assert sorted((r["k"], r["payload"]) for r in out) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]


def test_streaming_cdc_merge_applies_tombstones(spark, tmp_path):
    """start_cdc_merge_stream: tombstone-aware CDC apply through the
    file-pruned merge — latest-per-key-by-seq within a batch, matched
    deletes, upserts for any non-delete op, and a tombstone for an
    ABSENT key no-ops instead of inserting the tombstone row. Two
    micro-batches (maxFilesPerTrigger=1, pinned order) pin the
    cross-batch sequencing; op/seq columns never land in the target."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        read_lake_table,
        upsert_lake_table,
    )
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_cdc_merge_stream,
    )

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "name", "v"]
    )
    upsert_lake_table(spark, lake, "f", "db", "t", base, ["id"], cfg)

    src = tmp_path / "changes"
    src.mkdir()
    import json as _json
    import os as _os

    # batch 0: update 1 twice (seq 5 wins), delete 2, tombstone for
    # absent 9 (must no-op), insert 4
    b0 = [
        {"id": 1, "name": "A0", "v": 11, "op": "u", "seq": 4},
        {"id": 1, "name": "A1", "v": 12, "op": "u", "seq": 5},
        {"id": 2, "name": None, "v": None, "op": "d", "seq": 6},
        {"id": 9, "name": None, "v": None, "op": "d", "seq": 7},
        {"id": 4, "name": "dd", "v": 40, "op": "c", "seq": 8},
    ]
    # batch 1 (applied after): re-update 1, insert-then-delete 5
    b1 = [
        {"id": 1, "name": "A2", "v": 13, "op": "u", "seq": 9},
        {"id": 5, "name": "e", "v": 50, "op": "c", "seq": 10},
        {"id": 5, "name": None, "v": None, "op": "d", "seq": 11},
    ]
    for i, batch in enumerate((b0, b1)):
        p = src / f"b{i}.json"
        p.write_text("\n".join(_json.dumps(r) for r in batch) + "\n")
        _os.utime(p, (1_700_000_000 + i * 10,) * 2)

    changes = (
        spark.readStream.schema("id long, name string, v long, op string, seq long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_cdc_merge_stream(
        changes, lake, "f", "db", "t", ["id"], "seq", cfg, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    out = read_lake_table(spark, lake, "f", "db", "t")
    assert set(out.columns) == {"id", "name", "v"}  # op/seq never land
    got = {r.id: (r.name, r.v) for r in out.collect()}
    assert got == {
        1: ("A2", 13),  # batch-0 collapse (A1 over A0), then batch-1 re-update
        3: ("c", 30),   # untouched
        4: ("dd", 40),  # inserted
        # 2 deleted; 9 tombstone no-op; 5 insert-then-delete collapses away
    }


def test_streaming_cdc_merge_rejects_bad_ops(spark, tmp_path):
    """op_col/delete_op are spliced into clause expressions — constructor
    rejects injection-shaped values before any batch runs."""
    import pytest

    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_cdc_merge_stream,
    )

    cfg = EngineConfig(max_batch_size=1000)
    (tmp_path / "never-read").mkdir()
    changes = spark.readStream.schema("id long, op string, seq long").json(
        str(tmp_path / "never-read")
    )
    with pytest.raises(ValueError, match="single quote"):
        start_cdc_merge_stream(
            changes, str(tmp_path / "lake"), "f", "db", "t", ["id"], "seq",
            cfg, str(tmp_path / "ckpt"), delete_op="d' OR '1'='1",
        )
    with pytest.raises(ValueError, match="identifier"):
        start_cdc_merge_stream(
            changes, str(tmp_path / "lake"), "f", "db", "t", ["id"], "seq",
            cfg, str(tmp_path / "ckpt"), op_col="op; drop",
        )


def test_streaming_cdc_merge_nonidentifier_columns(spark, tmp_path):
    """Feed schemas carry legal-but-non-identifier column names
    ('bal-ance'): the SET map must backtick-quote them — unquoted,
    s.bal-ance parses as a subtraction and the batch dies (or silently
    computes garbage). Backticked names themselves are rejected."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        read_lake_table,
        upsert_lake_table,
    )
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_cdc_merge_stream,
    )

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake")
    base = spark.createDataFrame([(1, 10), (2, 20)], ["id", "bal-ance"])
    upsert_lake_table(spark, lake, "f", "db", "t", base, ["id"], cfg)

    src = tmp_path / "changes"
    src.mkdir()
    (src / "b0.json").write_text(
        '{"id": 1, "bal-ance": 99, "op": "u", "seq": 1}\n'
    )
    changes = spark.readStream.schema(
        "id long, `bal-ance` long, op string, seq long"
    ).json(str(src))
    q = start_cdc_merge_stream(
        changes, lake, "f", "db", "t", ["id"], "seq", cfg, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {
        r["id"]: r["bal-ance"]
        for r in read_lake_table(spark, lake, "f", "db", "t").collect()
    }
    assert got == {1: 99, 2: 20}


def test_streaming_cdc_merge_rejects_backslash_and_empty_set_cols(spark, tmp_path):
    """delete_op is spliced into a SQL string literal: a backslash
    (Spark's string-escape char) would corrupt the clause and fail only
    at batch time — reject at construction, like the single quote. An
    explicit set_cols=[] (update NOTHING on match) is almost surely a
    bug (matched non-delete changes would silently carry stale values)
    — rejected with guidance; None still derives the map."""
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_cdc_merge_stream,
    )

    cfg = EngineConfig(max_batch_size=1000)
    (tmp_path / "never-read").mkdir()
    changes = spark.readStream.schema("id long, op string, seq long").json(
        str(tmp_path / "never-read")
    )
    with pytest.raises(ValueError, match="backslash"):
        start_cdc_merge_stream(
            changes, str(tmp_path / "lake"), "f", "db", "t", ["id"], "seq",
            cfg, str(tmp_path / "ckpt"), delete_op="d\\",
        )
    with pytest.raises(ValueError, match="set_cols"):
        start_cdc_merge_stream(
            changes, str(tmp_path / "lake"), "f", "db", "t", ["id"], "seq",
            cfg, str(tmp_path / "ckpt"), set_cols=[],
        )


def test_streaming_cdc_merge_duplicate_seq_deterministic(spark, tmp_path):
    """Duplicate seq values for one key within a batch: the collapse
    breaks the tie on a full-row content hash (xxhash64 over the feed
    columns, descending), so the winner is a pure function of the DATA
    — not of partition layout. The test computes the expected winner
    with the same expression and pins exact equality."""
    from pyspark.sql import functions as F

    from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_cdc_merge_stream,
    )

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake")
    base = spark.createDataFrame([(1, "a", 10)], ["id", "name", "v"])
    upsert_lake_table(spark, lake, "f", "db", "t", base, ["id"], cfg)

    dup = [
        {"id": 1, "name": "x", "v": 11, "op": "u", "seq": 5},
        {"id": 1, "name": "y", "v": 12, "op": "u", "seq": 5},
    ]
    src = tmp_path / "changes"
    src.mkdir()
    (src / "b0.json").write_text("\n".join(json.dumps(r) for r in dup) + "\n")
    schema = "id long, name string, v long, op string, seq long"
    changes = spark.readStream.schema(schema).json(str(src))
    q = start_cdc_merge_stream(
        changes, lake, "f", "db", "t", ["id"], "seq", cfg, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    expected = (
        spark.createDataFrame([tuple(r.values()) for r in dup], schema)
        .withColumn("_h", F.xxhash64("id", "name", "v", "op", "seq"))
        .orderBy(F.col("_h").desc())
        .first()
    )
    got = {
        r.id: (r.name, r.v)
        for r in read_lake_table(spark, lake, "f", "db", "t").collect()
    }
    assert got == {1: (expected["name"], expected["v"])}


def test_streaming_cdc_merge_persist_seq_rejects_stale(spark, tmp_path):
    """persist_seq=True: the route keeps an engine-managed _seq column
    and the matched clauses are guarded with s._seq > t._seq — a later
    BATCH carrying an earlier CHANGE (re-partitioned / replayed CDC
    feed) must not clobber the newer row. Batch 0 carries the NEWER
    changes, batch 1 the stale ones:

    - stale update for a key updated at a higher seq  → carried
    - stale tombstone for a key updated at a higher seq → carried
    - stale update for a key INSERTED at a higher seq  → carried
    - a NEWER update arriving late (id=3)              → applied
    """
    from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_cdc_merge_stream,
    )

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "name", "v"]
    )
    upsert_lake_table(spark, lake, "f", "db", "t", base, ["id"], cfg)

    import os as _os

    b0 = [  # the NEWER changes arrive first
        {"id": 1, "name": "NEW", "v": 11, "op": "u", "seq": 20},
        {"id": 4, "name": "INS", "v": 40, "op": "c", "seq": 40},
    ]
    b1 = [  # then the stale ones — every one must be rejected…
        {"id": 1, "name": "OLD", "v": 99, "op": "u", "seq": 10},
        {"id": 1, "name": None, "v": None, "op": "d", "seq": 15},
        {"id": 4, "name": "OLDINS", "v": 98, "op": "u", "seq": 35},
        # …except a genuinely newer change riding the same late batch
        {"id": 3, "name": "LATE", "v": 33, "op": "u", "seq": 50},
    ]
    src = tmp_path / "changes"
    src.mkdir()
    for i, batch in enumerate((b0, b1)):
        p = src / f"b{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in batch) + "\n")
        _os.utime(p, (1_700_000_000 + i * 10,) * 2)

    changes = (
        spark.readStream.schema("id long, name string, v long, op string, seq long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_cdc_merge_stream(
        changes, lake, "f", "db", "t", ["id"], "seq", cfg,
        str(tmp_path / "ckpt"), persist_seq=True,
    )
    q.awaitTermination(180)

    out = read_lake_table(spark, lake, "f", "db", "t")
    # op/seq never land; the persisted _seq column does
    assert set(out.columns) == {"id", "name", "v", "_seq"}
    got = {r.id: (r.name, r.v, r["_seq"]) for r in out.collect()}
    assert got == {
        1: ("NEW", 11, 20),   # stale update AND stale tombstone rejected
        2: ("b", 20, None),   # untouched pre-persist_seq row: _seq NULL
        3: ("LATE", 33, 50),  # newer change in the late batch applied
        4: ("INS", 40, 40),   # insert records its seq; stale upd rejected
    }


def test_streaming_cdc_merge_persist_seq_documented_resurrection(spark, tmp_path):
    """The DOCUMENTED limitation of physical deletes: once a key's row
    (and its _seq) is gone, a stale non-delete change in a later batch
    is indistinguishable from a first insert and resurrects the row.
    Pinned so the behavior is explicit, not accidental — closing it
    needs tombstone retention (docstring)."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_cdc_merge_stream,
    )

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake")
    base = spark.createDataFrame([(2, "b", 20)], ["id", "name", "v"])
    upsert_lake_table(spark, lake, "f", "db", "t", base, ["id"], cfg)

    import os as _os

    b0 = [{"id": 2, "name": None, "v": None, "op": "d", "seq": 30}]
    b1 = [{"id": 2, "name": "GHOST", "v": 66, "op": "u", "seq": 10}]
    src = tmp_path / "changes"
    src.mkdir()
    for i, batch in enumerate((b0, b1)):
        p = src / f"b{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in batch) + "\n")
        _os.utime(p, (1_700_000_000 + i * 10,) * 2)

    changes = (
        spark.readStream.schema("id long, name string, v long, op string, seq long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_cdc_merge_stream(
        changes, lake, "f", "db", "t", ["id"], "seq", cfg,
        str(tmp_path / "ckpt"), persist_seq=True,
    )
    q.awaitTermination(180)

    got = {
        r.id: (r.name, r.v)
        for r in read_lake_table(spark, lake, "f", "db", "t").collect()
    }
    assert got == {2: ("GHOST", 66)}  # the documented resurrection


def test_streaming_cdc_merge_persist_seq_reserves_seq_column(spark, tmp_path):
    """A feed carrying its own _seq column under persist_seq is
    rejected (the column is engine-managed)."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_cdc_merge_stream,
    )

    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake")
    upsert_lake_table(
        spark, lake, "f", "db", "t",
        spark.createDataFrame([(1, 10)], ["id", "v"]), ["id"], cfg,
    )
    src = tmp_path / "changes"
    src.mkdir()
    (src / "b0.json").write_text(
        '{"id": 1, "v": 11, "op": "u", "seq": 1, "_seq": 7}\n'
    )
    changes = spark.readStream.schema(
        "id long, v long, op string, seq long, _seq long"
    ).json(str(src))
    q = start_cdc_merge_stream(
        changes, lake, "f", "db", "t", ["id"], "seq", cfg,
        str(tmp_path / "ckpt"), persist_seq=True,
    )
    with pytest.raises(Exception, match="_seq"):
        q.awaitTermination(120)
