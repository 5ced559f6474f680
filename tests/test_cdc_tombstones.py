"""Soft-delete tombstone retention for the CDC apply stream
(``streaming.pipeline.start_cdc_merge_stream(retain_tombstones=True)``
+ ``sources.lake.read_cdc_table`` + ``sources.maintenance.
expire_tombstones``): the resurrection window physical deletes leave
open is CLOSED — a winning delete survives as a tombstone row carrying
its ``_seq``, so a stale change arriving after it (across any batch
split) is carried instead of resurrecting the key, and a tombstone
arriving before its key's insert keeps the insert out. Retention
hard-deletes tombstones at/below a seq horizon via the file-pruned
staged replace."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    read_cdc_table,
    read_lake_table,
    upsert_lake_table,
)
from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
    expire_tombstones,
)
from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
    start_cdc_merge_stream,
)

SCHEMA = "id long, name string, v long, op string, seq long"


def _seed(spark, tmp_path, rows=((1, "a", 10), (2, "b", 20), (3, "c", 30))):
    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake")
    base = spark.createDataFrame(list(rows), ["id", "name", "v"])
    upsert_lake_table(spark, lake, "f", "db", "t", base, ["id"], cfg)
    return cfg, lake


def _apply(spark, tmp_path, cfg, lake, batches, tag="run0"):
    """Replay ``batches`` (lists of dict change rows) as pinned-order
    micro-batches through the tombstone-retaining CDC apply."""
    src = tmp_path / f"changes-{tag}"
    src.mkdir()
    for i, batch in enumerate(batches):
        p = src / f"b{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in batch) + "\n")
        os.utime(p, (1_700_000_000 + i * 10,) * 2)
    changes = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_cdc_merge_stream(
        changes, lake, "f", "db", "t", ["id"], "seq", cfg,
        str(tmp_path / f"ckpt-{tag}"),
        persist_seq=True, retain_tombstones=True,
    )
    q.awaitTermination(300)


def _route_rows(spark, lake):
    return {
        r["id"]: (r["name"], r["v"], r["_seq"], r["_deleted"])
        for r in read_lake_table(spark, lake, "f", "db", "t").collect()
    }


def test_delete_then_stale_update_cannot_resurrect(spark, tmp_path):
    """The exact case the physical-delete mode documents as its open
    window: the WINNING delete arrives in an EARLY batch, a STALE
    update for the same key in a LATER batch. The tombstone's retained
    _seq must reject it."""
    cfg, lake = _seed(spark, tmp_path)
    _apply(spark, tmp_path, cfg, lake, [
        [{"id": 2, "name": None, "v": None, "op": "d", "seq": 9}],
        [{"id": 2, "name": "ZOMBIE", "v": 99, "op": "u", "seq": 3}],
    ])
    live = {
        r["id"]: (r["name"], r["v"])
        for r in read_cdc_table(spark, lake, "f", "db", "t").collect()
    }
    assert live == {1: ("a", 10), 3: ("c", 30)}
    # the tombstone row itself: key + markers, data columns nulled
    raw = _route_rows(spark, lake)
    assert raw[2] == (None, None, 9, True)


def test_tombstone_before_insert_and_true_resurrection(spark, tmp_path):
    """A tombstone arriving BEFORE its key's (stale) insert keeps the
    insert out; a genuinely NEWER change after a delete resurrects the
    row legitimately (_deleted flips back)."""
    cfg, lake = _seed(spark, tmp_path)
    _apply(spark, tmp_path, cfg, lake, [
        [
            # absent key 7: delete first (seq 9) ...
            {"id": 7, "name": None, "v": None, "op": "d", "seq": 9},
            # existing key 1: delete at seq 2 ...
            {"id": 1, "name": None, "v": None, "op": "d", "seq": 2},
        ],
        [
            # ... then 7's STALE insert (seq 2 < 9): must stay dead
            {"id": 7, "name": "late", "v": 70, "op": "c", "seq": 2},
            # ... then 1's NEWER update (seq 5 > 2): must resurrect
            {"id": 1, "name": "back", "v": 11, "op": "u", "seq": 5},
        ],
    ])
    live = {
        r["id"]: (r["name"], r["v"])
        for r in read_cdc_table(spark, lake, "f", "db", "t").collect()
    }
    assert live == {1: ("back", 11), 2: ("b", 20), 3: ("c", 30)}
    raw = _route_rows(spark, lake)
    assert raw[7] == (None, None, 9, True)   # tombstone retained
    assert raw[1] == ("back", 11, 5, False)  # resurrected, marker false


def test_redelete_advances_tombstone_seq(spark, tmp_path):
    """A newer delete for an already-tombstoned key advances the
    tombstone's _seq (it is just another guarded update), so ever-later
    stale changes keep losing."""
    cfg, lake = _seed(spark, tmp_path)
    _apply(spark, tmp_path, cfg, lake, [
        [{"id": 3, "name": None, "v": None, "op": "d", "seq": 4}],
        [{"id": 3, "name": None, "v": None, "op": "d", "seq": 8}],
        [{"id": 3, "name": "stale", "v": 1, "op": "u", "seq": 6}],
    ])
    raw = _route_rows(spark, lake)
    assert raw[3] == (None, None, 8, True)


def test_expire_tombstones_horizon(spark, tmp_path):
    """Retention: tombstones at/below the seq horizon are physically
    removed (their files rewritten via the staged replace), tombstones
    above it and live rows — whatever their _seq — are kept verbatim."""
    cfg, lake = _seed(spark, tmp_path)
    _apply(spark, tmp_path, cfg, lake, [
        [
            {"id": 1, "name": None, "v": None, "op": "d", "seq": 3},
            {"id": 2, "name": None, "v": None, "op": "d", "seq": 8},
            {"id": 3, "name": "upd", "v": 31, "op": "u", "seq": 2},
            {"id": 4, "name": "new", "v": 40, "op": "c", "seq": 1},
        ],
    ])
    route = f"{lake}/f/db/t"
    rep = expire_tombstones(spark, route, horizon_seq=5)
    assert rep["tombstones_removed"] == 1  # id 1 (seq 3 <= 5)
    assert rep["files_rewritten"] >= 1
    raw = _route_rows(spark, lake)
    assert 1 not in raw                      # hard-deleted
    assert raw[2] == (None, None, 8, True)   # above horizon: kept
    assert raw[3] == ("upd", 31, 2, False)   # live, low seq: untouched
    assert raw[4] == ("new", 40, 1, False)
    # idempotent / nothing left at the horizon
    rep2 = expire_tombstones(spark, route, horizon_seq=5)
    assert rep2["tombstones_removed"] == 0 and rep2["files_rewritten"] == 0
    # reads through the CDC reader are unchanged by the expiry
    live = {
        r["id"] for r in read_cdc_table(spark, lake, "f", "db", "t").collect()
    }
    assert live == {3, 4}


def test_expire_keeps_null_seq_tombstone(spark, tmp_path):
    """An externally written tombstone with NULL _seq has no horizon to
    compare against — it must be treated as above-horizon (kept
    verbatim), even when its FILE is rewritten for another doomed row.
    (The bare three-valued ``_seq <= horizon`` would evaluate NULL and
    silently hard-delete it in the survivors filter.)"""
    from pyspark.sql.types import (
        BooleanType, LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("_seq", LongType()),
        StructField("_deleted", BooleanType()),
    ])
    route = str(tmp_path / "route")
    # ONE file holding a live row, a doomed tombstone (seq 3 <= 5), and
    # an external NULL-seq tombstone — the rewrite must carry the latter
    spark.createDataFrame(
        [(1, "live", 7, False), (2, None, 3, True), (9, None, None, True)],
        schema,
    ).coalesce(1).write.parquet(route)
    rep = expire_tombstones(spark, route, horizon_seq=5)
    assert rep["tombstones_removed"] == 1
    rows = {
        r["id"]: (r["name"], r["_seq"], r["_deleted"])
        for r in spark.read.parquet(route).collect()
    }
    assert 2 not in rows                       # doomed: removed
    assert rows[1] == ("live", 7, False)       # live: carried
    assert rows[9] == (None, None, True)       # NULL seq: never doomed


def test_expire_tombstones_never_ran_tombstone_mode(spark, tmp_path):
    """A route with no _deleted/_seq columns is a clean no-op — not an
    error (retention jobs sweep many routes indiscriminately)."""
    cfg, lake = _seed(spark, tmp_path)
    rep = expire_tombstones(spark, f"{lake}/f/db/t", horizon_seq=10**9)
    assert rep == {
        "files_total": rep["files_total"], "files_rewritten": 0,
        "tombstones_removed": 0, "rows_kept": 0,
    }
    assert rep["files_total"] >= 1


def test_read_cdc_table_without_marker_matches_plain_read(spark, tmp_path):
    """On a route that never ran tombstone mode, read_cdc_table is
    byte-identical to read_lake_table (include_deleted too)."""
    cfg, lake = _seed(spark, tmp_path)
    a = read_lake_table(spark, lake, "f", "db", "t")
    b = read_cdc_table(spark, lake, "f", "db", "t")
    c = read_cdc_table(spark, lake, "f", "db", "t", include_deleted=True)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    assert a.exceptAll(c).isEmpty() and c.exceptAll(a).isEmpty()


def test_guardrails(spark, tmp_path):
    """retain_tombstones without persist_seq is rejected at construction
    (the tombstone exists to feed the _seq guard); a feed carrying the
    reserved _deleted column is rejected at batch time."""
    cfg = EngineConfig(max_batch_size=1000)
    (tmp_path / "never-read").mkdir()
    changes = spark.readStream.schema(SCHEMA).json(
        str(tmp_path / "never-read")
    )
    with pytest.raises(ValueError, match="persist_seq"):
        start_cdc_merge_stream(
            changes, str(tmp_path / "lake"), "f", "db", "t", ["id"], "seq",
            cfg, str(tmp_path / "ckpt"), retain_tombstones=True,
        )

    cfg2, lake = _seed(spark, tmp_path)
    src = tmp_path / "bad-feed"
    src.mkdir()
    (src / "b0.json").write_text(
        '{"id": 1, "name": "x", "v": 1, "op": "u", "seq": 1, '
        '"_deleted": false}\n'
    )
    bad = spark.readStream.schema(SCHEMA + ", _deleted boolean").json(str(src))
    q = start_cdc_merge_stream(
        bad, lake, "f", "db", "t", ["id"], "seq", cfg2,
        str(tmp_path / "ckpt-bad"),
        persist_seq=True, retain_tombstones=True,
    )
    with pytest.raises(Exception, match="_deleted"):
        q.awaitTermination(300)


def test_expire_crash_after_seal_heals_exactly_once(spark, tmp_path, monkeypatch):
    """expire_tombstones dying between its _ready seal and the commit
    leaves a READY .delete-stage- the next maintenance pass completes
    (cross-kind heal_staged_replaces) — the expiry lands exactly once,
    never twice, never half."""
    from iotgp_func_raw_data_ingest_spark.sources import maintenance as mnt
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        heal_staged_replaces,
    )

    cfg, lake = _seed(spark, tmp_path)
    _apply(spark, tmp_path, cfg, lake, [
        [
            {"id": 1, "name": None, "v": None, "op": "d", "seq": 3},
            {"id": 2, "name": None, "v": None, "op": "d", "seq": 8},
        ],
    ])
    route = f"{lake}/f/db/t"

    real_finish = mnt._finish_keyed_delete

    def crash_on_commit(spark_, table_path, stage_name, manifest=None):
        raise RuntimeError("injected crash before the staged commit")

    monkeypatch.setattr(mnt, "_finish_keyed_delete", crash_on_commit)
    with pytest.raises(RuntimeError, match="injected crash"):
        expire_tombstones(spark, route, horizon_seq=5)
    monkeypatch.setattr(mnt, "_finish_keyed_delete", real_finish)

    # the doomed tombstone (id 1) is still visible — nothing committed
    raw = _route_rows(spark, lake)
    assert raw[1] == (None, None, 3, True)

    # any maintenance writer's preamble completes the READY stage
    assert heal_staged_replaces(spark, route) == 1
    raw = _route_rows(spark, lake)
    assert 1 not in raw                      # expiry landed
    assert raw[2] == (None, None, 8, True)   # above horizon kept
    # untouched rows carried once (NULL markers: their file was never
    # rewritten, so the evolved columns read as NULL = live)
    assert raw[3] == ("c", 30, None, None)

    # and a healed stage is gone — a second heal finds nothing
    assert heal_staged_replaces(spark, route) == 0
