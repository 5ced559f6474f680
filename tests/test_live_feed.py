"""Live-table change feed / IVM over tombstone-retaining CDC routes
(``snapshots.read_changes_between(live_only=True)`` +
``ivm.refresh_view_from_changes(live_only=True)``): the default feed is
PHYSICAL (a soft delete is an update to a nulled-data tombstone row; an
expiry emits deletes for long-dead keys), which piles tombstones into a
NULL group of any aggregate view. ``live_only`` filters
``coalesce(_deleted, false)`` rows SYMMETRICALLY from both diff sides,
so marker flips classify as logical insert/delete and an expiry span
nets to zero — the ``lake.read_cdc_table`` view of the route, still
exact."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources import ivm
from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    read_cdc_table,
    upsert_lake_table,
)
from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
    expire_tombstones,
)
from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
    start_cdc_merge_stream,
)

SCHEMA = "id long, name string, v long, op string, seq long"


def _seed(spark, tmp_path):
    cfg = EngineConfig(max_batch_size=1000)
    lake = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "name", "v"]
    )
    upsert_lake_table(spark, lake, "f", "db", "t", base, ["id"], cfg)
    route = f"{lake}/f/db/t"
    assert snap.enable_snapshots(spark, route) == 1  # gen 1
    return cfg, lake, route


def _apply(spark, tmp_path, cfg, lake, batches, tag="run0"):
    """Each batch commits ONE generation (the pruned merge publishes a
    delta on the snapshot-enabled route)."""
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


def _feed(spark, route, frm, to, **kw):
    return {
        (r["id"], r["name"], r["v"], r["_change_type"])
        for r in snap.read_changes_between(
            spark, route, frm, to, key_cols=["id"], **kw
        ).collect()
    }


def test_soft_delete_classifies_as_logical_delete(spark, tmp_path):
    """Physical feed: a soft delete is an UPDATE whose postimage is the
    nulled tombstone. Live feed: a logical DELETE of the live preimage,
    no postimage at all."""
    cfg, lake, route = _seed(spark, tmp_path)
    _apply(spark, tmp_path, cfg, lake, [
        [{"id": 2, "name": None, "v": None, "op": "d", "seq": 9}],
    ])  # gen 2
    physical = _feed(spark, route, 1, 2)
    assert (2, "b", 20, "update_preimage") in physical
    assert (2, None, None, "update_postimage") in physical

    live = _feed(spark, route, 1, 2, live_only=True)
    assert live == {(2, "b", 20, "delete")}


def test_resurrection_classifies_as_logical_insert(spark, tmp_path):
    """A genuinely newer change flipping _deleted back is an UPDATE
    physically (tombstone -> live row) but a logical INSERT in the
    live feed (the key was not live before)."""
    cfg, lake, route = _seed(spark, tmp_path)
    _apply(spark, tmp_path, cfg, lake, [
        [{"id": 2, "name": None, "v": None, "op": "d", "seq": 9}],   # gen 2
        [{"id": 2, "name": "back", "v": 22, "op": "u", "seq": 11}],  # gen 3
    ])
    physical = _feed(spark, route, 2, 3)
    assert (2, None, None, "update_preimage") in physical
    assert (2, "back", 22, "update_postimage") in physical

    live = _feed(spark, route, 2, 3, live_only=True)
    assert live == {(2, "back", 22, "insert")}

    # a stale change rejected by the tombstone's _seq is a no-op in
    # BOTH feeds (the route did not change)
    _apply(spark, tmp_path, cfg, lake, [
        [{"id": 1, "name": None, "v": None, "op": "d", "seq": 9}],     # gen 4
        [{"id": 1, "name": "zombie", "v": 1, "op": "u", "seq": 3}],    # gen 5
    ], tag="run1")
    assert _feed(spark, route, 4, 5) == set()
    assert _feed(spark, route, 4, 5, live_only=True) == set()


def test_expiry_span_nets_to_zero(spark, tmp_path):
    """expire_tombstones emits physical deletes for keys that logically
    died long ago; the live feed for that span must be EMPTY."""
    cfg, lake, route = _seed(spark, tmp_path)
    _apply(spark, tmp_path, cfg, lake, [
        [{"id": 2, "name": None, "v": None, "op": "d", "seq": 9}],
    ])  # gen 2
    rep = expire_tombstones(spark, route, horizon_seq=9)  # gen 3
    assert rep["tombstones_removed"] == 1
    assert snap.list_generations(spark, route)[-1] == 3

    physical = _feed(spark, route, 2, 3)
    assert physical == {(2, None, None, "delete")}
    assert _feed(spark, route, 2, 3, live_only=True) == set()

    # and the compressed whole-lifecycle span agrees with read_cdc_table:
    # one live delete, nothing else
    assert _feed(spark, route, 1, 3, live_only=True) == {(2, "b", 20, "delete")}


def test_route_without_marker_reads_identically(spark, tmp_path):
    """On a route that never ran tombstone mode the two settings
    coincide (no _deleted column — the filter is a no-op)."""
    cfg, lake, route = _seed(spark, tmp_path)
    src = spark.createDataFrame([(2, "B", 21)], ["id", "name", "v"])
    upsert_lake_table(spark, lake, "f", "db", "t", src, ["id"], cfg)  # gen 2
    assert _feed(spark, route, 1, 2) == _feed(
        spark, route, 1, 2, live_only=True
    )


def test_ivm_null_group_off_vs_live_match_on(spark, tmp_path):
    """Option OFF (the default physical contract): tombstones pile into
    the NULL group of a name-keyed view — exact w.r.t. the physical
    route, a foot-gun w.r.t. the live table. Option ON: the view equals
    the read_cdc_table aggregate through delete, resurrection, and
    expiry."""
    cfg, lake, route = _seed(spark, tmp_path)
    vp = str(tmp_path / "view_phys")
    vl = str(tmp_path / "view_live")

    def refresh_both():
        ivm.refresh_view_from_changes(spark, route, vp, ["name"], ["v"])
        ivm.refresh_view_from_changes(
            spark, route, vl, ["name"], ["v"], live_only=True
        )

    def rows(path):
        return {
            r["name"]: (r["n_rows"], r["sum_v"])
            for r in ivm.read_view(spark, path).collect()
        }

    def live_agg():
        return {
            r["name"]: (r["n_rows"], r["sum_v"])
            for r in read_cdc_table(spark, lake, "f", "db", "t")
            .groupBy("name")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("v").alias("sum_v"),
            )
            .collect()
        }

    refresh_both()  # initial builds at gen 1 (no tombstones yet)
    _apply(spark, tmp_path, cfg, lake, [
        [
            {"id": 2, "name": None, "v": None, "op": "d", "seq": 9},
            {"id": 5, "name": None, "v": None, "op": "d", "seq": 7},
        ],
        [{"id": 2, "name": "back", "v": 22, "op": "u", "seq": 11}],
    ])  # gens 2, 3: id 2 dies then resurrects; absent id 5 tombstones
    refresh_both()
    # physical view: the surviving id-5 tombstone is a NULL-group row
    assert rows(vp)[None] == (1, None)
    # live view: no NULL group, exactly the live-table aggregate
    assert None not in rows(vl)
    assert rows(vl) == live_agg()

    expire_tombstones(spark, route, horizon_seq=7)  # gen 4: id 5 expires
    refresh_both()
    assert None not in rows(vp)          # physical: tombstone retracted
    assert rows(vl) == live_agg()        # live: expiry was a no-op

    # the setting is part of the view's spec — flipping it is drift
    with pytest.raises(ValueError, match="live_only"):
        ivm.refresh_view_from_changes(
            spark, route, vl, ["name"], ["v"], live_only=False
        )
    with pytest.raises(ValueError, match="live_only"):
        ivm.refresh_view_from_changes(spark, route, vp, ["name"], ["v"],
                                      live_only=True)


def test_ivm_sidecar_backcompat_defaults_physical(spark, tmp_path):
    """A sidecar written before the live_only option existed (no key)
    refreshes as live_only=False — the physical contract it was built
    under — and rejects live_only=True as drift."""
    cfg, lake, route = _seed(spark, tmp_path)
    view = str(tmp_path / "view")
    ivm.refresh_view_from_changes(spark, route, view, ["name"], ["v"])
    meta_path = f"{view}/{ivm.IVM_META}"
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["live_only"] is False
    del meta["live_only"]  # simulate a pre-option sidecar
    with open(meta_path, "w") as f:
        json.dump(meta, f, sort_keys=True)
    crc = f"{view}/.{ivm.IVM_META}.crc"  # local-FS checksum sidecar
    if os.path.exists(crc):
        os.remove(crc)

    src = spark.createDataFrame([(9, "z", 90)], ["id", "name", "v"])
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        merge_lake_table_pruned,
    )

    merge_lake_table_pruned(
        spark, lake, "f", "db", "t", src, ["id"], cfg,
        matched_update={"name": "s.name", "v": "s.v"},
    )  # gen 2
    rep = ivm.refresh_view_from_changes(spark, route, view, ["name"], ["v"])
    assert rep["mode"] == "incremental"
    with pytest.raises(ValueError, match="live_only"):
        ivm.refresh_view_from_changes(
            spark, route, view, ["name"], ["v"], live_only=True
        )
