"""Change data feed between generations (sources/snapshots.py:
diff_generations + read_changes_between): file-diff planning that never
opens shared files, carried-row cancellation under the pruned merge,
key-based update classification, multi-generation compression, schema
evolution alignment, reverse spans, and the error paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
from iotgp_func_raw_data_ingest_spark.sources.lake import merge_lake_table_pruned
from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
    delete_keys_from_table,
)


def _lake_route(spark, base, n=400, files=8):
    """A snapshot-enabled range-clustered route under a lake layout (so
    the maintenance ops can address it)."""
    lake = str(base / "lake")
    route = f"{lake}/curated/crm/accounts"
    df = spark.range(1, n + 1).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("int").alias("seg"),
        F.round(F.col("id") * 1.5, 2).alias("bal"),
    )
    df.repartitionByRange(files, "k").write.parquet(route)
    assert snap.enable_snapshots(spark, route) == 1
    return lake, route


def _feed(spark, route, a, b, **kw):
    return snap.read_changes_between(spark, route, a, b, **kw)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_append_only_feed(spark, tmp_path):
    lake, route = _lake_route(spark, tmp_path, n=100, files=2)
    extra = spark.range(1000, 1010).select(
        F.col("id").alias("k"),
        F.lit(9).cast("int").alias("seg"),
        F.lit(1.25).alias("bal"),
    )
    before = set(snap.read_generation(spark, route, 1)["files"])
    extra.coalesce(1).write.mode("append").parquet(route)
    import os

    added = sorted(
        f
        for f in os.listdir(route)
        if f.startswith("part-") and f not in before
    )
    snap.publish_generation(spark, route, kind="append", add=added)

    d = snap.diff_generations(spark, route, 1, 2)
    assert d["added"] == added and d["removed"] == []
    assert set(d["shared"]) == before  # untouched files never opened

    feed = _feed(spark, route, 1, 2)
    got = _rows(feed)
    assert all(r[-1] == "insert" for r in got)
    assert {r[0] for r in got} == set(range(1000, 1010))


def test_pruned_merge_feed_cancels_carried(spark, tmp_path):
    lake, route = _lake_route(spark, tmp_path, n=400, files=8)
    cfg = EngineConfig(output_path=lake)
    # updates: top slice; deletes: negative-bal trick not available →
    # use a delete condition on a key band; inserts: fresh keys
    src = (
        spark.range(380, 401)
        .select(
            F.col("id").alias("k"),
            F.lit(1).cast("int").alias("seg"),
            F.lit(0.5).alias("bal"),
            F.when(F.col("id") % 2 == 0, "u").otherwise("d").alias("op"),
        )
        .unionByName(
            spark.range(5000, 5005).select(
                F.col("id").alias("k"),
                F.lit(2).cast("int").alias("seg"),
                F.lit(3.5).alias("bal"),
                F.lit("i").alias("op"),
            )
        )
    )
    report = merge_lake_table_pruned(
        spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
        matched_update={"bal": "ROUND(t.bal + 100, 2)"},
        matched_update_condition="s.op = 'u'",
        matched_delete_condition="s.op = 'd'",
    )
    assert report["files_rewritten"] < report["files_total"]
    assert report["rows_carried"] > 0  # cancellation is actually exercised

    d = snap.diff_generations(spark, route, 1, 2)
    assert d["shared"]  # untouched files stay out of the feed reads

    feed = _feed(spark, route, 1, 2, key_cols=["k"]).select("k", "bal", "_change_type")
    got = _rows(feed)
    upd_keys = set(range(380, 401, 2))
    del_keys = set(range(381, 401, 2))
    ins_keys = set(range(5000, 5005))
    # exact multiplicity: 2 rows per update, 1 per delete/insert — any
    # carried row leaking in would inflate this
    assert len(got) == 2 * len(upd_keys) + len(del_keys) + len(ins_keys)
    by_type = {}
    for k, bal, ct in got:
        by_type.setdefault(ct, set()).add((k, bal))
    assert {k for k, _ in by_type["update_preimage"]} == upd_keys
    assert by_type["update_postimage"] == {
        (k, round(k * 1.5 + 100, 2)) for k in upd_keys
    }
    assert {k for k, _ in by_type["delete"]} == del_keys
    assert by_type["insert"] == {(k, 3.5) for k in ins_keys}


def test_no_key_cols_updates_split_into_delete_insert(spark, tmp_path):
    lake, route = _lake_route(spark, tmp_path, n=100, files=2)
    cfg = EngineConfig(output_path=lake)
    src = spark.range(90, 101).select(
        F.col("id").alias("k"),
        F.lit(0).cast("int").alias("seg"),
        F.lit(0.0).alias("bal"),
    )
    merge_lake_table_pruned(
        spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
        matched_update={"bal": "ROUND(t.bal + 1, 2)"},
        insert_when_not_matched=False,
    )
    feed = _feed(spark, route, 1, 2)
    types = {r["_change_type"] for r in feed.select("_change_type").collect()}
    assert types == {"delete", "insert"}
    n = feed.count()
    assert n == 2 * 11  # pre+post image per updated key, nothing else


def test_multi_generation_compressed_and_delete_reinsert(spark, tmp_path):
    lake, route = _lake_route(spark, tmp_path, n=100, files=2)
    # gen2: keyed delete of k in [1, 5]
    doomed = spark.range(1, 6).select(F.col("id").alias("k"))
    delete_keys_from_table(spark, route, "k", doomed)
    # gen3: re-insert k=3 with a different bal (append + delta publish)
    reinsert = spark.createDataFrame(
        [(3, 0, 999.99)], "k bigint, seg int, bal double"
    )
    import os

    before = {f for f in os.listdir(route) if f.startswith("part-")}
    reinsert.coalesce(1).write.mode("append").parquet(route)
    added = sorted(
        f
        for f in os.listdir(route)
        if f.startswith("part-") and f not in before
    )
    snap.publish_generation(spark, route, kind="append", add=added)
    assert snap.list_generations(spark, route) == [1, 2, 3]

    feed = _feed(spark, route, 1, 3, key_cols=["k"]).select("k", "bal", "_change_type")
    got = _rows(feed)
    # net semantics: k in {1,2,4,5} deleted; k=3 delete+reinsert → update
    assert ((3, round(3 * 1.5, 2), "update_preimage") in got)
    assert ((3, 999.99, "update_postimage") in got)
    assert {k for k, _, ct in got if ct == "delete"} == {1, 2, 4, 5}
    assert len(got) == 4 + 2


def test_identical_generations_empty_feed(spark, tmp_path):
    lake, route = _lake_route(spark, tmp_path, n=50, files=2)
    feed = _feed(spark, route, 1, 1)
    assert feed.count() == 0
    assert feed.columns[-1] == "_change_type"
    assert set(feed.columns) == {"k", "seg", "bal", "_change_type"}


def test_reverse_span_is_inverse(spark, tmp_path):
    lake, route = _lake_route(spark, tmp_path, n=100, files=2)
    doomed = spark.range(10, 20).select(F.col("id").alias("k"))
    delete_keys_from_table(spark, route, "k", doomed)
    fwd = _feed(spark, route, 1, 2).select("k", "_change_type")
    rev = _feed(spark, route, 2, 1).select("k", "_change_type")
    fwd_rows = _rows(fwd)
    rev_rows = _rows(rev)
    flip = {"insert": "delete", "delete": "insert"}
    assert {(k, flip[ct]) for k, ct in fwd_rows} == rev_rows


def test_schema_evolution_null_pads(spark, tmp_path):
    lake, route = _lake_route(spark, tmp_path, n=60, files=2)
    cfg = EngineConfig(output_path=lake)
    src = spark.range(55, 66).select(
        F.col("id").alias("k"),
        F.lit(1).cast("int").alias("seg"),
        F.lit(2.0).alias("bal"),
        F.lit("eu").alias("region"),
    )
    merge_lake_table_pruned(
        spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
        matched_update={"bal": "s.bal", "region": "s.region"},
        evolve_schema=True,
    )
    feed = _feed(spark, route, 1, 2, key_cols=["k"])
    assert "region" in feed.columns
    pre = feed.filter(F.col("_change_type") == "update_preimage")
    # the from-generation rows never had the column → null-padded
    assert pre.filter(F.col("region").isNotNull()).count() == 0
    post = feed.filter(F.col("_change_type") == "update_postimage")
    assert post.filter(F.col("region") == "eu").count() == post.count()


def test_error_paths(spark, tmp_path):
    lake, route = _lake_route(spark, tmp_path, n=50, files=2)
    doomed = spark.range(1, 3).select(F.col("id").alias("k"))
    delete_keys_from_table(spark, route, "k", doomed)

    with pytest.raises(ValueError, match="collides"):
        _feed(spark, route, 1, 2, change_col="bal")
    with pytest.raises(ValueError, match="key_cols"):
        _feed(spark, route, 1, 2, key_cols=["nope"])
    with pytest.raises(ValueError, match="key_cols"):
        _feed(spark, route, 1, 2, key_cols=[])
    with pytest.raises(FileNotFoundError):
        snap.diff_generations(spark, route, 99, 2)

    # vacuuming the from-generation makes its files unreadable → raise
    # (grace 0: the route is quiesced, force the vacuum this pass)
    snap.prune_generations(spark, route, keep_last=1, vacuum_grace_seconds=0)
    with pytest.raises(FileNotFoundError):
        _feed(spark, route, 1, 2).count()


def test_empty_generations_raise(spark, tmp_path):
    lake, route = _lake_route(spark, tmp_path, n=20, files=1)
    files = snap.read_generation(spark, route, 1)["files"]
    snap.publish_generation(spark, route, kind="truncate", remove=files)
    with pytest.raises(ValueError, match="empty"):
        _feed(spark, route, 2, 2)


def test_duplicate_key_multiplicity_mismatch_falls_back(spark, tmp_path):
    """With duplicate keys, a key whose net-removed and net-added row
    counts DIFFER cannot be presented as paired update images — its rows
    must keep plain delete/insert labels; a key with EQUAL multiplicity
    (including >1) still classifies as update pre/post images."""
    lake = str(tmp_path / "lake")
    route = f"{lake}/curated/crm/dups"
    rows = [
        # key 1: two identical-key rows now, one later  -> 2 removed, 1 added
        (1, 10.0), (1, 11.0),
        # key 2: two rows now, two (changed) later      -> 2:2, update
        (2, 20.0), (2, 21.0),
        # key 3: untouched carried ballast
        (3, 30.0),
    ]
    spark.createDataFrame(rows, "k int, bal double").coalesce(1).write.parquet(
        route
    )
    assert snap.enable_snapshots(spark, route) == 1

    after = [
        (1, 12.0),                 # key 1 collapsed to one row
        (2, 22.0), (2, 23.0),      # key 2 rewritten, same multiplicity
        (3, 30.0),                 # carried
    ]
    import os

    before_files = set(snap.read_generation(spark, route, 1)["files"])
    spark.createDataFrame(after, "k int, bal double").coalesce(
        1
    ).write.mode("append").parquet(route)
    added = sorted(
        f for f in os.listdir(route)
        if f.startswith("part-") and f not in before_files
    )
    snap.publish_generation(
        spark, route, kind="rewrite", add=added, remove=sorted(before_files)
    )

    feed = _feed(spark, route, 1, 2, key_cols=["k"])
    got = {(r["k"], r["bal"], r["_change_type"]) for r in feed.collect()}
    assert got == {
        # key 1: 2 removed vs 1 added -> no pairing, plain labels
        (1, 10.0, "delete"), (1, 11.0, "delete"), (1, 12.0, "insert"),
        # key 2: equal multiplicity -> update images
        (2, 20.0, "update_preimage"), (2, 21.0, "update_preimage"),
        (2, 22.0, "update_postimage"), (2, 23.0, "update_postimage"),
        # key 3 carried: cancelled, absent
    }
