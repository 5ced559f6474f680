"""Continuous change-feed consumption off the generation ledger
(``sources.pydatasource.GenerationLedgerStreamSource`` +
``streaming.pipeline.start_changes_stream`` /
``start_ivm_refresh_stream``): offset = generation number, so Spark's
own offset log checkpoints the applied-generation watermark — restarts
resume exactly, spans compress to one net feed, pruned history fails
loudly, and IVM refreshes become commit-driven."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources import ivm
from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
from iotgp_func_raw_data_ingest_spark.sources.lake import merge_lake_table_pruned
from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
    delete_keys_from_table,
)
from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
    start_changes_stream,
    start_ivm_refresh_stream,
)


def _seed(spark, base, n=200, files=4):
    lake = str(base / "lake")
    route = f"{lake}/curated/crm/accounts"
    df = spark.range(1, n + 1).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("seg"),
        F.round(F.col("id") * 1.5, 2).alias("bal"),
    )
    df.repartitionByRange(files, "k").write.parquet(route)
    assert snap.enable_snapshots(spark, route) == 1
    return lake, route, EngineConfig(output_path=lake)


def _merge_updates(spark, lake, cfg, lo, hi):
    src = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("seg"),
        F.lit(7.25).alias("bal"),
        F.lit("u").alias("op"),
    )
    merge_lake_table_pruned(
        spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
        matched_update={"bal": "s.bal"},
        matched_update_condition="s.op = 'u'",
        matched_delete_condition="s.op = 'd'",
    )


def _drain(q):
    q.awaitTermination(300)


def _collected(spark, outdir):
    if not os.path.exists(outdir):
        return set()
    return {
        (r["from_gen"], r["to_gen"], r["_change_type"], r["n"])
        for r in spark.read.parquet(outdir)
        .groupBy("from_gen", "to_gen", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_follow_ledger_across_restarts(spark, tmp_path):
    """Each availableNow run drains the ledger from the checkpointed
    watermark: leg A (only gen 1) emits nothing, leg B emits (1,2],
    leg C — a RESTART — emits only (2,3], leg D re-emits nothing."""
    lake, route, cfg = _seed(spark, tmp_path)
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def sink(feed, frm, to):
        feed.withColumn("from_gen", F.lit(frm)).withColumn(
            "to_gen", F.lit(to)
        ).write.mode("append").parquet(outdir)

    _drain(start_changes_stream(spark, route, sink, ckpt, key_cols=["k"]))
    assert _collected(spark, outdir) == set()  # gen 1 is not a change

    _merge_updates(spark, lake, cfg, 50, 61)  # gen 2: 11 updates
    _drain(start_changes_stream(spark, route, sink, ckpt, key_cols=["k"]))
    assert _collected(spark, outdir) == {
        (1, 2, "update_preimage", 11),
        (1, 2, "update_postimage", 11),
    }

    doomed = spark.range(1, 201).filter(F.col("id") % 7 == 0).select(
        F.col("id").alias("k")
    )
    delete_keys_from_table(spark, route, "k", doomed)  # gen 3: 28 deletes
    _drain(start_changes_stream(spark, route, sink, ckpt, key_cols=["k"]))
    after_c = _collected(spark, outdir)
    assert after_c == {
        (1, 2, "update_preimage", 11),
        (1, 2, "update_postimage", 11),
        (2, 3, "delete", 28),
    }

    _drain(start_changes_stream(spark, route, sink, ckpt, key_cols=["k"]))
    assert _collected(spark, outdir) == after_c  # nothing re-emitted


def test_multi_generation_batch_compresses_to_one_feed(spark, tmp_path):
    """Two commits between runs arrive as ONE batch and ONE compressed
    feed (delete-then-reinsert of the same content nets to the update
    classes only, q233 semantics)."""
    lake, route, cfg = _seed(spark, tmp_path)
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spans = []

    def sink(feed, frm, to):
        spans.append((frm, to))
        feed.withColumn("from_gen", F.lit(frm)).withColumn(
            "to_gen", F.lit(to)
        ).write.mode("append").parquet(outdir)

    _merge_updates(spark, lake, cfg, 10, 16)   # gen 2
    _merge_updates(spark, lake, cfg, 100, 103)  # gen 3
    _drain(start_changes_stream(spark, route, sink, ckpt, key_cols=["k"]))
    assert spans == [(1, 3)]
    assert _collected(spark, outdir) == {
        (1, 3, "update_preimage", 9),   # 6 keys (gen 2) + 3 keys (gen 3)
        (1, 3, "update_postimage", 9),
    }


def test_span_splits_at_whole_route_rewrite(spark, tmp_path):
    """A batch whose span crosses a compaction generation is split at
    it: the rewrite generation gets its own singleton span (whose
    compressed feed is EMPTY — a pure rewrite carries every row), and
    the delta runs on either side stay delta-sized — their manifests
    share files with the route instead of replacing all of them."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        compact_lake_table,
    )

    lake, route, cfg = _seed(spark, tmp_path)
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spans = []

    def sink(feed, frm, to):
        spans.append((frm, to))
        feed.withColumn("from_gen", F.lit(frm)).withColumn(
            "to_gen", F.lit(to)
        ).write.mode("append").parquet(outdir)

    _merge_updates(spark, lake, cfg, 50, 61)  # gen 2: 11 updates
    compact_lake_table(
        spark, lake, "curated", "crm", "accounts", cfg,
        target_records_per_file=50, zorder_cols=["k"],
    )  # gen 3: whole-route rewrite (kind "compact"), 4 clustered files
    _merge_updates(spark, lake, cfg, 150, 153)  # gen 4: 3 updates
    _drain(start_changes_stream(spark, route, sink, ckpt, key_cols=["k"]))

    assert spans == [(1, 2), (2, 3), (3, 4)]
    assert _collected(spark, outdir) == {
        (1, 2, "update_preimage", 11),
        (1, 2, "update_postimage", 11),
        # (2, 3] — the compaction — nets to ZERO feed rows
        (3, 4, "update_preimage", 3),
        (3, 4, "update_postimage", 3),
    }
    # the rewrite span replaced every file; the delta spans share most
    # of theirs — that sharing IS the "input stays delta-sized" claim
    # (read_changes_between only ever opens added+removed files)
    d_rewrite = snap.diff_generations(spark, route, 2, 3)
    assert d_rewrite["shared"] == []
    d_delta = snap.diff_generations(spark, route, 3, 4)
    n_before = len(snap.read_generation(spark, route, 3)["files"])
    assert d_delta["shared"]
    assert len(d_delta["removed"]) < n_before


def test_start_generation_skips_history(spark, tmp_path):
    lake, route, cfg = _seed(spark, tmp_path)
    _merge_updates(spark, lake, cfg, 10, 16)   # gen 2 — to be skipped
    _merge_updates(spark, lake, cfg, 100, 103)  # gen 3
    outdir = str(tmp_path / "out")

    def sink(feed, frm, to):
        feed.withColumn("from_gen", F.lit(frm)).withColumn(
            "to_gen", F.lit(to)
        ).write.mode("append").parquet(outdir)

    _drain(
        start_changes_stream(
            spark, route, sink, str(tmp_path / "ckpt"),
            key_cols=["k"], start_generation=2,
        )
    )
    assert _collected(spark, outdir) == {
        (2, 3, "update_preimage", 3),
        (2, 3, "update_postimage", 3),
    }


def test_pruned_history_fails_loudly(spark, tmp_path):
    """A stream whose watermark (or span interior) has been pruned from
    the ledger must raise with the remedy, never skip history."""
    lake, route, cfg = _seed(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    _drain(start_changes_stream(spark, route, lambda *a: None, ckpt))
    _merge_updates(spark, lake, cfg, 10, 16)    # gen 2
    _merge_updates(spark, lake, cfg, 100, 103)  # gen 3
    snap.prune_generations(
        spark, route, keep_last=1, vacuum_grace_seconds=0
    )  # drops gens 1, 2
    q = start_changes_stream(spark, route, lambda *a: None, ckpt)
    with pytest.raises(Exception, match="prune"):
        q.awaitTermination(300)


def test_ivm_refresh_stream_event_driven(spark, tmp_path):
    """The ledger stream drives refresh_view_from_changes: initial
    build on first drain, incremental after each commit, noop when the
    ledger is quiet — and the view stays exactly equal to a recompute."""
    lake, route, cfg = _seed(spark, tmp_path)
    view = str(tmp_path / "view")

    def recompute():
        return {
            r["seg"]: (r["n_rows"], round(r["sum_bal"], 2))
            for r in snap.read_route_snapshot(spark, route)
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("bal").alias("sum_bal"),
            )
            .collect()
        }

    def view_rows():
        return {
            r["seg"]: (r["n_rows"], round(r["sum_bal"], 2))
            for r in ivm.read_view(spark, view).collect()
        }

    _drain(start_ivm_refresh_stream(spark, route, view, ["seg"], ["bal"]))
    assert ivm.read_view_meta(spark, view)["applied_generation"] == 1
    assert view_rows() == recompute()

    _merge_updates(spark, lake, cfg, 40, 71)  # gen 2
    doomed = spark.range(1, 201).filter(F.col("id") % 3 == 0).select(
        F.col("id").alias("k")
    )
    delete_keys_from_table(spark, route, "k", doomed)  # gen 3
    _drain(start_ivm_refresh_stream(spark, route, view, ["seg"], ["bal"]))
    assert ivm.read_view_meta(spark, view)["applied_generation"] == 3
    assert view_rows() == recompute()

    # quiet ledger: the drain finds nothing and the view is untouched
    before = view_rows()
    _drain(start_ivm_refresh_stream(spark, route, view, ["seg"], ["bal"]))
    assert view_rows() == before


def test_ivm_refresh_stream_starts_on_pruned_ledger(spark, tmp_path):
    """The ledger stream backing the IVM refresh must default its start
    to the oldest RETAINED generation (or the view's own watermark) —
    a hardcoded 0 would enumerate every manifest from gen 1 and raise
    FileNotFoundError on a mature route whose early history
    prune_generations already dropped, even though the refresh needs
    none of it."""
    lake, route, cfg = _seed(spark, tmp_path)
    view = str(tmp_path / "view")
    _merge_updates(spark, lake, cfg, 10, 16)    # gen 2
    _merge_updates(spark, lake, cfg, 100, 103)  # gen 3
    snap.prune_generations(
        spark, route, keep_last=2, vacuum_grace_seconds=0
    )  # drops gen 1 — a start at 0 would fail partitions() on it
    _drain(start_ivm_refresh_stream(spark, route, view, ["seg"], ["bal"]))
    assert ivm.read_view_meta(spark, view)["applied_generation"] == 3

    # with the view's watermark now at 3, a later commit + deeper prune
    # still refreshes: the default start is the applied generation
    _merge_updates(spark, lake, cfg, 150, 156)  # gen 4
    snap.prune_generations(
        spark, route, keep_last=2, vacuum_grace_seconds=0
    )  # keeps only gens 3, 4
    _drain(start_ivm_refresh_stream(spark, route, view, ["seg"], ["bal"]))
    assert ivm.read_view_meta(spark, view)["applied_generation"] == 4
    recomputed = {
        (r["seg"], r["n_rows"], round(r["sum_bal"], 2))
        for r in snap.read_route_snapshot(spark, route)
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("bal").alias("sum_bal"),
        )
        .collect()
    }
    maintained = {
        (r["seg"], r["n_rows"], round(r["sum_bal"], 2))
        for r in ivm.read_view(spark, view).collect()
    }
    assert maintained == recomputed


def test_ledger_rows_carry_manifest_summaries(spark, tmp_path):
    """The source's rows are the manifest summaries themselves —
    generation / parent / kind / n_files — usable directly for commit
    monitoring without any feed computation."""
    from iotgp_func_raw_data_ingest_spark.sources.pydatasource import (
        register_python_datasources,
    )

    lake, route, cfg = _seed(spark, tmp_path)
    _merge_updates(spark, lake, cfg, 10, 16)  # gen 2
    register_python_datasources(spark)
    rows = []
    q = (
        spark.readStream.format("generation_ledger_stream")
        .option("route", route)
        .load()
        .writeStream.foreachBatch(
            lambda df, _id: rows.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {(r["generation"], r["parent"], r["kind"]) for r in rows}
    assert got == {(1, None, "enable"), (2, 1, "merge")}
    assert all(r["n_files"] > 0 for r in rows)


def test_not_enabled_route_fails_fast(spark, tmp_path):
    """A changes/IVM stream on a route with no generation ledger raises
    at construction (nothing to follow), never spins silently."""
    route = str(tmp_path / "lake" / "curated" / "crm" / "plain")
    spark.range(5).select(F.col("id").alias("k")).write.parquet(route)
    with pytest.raises(ValueError, match="enable_snapshots"):
        start_changes_stream(
            spark, route, lambda *a: None, str(tmp_path / "c1")
        )
    with pytest.raises(ValueError, match="enable_snapshots"):
        start_ivm_refresh_stream(
            spark, route, str(tmp_path / "v"), ["k"]
        )


def test_replayed_batch_does_not_duplicate_export(spark, tmp_path):
    """The crash window foreachBatch leaves open: the sink ran but
    Spark's offset commit didn't land. Simulated by deleting the last
    checkpoint commit file after a drain — the restarted stream replays
    that batch id, and the committed-batch ledger must skip the sink so
    the export is not duplicated."""
    lake, route, cfg = _seed(spark, tmp_path)
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def sink(feed, frm, to):
        feed.withColumn("from_gen", F.lit(frm)).withColumn(
            "to_gen", F.lit(to)
        ).write.mode("append").parquet(outdir)

    _merge_updates(spark, lake, cfg, 50, 61)  # gen 2: 11 updates
    _drain(start_changes_stream(spark, route, sink, ckpt, key_cols=["k"]))
    before = _collected(spark, outdir)
    assert before == {
        (1, 2, "update_preimage", 11),
        (1, 2, "update_postimage", 11),
    }

    # crash simulation: the sink's work (and our ledger marker) landed,
    # Spark's own batch commit did not
    commits = sorted(
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"  # local-FS checksum sidecar
    if os.path.exists(crc):
        os.remove(crc)

    _drain(start_changes_stream(spark, route, sink, ckpt, key_cols=["k"]))
    assert _collected(spark, outdir) == before  # replay skipped the sink
