"""Round-13 optimization pins: the shared feed+IVM ledger lifecycle,
the shared shingle frame, the FastSS footer-rows sizing tier, and the
parquet footer row census — each changed an operator's internals, so
each gets a behavioral test here (results must equal the unshared /
full-pass forms exactly)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.operators import dedup as D
from iotgp_func_raw_data_ingest_spark.sources import ivm
from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    _hadoop_fs,
    _parquet_rows_census,
    merge_lake_table_pruned,
    upsert_lake_table,
)
from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
    delete_keys_from_table,
)
from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
    start_changes_and_ivm_stream,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# shared feed+IVM ledger lifecycle (q236/q237's drain)
# ---------------------------------------------------------------------------


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


def test_changes_and_ivm_fanout_matches_two_streams(spark, tmp_path):
    """ONE ledger lifecycle fanning out to feed export + IVM refresh
    must reproduce exactly what the two separate streams produced:
    gen 1 emits no feed rows but builds the view; a merge drain emits
    (1,2] and refreshes; a delete drain — a RESTART on the same
    checkpoint — emits only (2,3]; a quiet drain emits nothing and
    no-ops the view; and the final view equals a from-scratch
    recompute."""
    lake, route, cfg = _seed(spark, tmp_path)
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    view = str(tmp_path / "view")

    def sink(feed, frm, to):
        feed.withColumn("from_gen", F.lit(frm)).withColumn(
            "to_gen", F.lit(to)
        ).write.mode("append").parquet(outdir)

    def drain():
        q = start_changes_and_ivm_stream(
            spark, route, sink, ckpt,
            view_path=view, group_cols=["seg"], sum_cols=["bal"],
            key_cols=["k"],
        )
        q.awaitTermination(300)

    drain()  # gen 1: no feed, view initial build
    assert not os.path.exists(outdir)
    assert ivm.read_view_meta(spark, view)["applied_generation"] == 1

    src = spark.range(10, 30).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("seg"),
        F.lit(7.25).alias("bal"),
    )
    merge_lake_table_pruned(
        spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
        matched_update={"bal": "s.bal"},
    )
    drain()  # gen 2: (1,2] feed + refresh
    doomed = spark.range(1, 6).select(F.col("id").alias("k"))
    delete_keys_from_table(spark, route, "k", doomed)
    drain()  # gen 3 RESTART leg: only (2,3]
    drain()  # quiet: nothing

    spans = {
        (r["from_gen"], r["to_gen"], r["_change_type"], r["n"])
        for r in spark.read.parquet(outdir)
        .groupBy("from_gen", "to_gen", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert spans == {
        (1, 2, "update_preimage", 20),
        (1, 2, "update_postimage", 20),
        (2, 3, "delete", 5),
    }
    meta = ivm.read_view_meta(spark, view)
    assert meta["applied_generation"] == 3
    recomputed = {
        (r["seg"], r["n_rows"], r["sum_bal"])
        for r in spark.read.parquet(route)
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.sum("bal"), 2).alias("sum_bal"),
        )
        .collect()
    }
    maintained = {
        (r["seg"], r["n_rows"], round(r["sum_bal"], 2))
        for r in ivm.read_view(spark, view).collect()
    }
    assert maintained == recomputed


def test_fanout_replayed_batch_does_not_duplicate_export(spark, tmp_path):
    """The feed leg keeps its committed-batch ledger under the SHARED
    checkpoint: marking a batch committed and re-running the fanned-out
    sink body must skip the export (the two-stream guarantee carries
    over)."""
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        batch_committed,
        mark_batch_committed,
    )

    ckpt = str(tmp_path / "ck")
    mark_batch_committed(spark, ckpt, 7)
    assert batch_committed(spark, ckpt, 7)
    assert not batch_committed(spark, ckpt, 8)


# ---------------------------------------------------------------------------
# net-form change feed (read_changes_between's single-aggregation diff)
# ---------------------------------------------------------------------------


def test_net_feed_replicates_exact_duplicate_rows(spark, tmp_path):
    """exceptAll multiset semantics on IDENTICAL full rows: a row held
    3x in the old generation and 1x in the new must emit exactly 2
    delete copies (net replication), and the reverse span 2 inserts —
    the edge the net-form groupBy must re-expand with array_repeat."""
    route = str(tmp_path / "dups")
    spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "a"), (2, "b")], "k long, v string"
    ).coalesce(1).write.parquet(route)
    assert snap.enable_snapshots(spark, route) == 1
    jvm, _, fs = _hadoop_fs(spark, route)
    old = [
        f.getPath().getName()
        for f in fs.listStatus(jvm.org.apache.hadoop.fs.Path(route))
        if f.getPath().getName().endswith(".parquet")
    ]
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b")], "k long, v string"
    ).coalesce(1).write.mode("append").parquet(route)
    now = [
        f.getPath().getName()
        for f in fs.listStatus(jvm.org.apache.hadoop.fs.Path(route))
        if f.getPath().getName().endswith(".parquet")
    ]
    snap.publish_generation(
        spark, route, kind="rewrite",
        add=[n for n in now if n not in old], remove=old,
    )

    rows = sorted(
        tuple(r)
        for r in snap.read_changes_between(spark, route, 1, 2).collect()
    )
    assert rows == [
        (1, "a", "delete"),
        (1, "a", "delete"),
        (2, "b", "insert"),
    ]
    # keyed form: key 1 has 2 net-deleted vs 0 net-added (unequal ->
    # stays delete); key 2 has 0 vs 1 (stays insert)
    keyed = sorted(
        tuple(r)
        for r in snap.read_changes_between(
            spark, route, 1, 2, key_cols=["k"]
        ).collect()
    )
    assert keyed == rows
    # reverse span is the exact inverse
    rev = sorted(
        tuple(r)
        for r in snap.read_changes_between(spark, route, 2, 1).collect()
    )
    assert rev == [
        (1, "a", "insert"),
        (1, "a", "insert"),
        (2, "b", "delete"),
    ]


# ---------------------------------------------------------------------------
# shared shingle frame (q147)
# ---------------------------------------------------------------------------


def test_shingled_param_matches_default(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text with no overlap here"),
            (4, "the quick brown fox jumps over the lazy dog"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    shingled = D.shingle_frame(docs, "doc_id", "text", k=3).localCheckpoint(
        eager=True
    )
    base_j = {tuple(r) for r in D.jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.3).collect()}
    shared_j = {tuple(r) for r in D.jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.3, shingled=shingled
    ).collect()}
    assert base_j == shared_j and base_j  # non-trivial and identical

    base_m = {tuple(r) for r in D.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, bands=8, threshold=0.3
    ).collect()}
    shared_m = {tuple(r) for r in D.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, bands=8, threshold=0.3,
        shingled=shingled,
    ).collect()}
    assert base_m == shared_m and base_m


# ---------------------------------------------------------------------------
# FastSS tier-2a footer-rows bound
# ---------------------------------------------------------------------------


def test_fastss_footer_rows_exact_on_scan(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("txt"),
        F.col("c_nationkey").alias("blk"),
    ).filter(F.col("txt").isNotNull())
    n = D._fastss_footer_rows(cust)
    assert n == spark.read.parquet(f"{SF}/customer.parquet").count()


def test_fastss_footer_rows_rejects_multiplying_plans(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    exploded = cust.select(
        F.explode(F.array(F.lit(1), F.lit(2))).alias("x"), "c_name"
    )
    assert D._fastss_footer_rows(exploded) is None
    joined = cust.alias("a").join(
        cust.alias("b"),
        F.col("a.c_nationkey") == F.col("b.c_nationkey"),
    )
    assert D._fastss_footer_rows(joined) is None
    local = spark.createDataFrame([(1, "x")], "id long, txt string")
    assert D._fastss_footer_rows(local) is None  # no input files


def test_fastss_sizing_is_job_free_on_footer_tier(spark):
    """A parquet-backed input small enough for the footer-rows bound
    must resolve to the session default with ZERO jobs (the r12 tier-3
    length agg is gone at this scale)."""
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("txt"),
        F.col("c_nationkey").alias("blk"),
    ).filter(F.col("txt").isNotNull())
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    parts = D._fastss_sort_partitions(cust, max_dist=2)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert parts == int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert after == before  # no job ran


# ---------------------------------------------------------------------------
# parquet footer row census (upsert / full merge / compaction)
# ---------------------------------------------------------------------------


def test_parquet_rows_census_matches_count(spark, tmp_path):
    dest = str(tmp_path / "t")
    spark.range(1234).repartition(3).write.parquet(dest)
    jvm, _, fs = _hadoop_fs(spark, dest)
    assert _parquet_rows_census(fs, jvm, dest) == 1234


def test_upsert_census_counts_match_real_rows(spark, tmp_path):
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(output_path=lake)
    base = spark.range(100).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v")
    )
    before, after = upsert_lake_table(
        spark, lake, "curated", "db", "t", base, ["k"], cfg
    )
    assert (before, after) == (0, 100)
    ups = spark.range(90, 120).select(
        F.col("id").alias("k"), F.lit(2.0).alias("v")
    )
    before, after = upsert_lake_table(
        spark, lake, "curated", "db", "t", ups, ["k"], cfg
    )
    assert (before, after) == (100, 120)
    assert spark.read.parquet(f"{lake}/curated/db/t").count() == 120
