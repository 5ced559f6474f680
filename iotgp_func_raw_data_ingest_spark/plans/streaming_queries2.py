"""Round-6 streaming tranche: the two streaming-native semantics that
were still pytest-only get driver CORRECTNESS rows.

- q181: event-time watermark late-data DROP, end-to-end through a real
  ``withWatermark`` append-mode streaming aggregation. The stream's
  arrival order is made deterministic (two files with pinned
  modification times), so which rows are "late beyond the watermark" is
  a pure function of the data and the batch answer is ANSI SQL.
- q182: the CDC upsert stream (``start_upsert_stream`` — the one
  streaming entry point without a gate query until now), gated via the
  q177 batching-invariance pattern: each micro-batch carries at most one
  row per key, batches arrive in a pinned order, so last-write-wins has
  a deterministic per-key winner the oracle can replay with a window
  function.

Both queries include the checkpoint-restart leg: the drained stream is
restarted against the same checkpoint, so a re-emitted window, a
re-applied (stale) upsert batch, or lost sink state flips the hash.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register
from iotgp_func_raw_data_ingest_spark.plans.streaming_queries import (
    _few_shuffle_partitions,
)


def _write_ordered_tranches(tranches: list[DataFrame], in_dir: str) -> None:
    """Materialize each tranche as ONE parquet file with a pinned,
    strictly increasing modification time, so a maxFilesPerTrigger=1
    file stream replays them as micro-batches in EXACTLY list order.
    FileStreamSource orders pending files by (mtime, path); both are
    pinned here (utime + tranche-index file names), so arrival order —
    which decides what is late (q181) and which update wins (q182) — is
    deterministic across runs and engines, not an artifact of write
    latency."""
    os.makedirs(in_dir, exist_ok=True)
    for i, tranche in enumerate(tranches):
        tmp = f"{in_dir}/.tmp-{i}"
        tranche.coalesce(1).write.mode("overwrite").parquet(tmp)
        parts = [p for p in os.listdir(tmp) if p.startswith("part-")]
        if parts:  # an empty tranche writes no part file — skip it
            dst = f"{in_dir}/tranche-{i}.parquet"
            os.rename(f"{tmp}/{parts[0]}", dst)
            pinned = 1_700_000_000 + i * 10
            os.utime(dst, (pinned, pinned))
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "q181_watermark_late_drop",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    ontime AS (
        SELECT e.* FROM events e, mx WHERE e.ts > mx.m - INTERVAL 2 DAY
    )
    SELECT date_trunc('hour', o.ts) AS window_start,
           o.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o.value), 2) AS total_value
    FROM ontime o, mx
    WHERE date_trunc('hour', o.ts) + INTERVAL 1 HOUR <= mx.m - INTERVAL 2 HOUR
    GROUP BY 1, 2
    """,
)
def q181_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data dropping under the hash gate, end-to-end
    through ``streaming.pipeline.windowed_event_counts``
    (withWatermark → event-time window agg, APPEND output mode — the
    mode where watermarks actually evict state and drop late rows).

    The deterministic late tranche: events are served as THREE files in
    pinned order — file 0 the even-event_id half of the RECENT rows
    (ts > max_ts − 2 days), file 1 the odd half (an on-time SPACER),
    file 2 the OLD rows. The spacer exists because of a measured
    semantic of this runtime (pinned by experiment, 2026-08): the
    stateful aggregation EVICTS with the current batch's watermark but
    ADMITS late input against the PREVIOUS batch's watermark — a late
    tranche arriving in batch 1 is admitted under wm₀ = epoch, then its
    stale windows are instantly evicted-and-EMITTED under wm₁. With the
    spacer, the old rows arrive in batch 2, whose admission watermark
    (max(file 0's ts) − 1 h, within minutes of max_ts − 1 h at every SF)
    stands ≥ 45 hours above every old row — all of them drop before
    aggregation; if the watermark failed, their windows would be emitted
    on the final flush and break the hash. The gated output keeps only
    windows ending ≤ max_ts − 2 h — at least an hour below the final
    watermark on both sides of any eviction-boundary convention, so the
    gate never depends on whether emission is ``<`` or ``<=`` the
    watermark (every kept window is also complete: both on-time files
    have fully arrived before any eviction can touch them). The oracle
    is the batch GROUP BY over exactly the on-time rows with the same
    window cap.

    The drained stream is restarted once against its checkpoint: the
    parquet file sink's ``_spark_metadata`` log must not re-emit any
    window (exactly-once sink contract).

    100 TB shape: state is one row per open (window, event_type); the
    watermark bounds it to ~2 h of windows regardless of stream length —
    the entire point of event-time watermarks. All JVM built-ins.

    Reference parity: the reference processes whatever the trigger
    hands it with no event-time semantics (src/function_app.py:318-427);
    late-data bounding is part of this engine's streaming surface
    (SURVEY §2.6)."""
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        windowed_event_counts,
    )

    t = prep(spark, sf_dir)
    events = t["events"]
    # bounded single-row agg: the tranche boundary and emission cap are
    # literals derived from max(ts) (the typed.py collect contract)
    mx = events.agg(F.max("ts")).first()[0]
    late_cut = mx - timedelta(days=2)
    emit_cut = mx - timedelta(hours=2)
    work = tempfile.mkdtemp(prefix="q181_")
    try:
        with _few_shuffle_partitions(spark):
            ontime = F.col("ts") > F.lit(late_cut)
            _write_ordered_tranches(
                [
                    events.filter(ontime & (F.col("event_id") % 2 == 0)),
                    events.filter(ontime & (F.col("event_id") % 2 == 1)),
                    events.filter(~ontime),
                ],
                f"{work}/in",
            )
            for _restart in range(2):  # 2nd: restart on a drained checkpoint
                stream = (
                    spark.readStream.schema(events.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{work}/in")
                )
                agg = windowed_event_counts(
                    stream, window="1 hour", watermark="1 hour"
                )
                q = (
                    agg.writeStream.format("parquet")
                    .option("path", f"{work}/out")
                    .option("checkpointLocation", f"{work}/ckpt")
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
            out = (
                spark.read.parquet(f"{work}/out")
                .filter(F.col("window_end") <= F.lit(emit_cut))
                .select(
                    "window_start",
                    "event_type",
                    F.col("n").cast("long").alias("n"),
                    "total_value",
                )
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q182_upsert_stream_cdc",
    oracle="""
    WITH ranked AS (
        SELECT event_id, ts, user_id, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn
        FROM events
    ),
    want AS (
        SELECT user_id, LEAST(MAX(rn), 4) AS rn FROM ranked GROUP BY user_id
    )
    SELECT r.user_id, r.event_id, r.ts, r.event_type,
           ROUND(r.value, 4) AS value
    FROM ranked r JOIN want w ON r.user_id = w.user_id AND r.rn = w.rn
    """,
)
def q182_upsert_stream_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC upsert stream (``streaming.pipeline.start_upsert_stream``
    — foreachBatch → keyed last-write-wins upsert, committed-batch
    ledger) under the hash gate.

    Last-write-wins is only deterministic if each batch has one row per
    key and batches arrive in a known order, so the stream is built that
    way: events are ranked per user by (ts, event_id) and file i carries
    every user's i-th event (i = 1..4, ranks beyond 4 are not streamed —
    four files keep the per-micro-batch upsert count bounded). Each
    micro-batch therefore holds unique keys, the pinned file order makes
    batch i apply strictly after batch i−1, and the final route content
    is each user's rank-min(count, 4) row — which the oracle replays
    with a window function. The drained stream restarts once against
    its checkpoint: the ledger must skip every committed batch, because
    re-applying ANY earlier batch would roll keys back to stale values
    and flip the hash (this is what makes last-write-wins REPLAY-
    sensitive where q177's re-mergeable rollup was replay-tolerant —
    the gate covers the harder contract).

    100 TB shape: per batch, one anti-join + carried-row rewrite scoped
    to ONE route — the fix-up-feed design (see start_upsert_stream's
    docstring); the firehose path appends and reconciles in batch."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import read_lake_table
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_upsert_stream,
    )
    from pyspark.sql import Window

    t = prep(spark, sf_dir)
    events = t["events"].select("event_id", "ts", "user_id", "event_type", "value")
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    ranked = events.withColumn("rn", rn)
    work = tempfile.mkdtemp(prefix="q182_")
    try:
        with _few_shuffle_partitions(spark):
            _write_ordered_tranches(
                [
                    ranked.filter(F.col("rn") == i).drop("rn")
                    for i in range(1, 5)
                ],
                f"{work}/in",
            )
            cfg = EngineConfig(output_path=f"{work}/lake")
            for _restart in range(2):  # 2nd: restart on a drained checkpoint
                stream = (
                    spark.readStream.schema(events.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{work}/in")
                )
                q = start_upsert_stream(
                    stream,
                    f"{work}/lake", "cdc", "events", "latest",
                    key_cols=["user_id"],
                    cfg=cfg,
                    checkpoint_dir=f"{work}/ckpt",
                )
                q.awaitTermination()
            final = read_lake_table(spark, f"{work}/lake", "cdc", "events", "latest")
            out = final.select(
                "user_id",
                "event_id",
                "ts",
                "event_type",
                F.round("value", 4).alias("value"),
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
