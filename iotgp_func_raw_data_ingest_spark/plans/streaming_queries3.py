"""Round-6 streaming tranche 2: the last two streaming-native operators
still pytest-only get driver CORRECTNESS rows.

- q189: STREAM-STREAM inner interval join (click→purchase attribution,
  ``streaming.pipeline.stream_stream_conversion_join``). An inner
  interval join's result set is batching-invariant — every match is
  emitted exactly once as soon as both sides have arrived — PROVIDED no
  join state is evicted while a future match is still possible. Spark
  derives state retention from the watermark plus the join's time
  bound, which is sound when cross-batch event-time disorder stays
  under the watermark delay; the tranches are therefore TIME-SPLIT at
  the stream's midpoint (zero cross-batch disorder) so the streamed
  result provably equals the batch join the oracle runs.
- q190: streaming SESSION windows (gap-merged event-time sessions,
  ``streaming.pipeline.session_windows``) in append mode, where only
  sessions the advancing watermark has sealed are emitted. The gated
  output keeps sessions ending well below the final watermark (the
  q181 margin convention, safe on either side of the eviction
  boundary's </<= convention); the oracle replays gap sessionization
  with the islands-and-gaps window idiom. The break predicate is
  ``>= gap``: Spark merges an event only while it lands strictly
  inside [start, last+gap), so a gap of exactly ``gap`` starts a new
  session on both engines.

Both queries restart the drained stream once against its checkpoint:
the parquet sink's ``_spark_metadata`` log must not re-emit any row.
"""

from __future__ import annotations

import shutil
import tempfile
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register
from iotgp_func_raw_data_ingest_spark.plans.streaming_queries import (
    _few_shuffle_partitions,
)
from iotgp_func_raw_data_ingest_spark.plans.streaming_queries2 import (
    _write_ordered_tranches,
)


def _drain_twice(build_stream, out_dir: str, ckpt_dir: str) -> None:
    """Run an availableNow file-sink stream to completion twice — the
    second run restarts on the drained checkpoint and must emit
    nothing new (exactly-once sink contract)."""
    for _restart in range(2):
        q = (
            build_stream()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


@register(
    "q189_stream_stream_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.ts AS click_ts,
           p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def q189_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution as a real stream-stream join: the
    click and purchase halves of the events table are served as two
    separate file streams (two time-ordered tranches each, pinned
    arrival order), joined on user within a 1-hour event-time bound,
    both sides watermarked at 2 hours so join state is PRUNED as the
    watermark advances — bounded state at any stream length, the
    property that makes the operator viable at 100 TB.

    Why the hash must match the batch join: matches are emitted exactly
    once when the later side arrives; with tranches time-split at the
    midpoint, cross-batch disorder is zero < the 2-hour delay, so no
    click/purchase state is ever evicted while a future partner remains
    possible (a click is dropped only once the watermark passes
    click_ts + 1 h, by which time every purchase_ts ≤ click_ts + 1 h
    has arrived). A lost-state bug, premature eviction, or sink replay
    on the checkpoint restart each add/remove rows and flip the hash.

    Reference parity: the reference has no join of any kind
    (src/function_app.py); funnel attribution is part of this engine's
    streaming surface (SURVEY §2.6)."""
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        stream_stream_conversion_join,
    )

    t = prep(spark, sf_dir)
    events = t["events"]
    mn, mx = events.agg(F.min("ts"), F.max("ts")).first()
    mid = mn + (mx - mn) / 2
    work = tempfile.mkdtemp(prefix="q189_")
    try:
        with _few_shuffle_partitions(spark):
            early = F.col("ts") <= F.lit(mid)
            for side, pred in (
                ("clicks", F.col("event_type") == "click"),
                ("purchases", F.col("event_type") == "purchase"),
            ):
                _write_ordered_tranches(
                    [
                        events.filter(pred & early),
                        events.filter(pred & ~early),
                    ],
                    f"{work}/in_{side}",
                )

            def build():
                clicks = (
                    spark.readStream.schema(events.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{work}/in_clicks")
                )
                purchases = (
                    spark.readStream.schema(events.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{work}/in_purchases")
                )
                return stream_stream_conversion_join(
                    clicks, purchases, within="1 hour", watermark="2 hours"
                )

            _drain_twice(build, f"{work}/out", f"{work}/ckpt")
            out = spark.read.parquet(f"{work}/out").select(
                "user_id",
                "click_id",
                "purchase_id",
                "click_ts",
                "purchase_ts",
                "purchase_value",
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q190_streaming_session_windows",
    oracle="""
    WITH l AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 2 HOUR
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
        SELECT user_id, ts, value,
               SUM(brk) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM l
    ),
    s AS (
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 2 HOUR AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM g GROUP BY user_id, sid
    ),
    mx AS (SELECT max(ts) AS m FROM events)
    SELECT user_id, session_start, session_end, n_events, total_value
    FROM s, mx
    WHERE session_end <= m - INTERVAL 3 HOUR
    """,
)
def q190_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time SESSION windows (2-hour gap) per user as a streaming
    aggregation (``session_windows``: withWatermark → groupBy
    session_window), append mode — sessions are emitted only once the
    watermark passes their end, i.e. once no future event can extend
    them. Three time-ordered tranches (terciles of the time span) keep
    cross-batch disorder at zero so the 1-hour watermark is honest;
    the gated output keeps sessions ending ≤ max_ts − 3 h — two hours
    below the final watermark, safe on either side of the eviction
    boundary convention and immune to the admit-on-previous-watermark
    runtime quirk q181 documents. The oracle replays gap
    sessionization with the islands-and-gaps idiom (break at
    ``>= gap``, matching Spark's right-open [start, last+gap) merge
    rule) plus the same cap.

    100 TB shape: state is one open session per active user, evicted
    as the watermark advances — the unbounded-key analog of q181's
    windowed state bound. All JVM built-ins."""
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import session_windows

    t = prep(spark, sf_dir)
    events = t["events"]
    mn, mx = events.agg(F.min("ts"), F.max("ts")).first()
    third = (mx - mn) / 3
    cut1, cut2 = mn + third, mn + third * 2
    emit_cut = mx - timedelta(hours=3)
    work = tempfile.mkdtemp(prefix="q190_")
    try:
        with _few_shuffle_partitions(spark):
            _write_ordered_tranches(
                [
                    events.filter(F.col("ts") <= F.lit(cut1)),
                    events.filter(
                        (F.col("ts") > F.lit(cut1)) & (F.col("ts") <= F.lit(cut2))
                    ),
                    events.filter(F.col("ts") > F.lit(cut2)),
                ],
                f"{work}/in",
            )

            def build():
                stream = (
                    spark.readStream.schema(events.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{work}/in")
                )
                return session_windows(stream, gap="2 hours", watermark="1 hour")

            _drain_twice(build, f"{work}/out", f"{work}/ckpt")
            out = (
                spark.read.parquet(f"{work}/out")
                .filter(F.col("session_end") <= F.lit(emit_cut))
                .select(
                    "user_id",
                    "session_start",
                    "session_end",
                    F.col("n_events").cast("long").alias("n_events"),
                    "total_value",
                )
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
