"""Round-6 streaming tranche 3: the two remaining streaming join/dedup
modes get driver CORRECTNESS rows.

- q196: STREAM-STATIC dimension enrichment
  (``streaming.pipeline.stream_static_enrich``) — the third and last
  join mode the streaming surface supports (stream-stream landed as
  q189; batch joins are q04-q09 territory). Stateless per micro-batch,
  so the streamed result is trivially batching-invariant and must
  hash-equal the batch join the oracle runs; a dropped batch, a join
  that silently degrades to null-matches, or sink replay on the
  checkpoint restart all flip the hash.
- q197: native windowed-state dedup
  (``streaming.pipeline.stream_dedup_within_watermark``, Spark's
  ``dropDuplicatesWithinWatermark``) — the all-JVM sibling of q178's
  applyInPandasWithState dedup. A deterministic re-delivery tranche
  (exact copies of every first-half event with event_id ≡ 0 mod 3) is
  replayed immediately after the first half; the watermark delay spans
  the whole stream, so every re-delivery provably lands while its
  key's state is live and the output must equal the original event
  set exactly — duplicates passing through (broken state), originals
  dropped (over-eager eviction), or checkpoint-restart re-emission
  each change the row set.

Both run their stream twice against one checkpoint (the q189 restart
convention) with pinned tranche arrival order
(streaming_queries2._write_ordered_tranches).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register
from iotgp_func_raw_data_ingest_spark.plans.streaming_queries import (
    _few_shuffle_partitions,
)
from iotgp_func_raw_data_ingest_spark.plans.streaming_queries2 import (
    _write_ordered_tranches,
)
from iotgp_func_raw_data_ingest_spark.plans.streaming_queries3 import _drain_twice


@register(
    "q196_stream_static_enrich",
    oracle="""
    SELECT c.c_mktsegment,
           e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
)
def q196_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dimension enrichment: the events table is served as a
    3-tranche file stream, each micro-batch broadcast-joined to the
    static customer-segment dim (stream_static_enrich), the enriched
    rows appended to a parquet sink, the drained stream restarted once
    against its checkpoint (no row may re-emit), and the sink then
    aggregated per (segment, event_type). The join is stateless per
    batch, so the streamed union must equal the oracle's batch join —
    the gate catches lost/duplicated batches, a broken broadcast path
    under the streaming planner, and sink replay.

    100 TB shape: the canonical lookup-enrichment stage — the dim rides
    as a broadcast (or a pre-bucketed co-located join when it outgrows
    the threshold); no state store, no watermark, per-batch cost linear
    in THAT batch only. The post-hoc aggregate is a plain grouped count/
    sum over the enriched lake table."""
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        stream_static_enrich,
    )

    t = prep(spark, sf_dir)
    events = t["events"]
    dim = t["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    mn, mx = events.agg(F.min("ts"), F.max("ts")).first()
    third = (mx - mn) / 3
    cut1, cut2 = mn + third, mn + third * 2
    work = tempfile.mkdtemp(prefix="q196_")
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
                return stream_static_enrich(stream, dim, "user_id")

            _drain_twice(build, f"{work}/out", f"{work}/ckpt")
            out = (
                spark.read.parquet(f"{work}/out")
                .groupBy("c_mktsegment", "event_type")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.round(F.sum("value"), 2).alias("sum_value"),
                )
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q197_streaming_dedup_watermark",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events
    """,
)
def q197_streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native windowed-state streaming dedup under the hash gate: the
    stream replays (1) all first-half events, (2) a RE-DELIVERY tranche
    — exact copies of every first-half event with event_id ≡ 0 mod 3 —
    then (3) the second half. ``dropDuplicatesWithinWatermark`` on
    event_id with a delay spanning the whole stream keeps first
    arrivals and must drop every re-delivery (its key's state is
    provably live: the watermark cannot pass any key's expiry before
    the stream ends), so the sink equals the original events table
    row-for-row. The drained stream restarts once on its checkpoint —
    state and sink log must both hold.

    Failure modes gated: duplicates passing through (extra rows →
    count mismatch), originals evicted early (missing rows), payload
    mangling (value hash), restart re-emission.

    100 TB shape: state is bounded by the keys arriving within the
    delay window — the trade that makes native dedup viable on
    unbounded key spaces; the delay is sized to the source's real
    re-delivery horizon (here: the whole toy stream, to make the drop
    obligation provable for the gate). The custom-state alternative
    with per-key TTL logic is q178."""
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        stream_dedup_within_watermark,
    )

    t = prep(spark, sf_dir)
    events = t["events"]
    mn, mx = events.agg(F.min("ts"), F.max("ts")).first()
    mid = mn + (mx - mn) / 2
    first_half = events.filter(F.col("ts") <= F.lit(mid))
    work = tempfile.mkdtemp(prefix="q197_")
    try:
        with _few_shuffle_partitions(spark):
            _write_ordered_tranches(
                [
                    first_half,
                    first_half.filter(F.col("event_id") % 3 == 0),
                    events.filter(F.col("ts") > F.lit(mid)),
                ],
                f"{work}/in",
            )

            def build():
                stream = (
                    spark.readStream.schema(events.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{work}/in")
                )
                return stream_dedup_within_watermark(
                    stream, ["event_id"], "ts", "3650 days"
                )

            _drain_twice(build, f"{work}/out", f"{work}/ckpt")
            out = spark.read.parquet(f"{work}/out").select(
                "event_id", "ts", "user_id", "event_type", "value", "props"
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
