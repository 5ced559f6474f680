"""Streaming-surface gate queries: run REAL Structured Streaming jobs
(foreachBatch continuous aggregate, applyInPandasWithState dedup) over
the driver's static tables split into multiple micro-batches, and return
their final state as a batch DataFrame with a full DuckDB oracle.

Until this tranche the streaming surface (streaming/pipeline.py,
streaming/stateful.py) was pytest-only; these queries give it driver
CORRECTNESS rows. The trick that makes streams oracle-expressible: with
``availableNow`` triggers over a bounded input, a streaming computation
whose result is batching-invariant (a keyed re-mergeable rollup; the
distinct-key set of a stateful dedup) must equal the batch answer, which
IS ANSI SQL. The gate therefore proves end-to-end exactly-once behavior:
a double-merged batch or a dropped state row would change the hash.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


def _split_events(spark: SparkSession, sf_dir: str, out_dir: str, n_files: int) -> DataFrame:
    """Materialize the events table as ``n_files`` parquet files so a
    maxFilesPerTrigger=1 file stream replays it as n_files micro-batches
    — every per-batch code path (ledger append, state update on an
    existing key, rollup re-merge) genuinely executes."""
    t = prep(spark, sf_dir)
    events = t["events"]
    events.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return events


class _few_shuffle_partitions:
    """Temporarily pin spark.sql.shuffle.partitions for a streaming run.

    Stateful operators and foreachBatch sinks create one state-store /
    shuffle partition PER configured shuffle partition PER micro-batch;
    under the driver's vanilla session (200) that is 800 checkpointed
    state tasks for a 4-batch toy stream — measured to stall the gate.
    The streams here start from a fresh checkpoint every invocation, so
    the partitioning is free to choose; the conf is restored on exit
    (results are pinned by localCheckpoint before that). At real scale
    the session owner sizes this conf per DEPLOYMENT.md — this guard
    only covers the gate's borrowed session."""

    def __init__(self, spark: SparkSession, n: int = 8):
        self._spark, self._n = spark, n

    def __enter__(self):
        self._old = self._spark.conf.get("spark.sql.shuffle.partitions")
        self._spark.conf.set("spark.sql.shuffle.partitions", str(self._n))

    def __exit__(self, *exc):
        self._spark.conf.set("spark.sql.shuffle.partitions", self._old)
        return False


@register(
    "q177_streaming_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start,
           event_type,
           ROUND(SUM(value), 2) AS sum_v,
           CAST(COUNT(*) AS BIGINT) AS count_v,
           ROUND(MIN(value), 4) AS min_v,
           ROUND(MAX(value), 4) AS max_v
    FROM events
    GROUP BY 1, 2
    """,
)
def q177_streaming_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming continuous aggregate, gated against the batch answer:
    the events table is re-served as a 4-file stream, each micro-batch
    refreshes a persisted hourly (event_type) rollup through
    ``streaming.pipeline.start_rollup_stream`` (foreachBatch →
    incremental_rollup → crash-safe upsert swap, committed-batch
    ledger), the DRAINED stream is restarted once against the same
    checkpoint (the crash/restart path — no batch may re-merge), and
    the final rollup table is returned. Because sum/count/min/max are
    re-mergeable, the result is batching-invariant: it must hash-equal
    the oracle's one-shot GROUP BY, so a replayed or dropped micro-batch
    flips the gate.

    100 TB shape: per micro-batch cost is one groupBy over NEW rows plus
    an upsert whose carried side is the rollup itself (buckets × dims),
    independent of history size — the hypertable continuous-aggregate
    design (see start_rollup_stream's docstring)."""
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_rollup_stream,
    )

    work = tempfile.mkdtemp(prefix="q177_")
    try:
        with _few_shuffle_partitions(spark):
            events = _split_events(spark, sf_dir, f"{work}/in", n_files=4)
            cfg = EngineConfig(output_path=f"{work}/lake")
            for _restart in range(2):  # 2nd run: restart on a drained checkpoint
                stream = (
                    spark.readStream.schema(events.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{work}/in")
                )
                q = start_rollup_stream(
                    stream,
                    f"{work}/lake", "rollups", "events", "hourly",
                    ts_col="ts", bucket="hour", dims=["event_type"], value_col="value",
                    cfg=cfg, checkpoint_dir=f"{work}/ckpt",
                )
                q.awaitTermination()
            rollup = spark.read.parquet(f"{work}/lake/rollups/events/hourly")
            out = rollup.select(
                F.col("bucket_start"),
                "event_type",
                F.round("sum_v", 2).alias("sum_v"),
                F.col("count_v").cast("long").alias("count_v"),
                F.round("min_v", 4).alias("min_v"),
                F.round("max_v", 4).alias("max_v"),
            )
            # pin the tiny result (buckets × types) so the temp lake can
            # be deleted before the caller collects
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q178_streaming_dedup_keys",
    oracle="""
    SELECT DISTINCT event_type AS key FROM events
    """,
)
def q178_streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup, gated: the 4-micro-batch events stream
    runs through ``streaming.stateful.streaming_dedup``
    (applyInPandasWithState, TTL state) keyed by event_type; each key is
    emitted exactly once — in whichever batch it first arrives — and
    every later batch hits the state.exists absorb path. The emitted KEY
    SET is batching-invariant (the per-batch first_seen_count is not —
    it depends on how files split — so only the key column is gated):
    it must hash-equal SELECT DISTINCT. A dropped state row would emit a
    key twice; lost state, zero times.

    100 TB shape: state is one counter per key, pruned by the
    processing-time TTL — memory bounded by live key cardinality, not
    stream length (streaming/stateful.py module docstring)."""
    from iotgp_func_raw_data_ingest_spark.streaming.stateful import streaming_dedup

    work = tempfile.mkdtemp(prefix="q178_")
    try:
        with _few_shuffle_partitions(spark):
            events = _split_events(spark, sf_dir, f"{work}/in", n_files=4)
            stream = (
                spark.readStream.schema(events.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{work}/in")
            )
            # ttl_ms=None: bounded availableNow replay — an armed
            # processing-time timer would keep the query alive forever
            # (see streaming_dedup's docstring)
            deduped = streaming_dedup(
                stream.select(F.col("event_type").alias("key")), "key", ttl_ms=None
            )
            q = (
                deduped.writeStream.format("parquet")
                .option("path", f"{work}/out")
                .option("checkpointLocation", f"{work}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            out = spark.read.parquet(f"{work}/out").select("key")
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q179_streaming_ingest",
    oracle="""
    SELECT 'assorted'              AS folder,
           'docs'                  AS source_db,
           lang                    AS "table",
           CAST(doc_id AS VARCHAR) AS id,
           lang                    AS doc_lang,
           CAST(n_chars AS VARCHAR) AS chars
    FROM documents WHERE doc_id <= 100
    """,
)
def q179_streaming_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's PRIMARY path — per-trigger envelope ingest into the
    typed lake (E3, src/function_app.py:302-310) — run as a REAL stream
    and hash-gated: q28's synthesized envelope bodies are served as a
    4-file text stream through ``streaming.pipeline.start_ingest_stream``
    (foreachBatch → decode → route → write_lake_typed append, committed-
    batch ledger), the drained stream is restarted once on the same
    checkpoint (no batch may re-append), and the typed lake is read back.
    The lake roundtrip is part of the assertion: routed rows must survive
    the per-route key-union projection and parquet append with the exact
    values q28's oracle states. Batch boundaries can't matter because
    routing and the stringly projection are row-local — so the streamed
    answer must hash-equal the batch oracle, and a replayed batch
    (duplicate rows) or dropped batch flips the gate.

    100 TB shape: identical to the batch ingest plan per micro-batch
    (narrow decode, one route shuffle at the write); the ledger adds one
    tiny FS check per batch. See start_ingest_stream's docstring."""
    from iotgp_func_raw_data_ingest_spark.sources.envelopes import (
        envelopes_stream_from_text,
    )
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_ingest_stream,
    )

    t = prep(spark, sf_dir)
    bodies = t["documents"].filter(F.col("doc_id") <= 100).select(
        F.to_json(
            F.struct(
                F.concat(F.lit("Docs."), F.col("lang")).alias("Source"),
                F.base64(
                    F.to_json(
                        F.struct(
                            F.col("doc_id").alias("id"),
                            F.col("lang").alias("doc_lang"),
                            F.col("n_chars").alias("chars"),
                        )
                    ).cast("binary")
                ).alias("Data"),
                F.lit("Raw").alias("MessageType"),
            )
        ).alias("body")
    )
    work = tempfile.mkdtemp(prefix="q179_")
    try:
        with _few_shuffle_partitions(spark):
            bodies.repartition(4).write.mode("overwrite").text(f"{work}/in")
            cfg = EngineConfig(output_path=f"{work}/lake")
            for _restart in range(2):  # 2nd: restart on a drained checkpoint
                stream = envelopes_stream_from_text(spark, f"{work}/in").selectExpr(
                    "body"
                )
                q = start_ingest_stream(stream, cfg, f"{work}/ckpt")
                q.awaitTermination()
            back = (
                spark.read.option("mergeSchema", "true")
                .parquet(f"{work}/lake/assorted/docs/*")
            )
            out = back.select(
                F.lit("assorted").alias("folder"),
                F.lit("docs").alias("source_db"),
                F.col("doc_lang").alias("table"),
                "id",
                "doc_lang",
                "chars",
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q180_distinct_rollup_accuracy",
    oracle="""
    SELECT date_trunc('day', ts) AS bucket_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS count_v,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_5pct
    FROM events
    GROUP BY 1, 2
    """,
)
def q180_distinct_rollup_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL approx-distinct rollup under the gate, via the error-bound
    boolean pattern (how the other sketches in this registry hash-match):
    events are split into 3 deterministic increments (event_id % 3), each
    refreshed into a persisted daily (event_type) rollup carrying
    DataSketches HLL binaries (sources/maintenance.py approx_distinct),
    and the read-time estimate is compared against the exact
    COUNT(DISTINCT user_id). The gated claim is three columns with three
    distinct failure detectors: the rollup's own ``count_v`` vs the
    oracle's COUNT(*) (a replayed or double-merged increment DOUBLES a
    bucket's count — the HLL union alone can't see that, since register-
    max union is idempotent), the per-bucket exact count, and
    ``within_5pct``, which a dropped increment or mis-union flips. lgK=12
    HLL stays in sparse (effectively exact) mode at these cardinalities,
    so the 5% band (floored at 1) is robustly deterministic, and the
    bound itself is the documented estimator error at ANY cardinality.

    100 TB shape: this is the "distinct users per bucket, refreshed
    incrementally forever" workload — per batch, one groupBy over new
    rows producing fixed-width sketches, an upsert whose carried side is
    buckets × dims, and NO rescan of history; the sketch union replaces
    the unbounded distinct-set state an exact incremental count would
    need."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import read_lake_table
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        incremental_rollup,
        rollup_distinct_estimate,
    )

    t = prep(spark, sf_dir)
    events = t["events"]
    work = tempfile.mkdtemp(prefix="q180_")
    try:
        with _few_shuffle_partitions(spark):
            cfg = EngineConfig(output_path=f"{work}/lake")
            for part in range(3):
                incremental_rollup(
                    spark, f"{work}/lake", "rollups", "events", "daily_users",
                    events.filter(F.col("event_id") % 3 == part),
                    "ts", "day", ["event_type"], "user_id", cfg,
                    aggs=("count", "approx_distinct"), batch_id=part,
                )
            rolled = rollup_distinct_estimate(
                read_lake_table(spark, f"{work}/lake", "rollups", "events", "daily_users")
            ).select(
                "bucket_start",
                "event_type",
                F.col("count_v").cast("long").alias("count_v"),
                F.col("approx_distinct_v").alias("est"),
            )
            exact = events.groupBy(
                F.date_trunc("day", F.col("ts")).alias("bucket_start"),
                "event_type",
            ).agg(F.countDistinct("user_id").alias("n_exact"))
            out = exact.join(rolled, ["bucket_start", "event_type"]).select(
                "bucket_start",
                "event_type",
                "count_v",
                F.col("n_exact").cast("long").alias("n_exact"),
                (
                    F.abs(F.col("est") - F.col("n_exact"))
                    <= F.greatest(F.lit(1.0), F.col("n_exact") * 0.05)
                ).alias("within_5pct"),
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
