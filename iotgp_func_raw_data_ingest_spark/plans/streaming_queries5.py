"""Round-7 streaming tranche: the last exported stateful operator gets
a driver CORRECTNESS row.

- q219: per-key running counters (``streaming.stateful.running_counters``,
  applyInPandasWithState in UPDATE mode) — the one public streaming
  operator that had only pytest coverage through round 6 (VERDICT r6
  task 3). The gate trick is the q178 batching-invariance argument
  specialized to update mode: each micro-batch re-emits a key's
  cumulative total, so the LAST emission per key must equal the batch
  COUNT(*) — a state row lost between batches truncates the total to
  the tail batches' count, a replayed batch inflates it, and a key
  emitted from stale state after the checkpoint restart changes the
  per-key maximum batch id's row. Per-batch emission counts are NOT
  gated (they depend on how files split, like q178's first_seen_count).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans.registry import register
from iotgp_func_raw_data_ingest_spark.plans.streaming_queries import (
    _few_shuffle_partitions,
    _split_events,
)


@register(
    "q219_running_counters",
    oracle="""
    SELECT event_type AS key,
           CAST(COUNT(*) AS BIGINT) AS total
    FROM events GROUP BY event_type
    """,
)
def q219_running_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful running counters under the hash gate: the events table is
    re-served as a 4-file stream keyed by event_type through
    ``running_counters`` (applyInPandasWithState, update output mode,
    NoTimeout state); every micro-batch containing a key re-emits that
    key's cumulative (total, batches). A foreachBatch sink appends each
    batch's emissions tagged with the batch id, the drained stream is
    restarted once on the same checkpoint (state must survive; nothing
    may re-emit), and the newest emission per key — monotone totals make
    "newest" the per-key max batch id — is gated against the oracle's
    one-shot GROUP BY count.

    100 TB shape: state is one (total, batches) pair per live key —
    memory tracks key cardinality, not stream length; per-batch work is
    one state-store shuffle of THAT batch's keys. The same pattern as
    q178 with the update-mode emission contract exercised instead of
    append-mode first-arrival.

    Reference: the reference has no user-managed streaming state
    (SURVEY.md §2.6); this is engine-added capability."""
    from iotgp_func_raw_data_ingest_spark.streaming.stateful import (
        running_counters,
    )

    work = tempfile.mkdtemp(prefix="q219_")
    try:
        with _few_shuffle_partitions(spark):
            events = _split_events(spark, sf_dir, f"{work}/in", n_files=4)

            def _sink(batch_df: DataFrame, batch_id: int) -> None:
                batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                    "append"
                ).parquet(f"{work}/out")

            for _restart in range(2):  # 2nd run: drained-checkpoint restart
                stream = (
                    spark.readStream.schema(events.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{work}/in")
                )
                counters = running_counters(
                    stream.select(F.col("event_type").alias("key")), "key"
                )
                q = (
                    counters.writeStream.foreachBatch(_sink)
                    .outputMode("update")
                    .option("checkpointLocation", f"{work}/ckpt")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
            emitted = spark.read.parquet(f"{work}/out")
            w = Window.partitionBy("key").orderBy(F.col("batch_id").desc())
            out = (
                emitted.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("key", F.col("total").cast("long").alias("total"))
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
