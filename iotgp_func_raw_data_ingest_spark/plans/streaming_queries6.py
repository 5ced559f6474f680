"""Round-9 streaming tranche: the tombstone-aware CDC apply
(``streaming.pipeline.start_cdc_merge_stream`` — the one streaming
entry point added this round) gets a driver CORRECTNESS row.

q230 is hash-gateable because the change feed is a pure function of the
``customer`` table and the apply is ORDER-INDEPENDENT by construction:
every change for a given key lands in the same micro-batch (tranche =
key mod 3), so the final state is "latest change per key by seq"
regardless of which batch arrives first — which is exactly what the
DuckDB oracle reconstructs declaratively.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register
from iotgp_func_raw_data_ingest_spark.plans.streaming_queries import (
    _few_shuffle_partitions,
)
from iotgp_func_raw_data_ingest_spark.plans.streaming_queries2 import (
    _write_ordered_tranches,
)


@register(
    "q230_cdc_apply_stream",
    oracle="""
    WITH base AS (
        SELECT CAST(c_custkey AS BIGINT) AS k,
               c_mktsegment AS seg,
               ROUND(c_acctbal, 2) AS bal
        FROM customer
    ),
    off AS (SELECT MAX(k) + 1 AS o FROM base),
    changes AS (
        SELECT k, 'U-' || seg AS seg, ROUND(bal + 7.25, 2) AS bal,
               'u' AS op, k * 10 + 1 AS seq
        FROM base WHERE k % 5 = 1
        UNION ALL
        SELECT k, NULL, NULL, 'd', k * 10 + 2 FROM base WHERE k % 17 = 2
        UNION ALL
        SELECT k + o, 'INS', 33.0, 'c', (k + o) * 10 + 3
        FROM base, off WHERE k % 13 = 4
        UNION ALL
        SELECT k + o, NULL, NULL, 'd', (k + o) * 10 + 5
        FROM base, off WHERE k % 19 = 6
    ),
    latest AS (
        SELECT k, seg, bal, op FROM (
            SELECT c.*, ROW_NUMBER() OVER (
                PARTITION BY k ORDER BY seq DESC
            ) AS rn
            FROM changes c
        ) WHERE rn = 1
    ),
    final AS (
        SELECT b.k, b.seg, b.bal
        FROM base b LEFT JOIN latest l ON b.k = l.k
        WHERE l.k IS NULL                      -- untouched rows carried
        UNION ALL
        SELECT l.k, l.seg, l.bal
        FROM latest l WHERE l.op <> 'd'        -- upserted (matched or new)
        -- latest op = 'd': matched key deleted, absent key no-op
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(bal), 2) AS sum_bal
    FROM final GROUP BY seg
    """,
)
def q230_cdc_apply_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone-aware CDC apply stream
    (``streaming.pipeline.start_cdc_merge_stream``) under the hash gate:
    the customer dimension is seeded as a range-clustered lake route,
    then a Debezium-shaped change feed — updates (k % 5 = 1, new values
    'U-'||seg / bal+7.25), deletes (k % 17 = 2), inserts (re-keyed past
    max(k), k % 13 = 4), and delete TOMBSTONES FOR ABSENT keys
    (k % 19 = 6, must no-op) — is replayed as three pinned-order
    micro-batches (maxFilesPerTrigger=1) and applied per batch through
    the file-pruned three-clause merge.

    What the hash pins: intra-batch collapse to the latest change per
    key by seq (a key with k%5=1 AND k%17=2 carries both an update and
    a later delete in ONE batch — the delete must win; a re-keyed
    insert with k%13=4 AND k%19=6 is inserted then tombstoned in one
    batch — it must never appear), matched deletes, upsert semantics
    for non-delete ops, the conditional-insert no-op for absent-key
    tombstones, and the committed-batch ledger (the drained stream is
    restarted against its checkpoint — a re-applied batch would double
    the updates' +7.25 or resurrect deleted rows).

    Order-independence: tranche = key mod 3, so every change for a key
    shares a micro-batch and the oracle's declarative latest-per-key
    reconstruction is exact whatever the batch order.

    Eager streaming lifecycle per the plans/__init__ convention; result
    pinned with localCheckpoint before the temp dirs are removed.

    100 TB shape: per batch, the pruned merge's PLAN/STAGE/COMMIT makes
    the apply cost ∝ touched files, not route size; the intra-batch
    collapse is one window function over the (small) CDC batch. This is
    the continuous form of q229's one-shot pruned merge.

    Reference parity: engine-added (SURVEY §2.6); the reference's only
    write is append-style (src/function_app.py:239-264)."""
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_cdc_merge_stream,
    )

    t = prep(spark, sf_dir)
    cust = t["customer"].select(
        F.col("c_custkey").cast("bigint").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    work = tempfile.mkdtemp(prefix="q230_")
    try:
        with _few_shuffle_partitions(spark):
            lake = f"{work}/lake"
            cfg = EngineConfig(output_path=lake)
            route = f"{lake}/curated/crm/customers"
            cust.repartitionByRange(8, "k").write.parquet(route)

            # bounded single-row agg (the typed.py collect contract):
            # the re-key offset, mirrored by the oracle's scalar subquery
            off = cust.agg((F.max("k") + 1).alias("o")).first()["o"]
            k = F.col("k")
            null_s = F.lit(None).cast("string")
            null_d = F.lit(None).cast("double")
            changes = (
                cust.filter(k % 5 == 1).select(
                    k,
                    F.concat(F.lit("U-"), "seg").alias("seg"),
                    F.round(F.col("bal") + 7.25, 2).alias("bal"),
                    F.lit("u").alias("op"),
                    (k * 10 + 1).alias("seq"),
                )
                .unionByName(
                    cust.filter(k % 17 == 2).select(
                        k, null_s.alias("seg"), null_d.alias("bal"),
                        F.lit("d").alias("op"), (k * 10 + 2).alias("seq"),
                    )
                )
                .unionByName(
                    cust.filter(k % 13 == 4).select(
                        (k + off).alias("k"),
                        F.lit("INS").alias("seg"),
                        F.lit(33.0).alias("bal"),
                        F.lit("c").alias("op"),
                        ((k + off) * 10 + 3).alias("seq"),
                    )
                )
                .unionByName(
                    cust.filter(k % 19 == 6).select(
                        (k + off).alias("k"), null_s.alias("seg"),
                        null_d.alias("bal"), F.lit("d").alias("op"),
                        ((k + off) * 10 + 5).alias("seq"),
                    )
                )
            )
            _write_ordered_tranches(
                [changes.filter(k % 3 == i) for i in range(3)],
                f"{work}/in",
            )
            for _restart in range(2):  # 2nd: restart on a drained checkpoint
                stream = (
                    spark.readStream.schema(changes.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{work}/in")
                )
                q = start_cdc_merge_stream(
                    stream, lake, "curated", "crm", "customers",
                    ["k"], "seq", cfg, f"{work}/ckpt",
                )
                q.awaitTermination()
            out = (
                spark.read.parquet(route)
                .groupBy("seg")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.round(F.sum("bal"), 2).alias("sum_bal"),
                )
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
