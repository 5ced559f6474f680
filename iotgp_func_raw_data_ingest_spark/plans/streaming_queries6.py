"""Round-9/10 streaming tranche: the tombstone-aware CDC apply
(``streaming.pipeline.start_cdc_merge_stream``) under the driver
CORRECTNESS gate.

q230 is hash-gateable because the change feed is a pure function of the
``customer`` table and the apply is ORDER-INDEPENDENT by construction:
every change for a given key lands in the same micro-batch (tranche =
key mod 3), so the final state is "latest change per key by seq"
regardless of which batch arrives first — which is exactly what the
DuckDB oracle reconstructs declaratively.

q231 (round 10) drops that by-construction crutch: changes for ONE key
are deliberately SPLIT across micro-batches in anti-chronological order
(the newer change arrives in an EARLIER batch), and correctness comes
from ``persist_seq=True`` — the route-persisted ``_seq`` column guards
the matched clauses with ``s._seq > t._seq``, so stale updates and
stale tombstones are carried instead of clobbering newer rows. The
oracle is still the declarative latest-per-key-by-seq reconstruction;
the feed is designed so no key hits the documented physical-delete
resurrection window (a WINNING delete is always in the last batch — see
``start_cdc_merge_stream``'s docstring for why that window exists).

q235 (round 11) removes even THAT design constraint:
``retain_tombstones=True`` keeps winning deletes as soft-delete marker
rows whose ``_seq`` outlives the row, so the feed deliberately REPLAYS
the resurrection case (winning delete early, stale change late) and the
tombstone must reject it; ``expire_tombstones`` then retention-splits
the tombstones at a seq horizon. q236 makes the change feed
streaming-native: ``start_changes_stream`` follows the generation
ledger (offset = generation, checkpointed by Spark's own offset log)
and ``start_ivm_refresh_stream`` makes the IVM view commit-driven.

q237 (round 12) composes the two: the follower and the IVM view ride a
TOMBSTONE-MODE route with ``live_only=True``, so soft deletes arrive as
logical deletes, legitimate resurrections as logical inserts, rejected
stale changes and the expiry span as NOTHING — and the maintained view
stays hash-equal to a from-scratch ``read_cdc_table`` aggregate across
the whole delete -> stale-update -> expiry lifecycle.
"""

from __future__ import annotations

import os
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


@register(
    "q231_cdc_out_of_order",
    oracle="""
    WITH base AS (
        SELECT CAST(c_custkey AS BIGINT) AS k,
               c_mktsegment AS seg,
               ROUND(c_acctbal, 2) AS bal
        FROM customer
    ),
    off AS (SELECT MAX(k) + 1 AS o FROM base),
    changes AS (
        SELECT k, 'N-' || seg AS seg, ROUND(bal + 5.5, 2) AS bal,
               'u' AS op, k * 10 + 8 AS seq
        FROM base WHERE k % 5 = 1
        UNION ALL
        SELECT k, 'O-' || seg, ROUND(bal + 1.25, 2), 'u', k * 10 + 3
        FROM base WHERE k % 5 = 1
        UNION ALL
        SELECT k, 'K-' || seg, ROUND(bal + 2.75, 2), 'u', k * 10 + 7
        FROM base WHERE k % 17 = 2
        UNION ALL
        SELECT k, NULL, NULL, 'd', k * 10 + 4 FROM base WHERE k % 17 = 2
        UNION ALL
        SELECT k, 'T-' || seg, ROUND(bal + 9.0, 2), 'u', k * 10 + 1
        FROM base WHERE k % 13 = 4
        UNION ALL
        SELECT k, NULL, NULL, 'd', k * 10 + 9 FROM base WHERE k % 13 = 4
        UNION ALL
        SELECT k + o, 'INS', 44.0, 'c', (k + o) * 10 + 2
        FROM base, off WHERE k % 11 = 3
        UNION ALL
        SELECT k + o, 'STALE', 1.0, 'u', (k + o) * 10 + 1
        FROM base, off WHERE k % 11 = 3
        UNION ALL
        SELECT k + 2 * o, NULL, NULL, 'd', (k + 2 * o) * 10 + 5
        FROM base, off WHERE k % 19 = 6
    ),
    latest AS (
        SELECT k, seg, bal, op, seq FROM (
            SELECT c.*, ROW_NUMBER() OVER (
                PARTITION BY k ORDER BY seq DESC
            ) AS rn
            FROM changes c
        ) WHERE rn = 1
    ),
    final AS (
        SELECT b.k, b.seg, b.bal, CAST(NULL AS BIGINT) AS sq
        FROM base b LEFT JOIN latest l ON b.k = l.k
        WHERE l.k IS NULL                      -- untouched rows carried
        UNION ALL
        SELECT l.k, l.seg, l.bal, l.seq
        FROM latest l WHERE l.op <> 'd'        -- latest-by-seq survivors
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(bal), 2) AS sum_bal,
           CAST(SUM(sq) AS BIGINT) AS sum_seq
    FROM final GROUP BY seg
    """,
)
def q231_cdc_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order CDC apply under ``persist_seq=True``
    (``streaming.pipeline.start_cdc_merge_stream``): the change feed
    splits each key's changes ACROSS micro-batches with the NEWER change
    arriving in an EARLIER batch, so a seq-blind apply (q230's contract)
    would end wrong — the persisted ``_seq`` guard must reject every
    stale change for the final state to equal the declarative
    latest-per-key-by-seq oracle.

    Feed design (per base key k; re-key offset o = max(k)+1):

    - k%5=1  — newer update seq k*10+8 in batch 0, STALE update seq
      k*10+3 in batch 2 (must be carried: stale-update rejection);
    - k%17=2 — newer update seq k*10+7 in batch 0, STALE tombstone seq
      k*10+4 in batch 1 (must be carried: stale-tombstone rejection);
    - k%13=4 — update seq k*10+1 in batch 0, WINNING delete seq k*10+9
      in batch 2 (in-order delete still lands; winning deletes are
      always in the LAST batch so the feed never crosses the documented
      physical-delete resurrection window);
    - k%11=3 — re-keyed INSERT seq (k+o)*10+2 in batch 0, STALE update
      seq (k+o)*10+1 in batch 1 (insert records its seq; the guard then
      rejects the stale update against the INSERTED row);
    - k%19=6 — tombstone for the ABSENT key k+2o (no-ops via the
      conditional insert clause, as in q230).

    Overlapping classes compose to latest-by-seq because every class
    uses a distinct seq suffix (no duplicate (key, seq) pairs — the
    content-hash tiebreaker never engages, keeping the oracle exact).

    What the hash pins beyond q230: the schema-evolved ``_seq`` column
    itself (``sum_seq`` aggregates it — a guard that silently failed
    OPEN would apply the stale seq and shift the sum; one that failed
    CLOSED would miss the late id-class updates), stale-update and
    stale-tombstone carries, and insert-seq recording. The drained
    stream is restarted against its checkpoint (ledger idempotence),
    as in q230.

    100 TB shape: identical to q230 — per batch, the pruned merge's
    PLAN/STAGE/COMMIT keeps cost ∝ touched files; the guard adds one
    comparison per matched row inside the existing merge projection
    (no new shuffle, no second pass); ``_seq`` adds 8 bytes/row of
    route storage, the price of out-of-order safety.

    Reference parity: engine-added (SURVEY §2.6); the reference has no
    ordering semantics at all (at-least-once per-event,
    src/function_app.py:302-310)."""
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_cdc_merge_stream,
    )

    t = prep(spark, sf_dir)
    cust = t["customer"].select(
        F.col("c_custkey").cast("bigint").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    work = tempfile.mkdtemp(prefix="q231_")
    try:
        with _few_shuffle_partitions(spark):
            lake = f"{work}/lake"
            cfg = EngineConfig(output_path=lake)
            route = f"{lake}/curated/crm/customers"
            cust.repartitionByRange(8, "k").write.parquet(route)

            off = cust.agg((F.max("k") + 1).alias("o")).first()["o"]
            k = F.col("k")
            null_s = F.lit(None).cast("string")
            null_d = F.lit(None).cast("double")

            def _chg(filt, key, seg, bal, op, seq, batch):
                return cust.filter(filt).select(
                    key.alias("k"), seg.alias("seg"), bal.alias("bal"),
                    F.lit(op).alias("op"), seq.alias("seq"),
                    F.lit(batch).alias("b"),
                )

            changes = (
                # newer-in-earlier-batch pairs (the out-of-order core)
                _chg(k % 5 == 1, k, F.concat(F.lit("N-"), "seg"),
                     F.round(F.col("bal") + 5.5, 2), "u", k * 10 + 8, 0)
                .unionByName(_chg(k % 5 == 1, k, F.concat(F.lit("O-"), "seg"),
                                  F.round(F.col("bal") + 1.25, 2), "u",
                                  k * 10 + 3, 2))
                .unionByName(_chg(k % 17 == 2, k, F.concat(F.lit("K-"), "seg"),
                                  F.round(F.col("bal") + 2.75, 2), "u",
                                  k * 10 + 7, 0))
                .unionByName(_chg(k % 17 == 2, k, null_s, null_d, "d",
                                  k * 10 + 4, 1))
                .unionByName(_chg(k % 13 == 4, k, F.concat(F.lit("T-"), "seg"),
                                  F.round(F.col("bal") + 9.0, 2), "u",
                                  k * 10 + 1, 0))
                .unionByName(_chg(k % 13 == 4, k, null_s, null_d, "d",
                                  k * 10 + 9, 2))
                .unionByName(_chg(k % 11 == 3, k + off, F.lit("INS"),
                                  F.lit(44.0), "c", (k + off) * 10 + 2, 0))
                .unionByName(_chg(k % 11 == 3, k + off, F.lit("STALE"),
                                  F.lit(1.0), "u", (k + off) * 10 + 1, 1))
                .unionByName(_chg(k % 19 == 6, k + 2 * off, null_s, null_d,
                                  "d", (k + 2 * off) * 10 + 5, 1))
            )
            _write_ordered_tranches(
                [changes.filter(F.col("b") == i).drop("b") for i in range(3)],
                f"{work}/in",
            )
            feed_schema = changes.drop("b").schema
            for _restart in range(2):  # 2nd: restart on a drained checkpoint
                stream = (
                    spark.readStream.schema(feed_schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{work}/in")
                )
                q = start_cdc_merge_stream(
                    stream, lake, "curated", "crm", "customers",
                    ["k"], "seq", cfg, f"{work}/ckpt", persist_seq=True,
                )
                q.awaitTermination()
            out = (
                spark.read.option("mergeSchema", "true").parquet(route)
                .groupBy("seg")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.round(F.sum("bal"), 2).alias("sum_bal"),
                    F.sum("_seq").cast("bigint").alias("sum_seq"),
                )
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q235_cdc_tombstone_retention",
    oracle="""
    WITH base AS (
        SELECT CAST(c_custkey AS BIGINT) AS k,
               c_mktsegment AS seg,
               ROUND(c_acctbal, 2) AS bal
        FROM customer
    ),
    off AS (SELECT MAX(k) + 1 AS o FROM base),
    changes AS (
        SELECT k, NULL AS seg, NULL AS bal, 'd' AS op, k * 10 + 8 AS seq
        FROM base WHERE k % 5 = 1
        UNION ALL
        SELECT k, 'Z-' || seg, ROUND(bal + 1.5, 2), 'u', k * 10 + 3
        FROM base WHERE k % 5 = 1
        UNION ALL
        SELECT k, NULL, NULL, 'd', k * 10 + 1 FROM base WHERE k % 13 = 4
        UNION ALL
        SELECT k, 'T-' || seg, ROUND(bal + 9.0, 2), 'u', k * 10 + 9
        FROM base WHERE k % 13 = 4
        UNION ALL
        SELECT k + o, 'INS', 44.0, 'c', (k + o) * 10 + 2
        FROM base, off WHERE k % 11 = 3
        UNION ALL
        SELECT k + o, 'STALE', 1.0, 'u', (k + o) * 10 + 1
        FROM base, off WHERE k % 11 = 3
        UNION ALL
        SELECT k + 2 * o, NULL, NULL, 'd', (k + 2 * o) * 10 + 5
        FROM base, off WHERE k % 19 = 6
        UNION ALL
        SELECT k + 2 * o, 'LATE', 7.0, 'c', (k + 2 * o) * 10 + 2
        FROM base, off WHERE k % 19 = 6
        UNION ALL
        SELECT k, 'K-' || seg, ROUND(bal + 2.75, 2), 'u', k * 10 + 7
        FROM base WHERE k % 17 = 2
    ),
    latest AS (
        SELECT k, seg, bal, op, seq FROM (
            SELECT c.*, ROW_NUMBER() OVER (
                PARTITION BY k ORDER BY seq DESC
            ) AS rn
            FROM changes c
        ) WHERE rn = 1
    ),
    rows_out AS (
        SELECT b.seg, b.bal, CAST(NULL AS BIGINT) AS sq
        FROM base b LEFT JOIN latest l ON b.k = l.k
        WHERE l.k IS NULL                      -- untouched rows carried
        UNION ALL
        SELECT l.seg, l.bal, l.seq
        FROM latest l WHERE l.op <> 'd'        -- latest-by-seq survivors
        UNION ALL
        SELECT '__tombstones__', CAST(NULL AS DOUBLE), l.seq
        FROM latest l, off
        WHERE l.op = 'd' AND l.seq > o * 10    -- unexpired tombstones
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(bal), 2) AS sum_bal,
           CAST(SUM(sq) AS BIGINT) AS sum_seq
    FROM rows_out GROUP BY seg
    """,
)
def q235_cdc_tombstone_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-delete tombstone retention
    (``start_cdc_merge_stream(retain_tombstones=True)`` +
    ``lake.read_cdc_table`` + ``maintenance.expire_tombstones``): the
    feed REPLAYS the exact case q231 must design around — a WINNING
    delete in an EARLY batch followed by a STALE change for the same key
    in a LATER batch — and the retained tombstone's ``_seq`` must reject
    it, because there is no physical-delete resurrection window left.

    Feed design (per base key k; re-key offset o = max(k)+1):

    - k%5=1  — winning DELETE seq k*10+8 in batch 0, STALE update seq
      k*10+3 in batch 2: must stay deleted (THE resurrection case);
    - k%13=4 — DELETE seq k*10+1 in batch 0, NEWER update seq k*10+9 in
      batch 2: must legitimately resurrect (``_deleted`` flips back);
    - k%11=3 — re-keyed INSERT seq (k+o)*10+2 in batch 0, stale update
      seq (k+o)*10+1 in batch 1: guard holds on live rows too;
    - k%19=6 — TOMBSTONE for the ABSENT key k+2o, seq (k+2o)*10+5, in
      batch 0; its late INSERT seq (k+2o)*10+2 in batch 1: the
      tombstone-before-insert case — the insert must stay out (the
      physical mode's conditional-insert would have landed it);
    - k%17=2 — plain update seq k*10+7 (control class).

    After the stream (drained, then RESTARTED against its checkpoint —
    ledger idempotence), ``expire_tombstones(horizon_seq = o*10)``
    hard-deletes every base-keyed tombstone (seqs < o*10) and must keep
    the re-keyed k+2o tombstones (seqs > o*10) and every live row. The
    result groups live rows by segment (count / sum bal / sum of the
    persisted ``_seq``) plus one '__tombstones__' census row over the
    surviving tombstones — so the hash pins the rejected resurrection,
    the legitimate resurrection, the retained-vs-expired split at the
    horizon, and that tombstone rows are key+markers only (their bal is
    NULL: a non-NULL would shift a sum).

    100 TB shape: per batch identical to q231 (pruned merge, guard is
    one comparison in the existing projection); tombstones add one
    boolean column and keep route size ∝ live+unexpired keys; expiry is
    the keyed delete's staged-replace physics — cost ∝ tombstone-bearing
    files. ``read_cdc_table``'s marker filter is a parquet-stat-prunable
    boolean predicate.

    Reference parity: engine-added (SURVEY §2.6); the reference has no
    delete story at all (append-only, src/function_app.py:389-414)."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import read_cdc_table
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        expire_tombstones,
    )
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_cdc_merge_stream,
    )

    t = prep(spark, sf_dir)
    cust = t["customer"].select(
        F.col("c_custkey").cast("bigint").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    work = tempfile.mkdtemp(prefix="q235_")
    try:
        with _few_shuffle_partitions(spark):
            lake = f"{work}/lake"
            cfg = EngineConfig(output_path=lake)
            route = f"{lake}/curated/crm/customers"
            cust.repartitionByRange(8, "k").write.parquet(route)

            off = cust.agg((F.max("k") + 1).alias("o")).first()["o"]
            k = F.col("k")
            null_s = F.lit(None).cast("string")
            null_d = F.lit(None).cast("double")

            def _chg(filt, key, seg, bal, op, seq, batch):
                return cust.filter(filt).select(
                    key.alias("k"), seg.alias("seg"), bal.alias("bal"),
                    F.lit(op).alias("op"), seq.alias("seq"),
                    F.lit(batch).alias("b"),
                )

            changes = (
                _chg(k % 5 == 1, k, null_s, null_d, "d", k * 10 + 8, 0)
                .unionByName(_chg(k % 5 == 1, k, F.concat(F.lit("Z-"), "seg"),
                                  F.round(F.col("bal") + 1.5, 2), "u",
                                  k * 10 + 3, 2))
                .unionByName(_chg(k % 13 == 4, k, null_s, null_d, "d",
                                  k * 10 + 1, 0))
                .unionByName(_chg(k % 13 == 4, k, F.concat(F.lit("T-"), "seg"),
                                  F.round(F.col("bal") + 9.0, 2), "u",
                                  k * 10 + 9, 2))
                .unionByName(_chg(k % 11 == 3, k + off, F.lit("INS"),
                                  F.lit(44.0), "c", (k + off) * 10 + 2, 0))
                .unionByName(_chg(k % 11 == 3, k + off, F.lit("STALE"),
                                  F.lit(1.0), "u", (k + off) * 10 + 1, 1))
                .unionByName(_chg(k % 19 == 6, k + 2 * off, null_s, null_d,
                                  "d", (k + 2 * off) * 10 + 5, 0))
                .unionByName(_chg(k % 19 == 6, k + 2 * off, F.lit("LATE"),
                                  F.lit(7.0), "c", (k + 2 * off) * 10 + 2, 1))
                .unionByName(_chg(k % 17 == 2, k, F.concat(F.lit("K-"), "seg"),
                                  F.round(F.col("bal") + 2.75, 2), "u",
                                  k * 10 + 7, 1))
            )
            _write_ordered_tranches(
                [changes.filter(F.col("b") == i).drop("b") for i in range(3)],
                f"{work}/in",
            )
            feed_schema = changes.drop("b").schema
            for _restart in range(2):  # 2nd: restart on a drained checkpoint
                stream = (
                    spark.readStream.schema(feed_schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{work}/in")
                )
                q = start_cdc_merge_stream(
                    stream, lake, "curated", "crm", "customers",
                    ["k"], "seq", cfg, f"{work}/ckpt",
                    persist_seq=True, retain_tombstones=True,
                )
                q.awaitTermination()

            report = expire_tombstones(spark, route, horizon_seq=off * 10)
            if report["tombstones_removed"] <= 0:
                raise AssertionError(
                    "q235: expiry removed no tombstones — the horizon "
                    "split is untested"
                )
            raw = spark.read.option("mergeSchema", "true").parquet(route)
            dead = F.coalesce(F.col("_deleted"), F.lit(False))
            # one census job for tombstone count + total (the separate
            # filter().count() and raw.count() were two passes over the
            # same route for two numbers); the live count stays its own
            # read — it is read_cdc_table's filter being verified
            census = raw.agg(
                F.sum(F.when(dead, 1).otherwise(0)).alias("n_tomb"),
                F.count(F.lit(1)).alias("n_all"),
            ).first()
            n_tomb = int(census["n_tomb"] or 0)
            if n_tomb <= 0:
                raise AssertionError(
                    "q235: no tombstones survived expiry — retention of "
                    "above-horizon tombstones is untested"
                )
            n_live = read_cdc_table(
                spark, lake, "curated", "crm", "customers"
            ).count()
            if n_live + n_tomb != census["n_all"]:
                raise AssertionError(
                    "q235: read_cdc_table's live view and the tombstone "
                    "census do not partition the route"
                )
            out = (
                raw.withColumn(
                    "g", F.when(dead, F.lit("__tombstones__"))
                    .otherwise(F.col("seg"))
                )
                .groupBy(F.col("g").alias("seg"))
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.round(F.sum("bal"), 2).alias("sum_bal"),
                    F.sum("_seq").cast("bigint").alias("sum_seq"),
                )
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q236_changes_stream_follow",
    oracle="""
    WITH base AS (
      SELECT c_custkey AS k, ROUND(c_acctbal, 2) AS bal FROM customer
    ),
    upd AS (SELECT k, bal FROM base WHERE k % 50 = 0 AND k % 97 <> 0),
    del AS (SELECT k, bal FROM base WHERE k % 97 = 0),
    ins AS (SELECT -(k + 1) AS k, ROUND(bal + 7.5, 2) AS bal
            FROM base WHERE k % 61 = 0),
    merged AS (
      SELECT k,
             CASE WHEN k % 50 = 0 THEN ROUND(bal + 1000, 2) ELSE bal END
             AS bal
      FROM base WHERE k % 97 <> 0
      UNION ALL
      SELECT k, bal FROM ins
    ),
    span2_del AS (SELECT k, bal FROM merged WHERE k % 3 = 0)
    SELECT CAST(1 AS BIGINT) AS from_gen, CAST(2 AS BIGINT) AS to_gen,
           'update_preimage' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           ROUND(SUM(bal), 2) AS sum_bal
    FROM upd
    UNION ALL
    SELECT CAST(1 AS BIGINT), CAST(2 AS BIGINT), 'update_postimage',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT),
           ROUND(SUM(ROUND(bal + 1000, 2)), 2)
    FROM upd
    UNION ALL
    SELECT CAST(1 AS BIGINT), CAST(2 AS BIGINT), 'delete',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT),
           ROUND(SUM(bal), 2)
    FROM del
    UNION ALL
    SELECT CAST(1 AS BIGINT), CAST(2 AS BIGINT), 'insert',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT),
           ROUND(SUM(bal), 2)
    FROM ins
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(3 AS BIGINT), 'delete',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT),
           ROUND(SUM(bal), 2)
    FROM span2_del
    """,
)
def q236_changes_stream_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous change-feed consumption
    (``streaming.pipeline.start_changes_stream`` over the
    ``generation_ledger_stream`` Python streaming source, offset =
    generation number) with event-driven IVM
    (``start_ivm_refresh_stream``) riding the same ledger:

    1. enable snapshots (gen 1) and DRAIN both streams — the enable
       generation must contribute NO feed rows, and the IVM stream's
       first drain is the view's pinned initial build;
    2. q233's pruned MERGE (updates + deletes + re-keyed inserts,
       gen 2); drain → the sink receives exactly the (1,2] compressed
       feed, and the view refreshes to gen 2;
    3. keyed delete of ``k % 3 = 0`` (gen 3); drain AGAIN on the same
       checkpoint — the RESTART leg: Spark's offset log must resume the
       watermark at 2, so the sink receives ONLY the (2,3] feed (a
       broken watermark either re-emits (1,2] — doubling counts — or
       skips (2,3] entirely; both flip the hash);
    4. a final drain on the quiet ledger must emit nothing and the IVM
       refresh must no-op; the builder asserts the view equals a
       from-scratch recompute of the final route EXACTLY and that its
       applied watermark is generation 3.

    The result is the accumulated sink output grouped per (span,
    change class): count, key-sum, balance-sum.

    100 TB shape: the ledger source's rows are manifest summaries
    (driver-side metadata, one tiny JSON per commit — no listing, no
    data read); each drained batch's real work is the compressed
    change feed — the delta-sized multiset diff over only the files
    the span's manifests disagree on — plus, for the IVM leg, a
    delta+groups-sized refresh. Nothing in the follower's cost scales
    with route size; commit-driven beats cron-driven precisely because
    a quiet ledger costs one metadata poll.

    Reference parity: engine-added (SURVEY §2.6); the reference has no
    versioning and no derived-view story (src/function_app.py:389-414).
    """
    from iotgp_func_raw_data_ingest_spark.sources import ivm
    from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        merge_lake_table_pruned,
    )
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        delete_keys_from_table,
    )
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_changes_and_ivm_stream,
    )

    t = prep(spark, sf_dir)
    cust = t["customer"].select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    work = tempfile.mkdtemp(prefix="q236_")
    try:
        with _few_shuffle_partitions(spark):
            lake = f"{work}/lake"
            cfg = EngineConfig(output_path=lake)
            route = f"{lake}/curated/crm/customers"
            view = f"{work}/view"
            outdir = f"{work}/out"
            ckpt = f"{work}/ckpt"
            cust.repartitionByRange(8, "k").write.parquet(route)
            assert snap.enable_snapshots(spark, route) == 1

            def sink(feed: DataFrame, frm: int, to: int) -> None:
                feed.withColumn(
                    "from_gen", F.lit(frm).cast("bigint")
                ).withColumn(
                    "to_gen", F.lit(to).cast("bigint")
                ).write.mode("append").parquet(outdir)

            def drain() -> None:
                # ONE shared ledger lifecycle drives both consumers
                # (feed export + IVM refresh, fanned out in foreachBatch
                # and overlapped there): the availableNow harness's
                # Python-DataSource planner spawn (~2.5 s) is paid once
                # per drain instead of once per consumer, and the ledger
                # is read once. Offset-equals-generation checkpointing
                # is unchanged — the shared stream's offset log is the
                # same watermark each separate stream kept.
                q = start_changes_and_ivm_stream(
                    spark, route, sink, ckpt,
                    view_path=view, group_cols=["seg"], sum_cols=["bal"],
                    key_cols=["k"],
                )
                q.awaitTermination()

            drain()  # gen 1: no feed; IVM initial build
            if ivm.read_view_meta(spark, view)["applied_generation"] != 1:
                raise AssertionError("q236: initial IVM build missed gen 1")

            updates = cust.filter(
                (F.col("k") % 50 == 0) & (F.col("k") % 97 != 0)
            ).withColumn("op", F.lit("u"))
            deletes = cust.filter(F.col("k") % 97 == 0).withColumn(
                "op", F.lit("d")
            )
            inserts = cust.filter(F.col("k") % 61 == 0).select(
                (-(F.col("k") + 1)).alias("k"),
                F.col("seg"),
                F.round(F.col("bal") + 7.5, 2).alias("bal"),
                F.lit("i").alias("op"),
            )
            merge_lake_table_pruned(
                spark, lake, "curated", "crm", "customers",
                updates.unionByName(deletes).unionByName(inserts),
                ["k"], cfg,
                matched_update={"bal": "ROUND(t.bal + 1000, 2)"},
                matched_update_condition="s.op = 'u'",
                matched_delete_condition="s.op = 'd'",
            )
            drain()  # gen 2: (1,2] feed; IVM -> 2

            doomed = (
                spark.read.parquet(route)
                .filter(F.col("k") % 3 == 0)
                .select("k")
            )
            delete_keys_from_table(spark, route, "k", doomed)
            drain()  # gen 3 RESTART leg: only (2,3]; IVM -> 3
            drain()  # quiet ledger: nothing emitted, IVM noop

            meta = ivm.read_view_meta(spark, view)
            if meta["applied_generation"] != 3:
                raise AssertionError(
                    f"q236: IVM watermark is {meta['applied_generation']}, "
                    "not 3 — the event-driven refresh missed a commit"
                )
            recomputed = (
                snap.read_route_snapshot(spark, route)
                .groupBy("seg")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                    F.round(F.sum("bal"), 2).alias("sum_bal"),
                )
            )
            maintained = ivm.read_view(spark, view).select(
                "seg", "n_rows", F.round("sum_bal", 2).alias("sum_bal")
            )
            # one action for the symmetric multiset diff: the two
            # directional head(1)s each re-ran the route recompute; the
            # union is non-empty iff either direction is (same check)
            if (
                maintained.exceptAll(recomputed)
                .unionAll(recomputed.exceptAll(maintained))
                .head(1)
            ):
                raise AssertionError(
                    "q236: event-driven IVM view diverged from recompute"
                )

            out = (
                spark.read.parquet(outdir)
                .groupBy(
                    "from_gen", "to_gen",
                    F.col("_change_type").alias("change_type"),
                )
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.sum("k").cast("bigint").alias("sum_k"),
                    F.round(F.sum("bal"), 2).alias("sum_bal"),
                )
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q237_live_feed_over_tombstones",
    oracle="""
    WITH base AS (
        SELECT CAST(c_custkey AS BIGINT) AS k,
               c_mktsegment AS seg,
               ROUND(c_acctbal, 2) AS bal
        FROM customer
    ),
    off AS (SELECT MAX(k) + 1 AS o FROM base),
    changes AS (
        SELECT k, NULL AS seg, NULL AS bal, 'd' AS op, k * 10 + 8 AS seq,
               0 AS b
        FROM base WHERE k % 5 = 1
        UNION ALL
        SELECT k, NULL, NULL, 'd', k * 10 + 1, 0 FROM base WHERE k % 13 = 4
        UNION ALL
        SELECT k + 2 * o, NULL, NULL, 'd', (k + 2 * o) * 10 + 5, 0
        FROM base, off WHERE k % 19 = 6
        UNION ALL
        SELECT k, 'Z-' || seg, ROUND(bal + 1.5, 2), 'u', k * 10 + 3, 1
        FROM base WHERE k % 5 = 1
        UNION ALL
        SELECT k, 'T-' || seg, ROUND(bal + 9.0, 2), 'u', k * 10 + 9, 1
        FROM base WHERE k % 13 = 4
        UNION ALL
        SELECT k + 2 * o, 'LATE', 7.0, 'c', (k + 2 * o) * 10 + 2, 1
        FROM base, off WHERE k % 19 = 6
        UNION ALL
        SELECT k, 'K-' || seg, ROUND(bal + 2.75, 2), 'u', k * 10 + 7, 1
        FROM base WHERE k % 17 = 2
    ),
    latest1 AS (
        SELECT k, seg, bal, op FROM (
            SELECT c.*, ROW_NUMBER() OVER (
                PARTITION BY k ORDER BY seq DESC
            ) AS rn
            FROM changes c WHERE b <= 0
        ) WHERE rn = 1
    ),
    latest2 AS (
        SELECT k, seg, bal, op FROM (
            SELECT c.*, ROW_NUMBER() OVER (
                PARTITION BY k ORDER BY seq DESC
            ) AS rn
            FROM changes c
        ) WHERE rn = 1
    ),
    live1 AS (
        SELECT b.k, b.seg, b.bal
        FROM base b LEFT JOIN latest1 l ON b.k = l.k
        WHERE l.k IS NULL
        UNION ALL
        SELECT l.k, l.seg, l.bal FROM latest1 l WHERE l.op <> 'd'
    ),
    live2 AS (
        SELECT b.k, b.seg, b.bal
        FROM base b LEFT JOIN latest2 l ON b.k = l.k
        WHERE l.k IS NULL
        UNION ALL
        SELECT l.k, l.seg, l.bal FROM latest2 l WHERE l.op <> 'd'
    ),
    del1 AS (
        SELECT a.k, a.bal FROM base a
        LEFT JOIN live1 s ON a.k = s.k WHERE s.k IS NULL
    ),
    ins2 AS (
        SELECT a.k, a.bal FROM live2 a
        LEFT JOIN live1 s ON a.k = s.k WHERE s.k IS NULL
    ),
    upd2 AS (
        SELECT a.k, a.bal AS pre_bal, c.bal AS post_bal
        FROM live1 a JOIN live2 c ON a.k = c.k
        WHERE a.seg IS DISTINCT FROM c.seg
           OR a.bal IS DISTINCT FROM c.bal
    )
    SELECT CAST(1 AS BIGINT) AS from_gen, CAST(2 AS BIGINT) AS to_gen,
           'delete' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           ROUND(SUM(bal), 2) AS sum_bal
    FROM del1
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(3 AS BIGINT), 'insert',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT),
           ROUND(SUM(bal), 2)
    FROM ins2
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(3 AS BIGINT), 'update_preimage',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT),
           ROUND(SUM(pre_bal), 2)
    FROM upd2
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(3 AS BIGINT), 'update_postimage',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT),
           ROUND(SUM(post_bal), 2)
    FROM upd2
    UNION ALL
    SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'live:' || seg,
           CAST(COUNT(*) AS BIGINT), CAST(NULL AS BIGINT),
           ROUND(SUM(bal), 2)
    FROM live2 GROUP BY seg
    """,
)
def q237_live_feed_over_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live-table change feed + event-driven IVM OVER a tombstone-mode
    CDC route (``live_only=True`` on ``start_changes_stream`` /
    ``start_ivm_refresh_stream`` — the r11 composition gap): the
    follower and the view must see soft deletes as LOGICAL deletes,
    legitimate resurrections as LOGICAL inserts, rejected stale changes
    as NOTHING, and a tombstone-expiry generation as an EMPTY span —
    while the physical route is full of nulled-data tombstone rows that
    would otherwise pile into a NULL group.

    Lifecycle (per base key k; re-key offset o = max(k)+1; one
    generation per CDC batch because the route is snapshot-enabled):

    - gen 2 (CDC batch 0): winning DELETEs for k%5=1 (seq k*10+8) and
      k%13=4 (seq k*10+1); tombstones for the ABSENT keys k+2o
      (k%19=6, seq (k+2o)*10+5). Live feed: deletes of the k%5=1 and
      k%13=4 base rows — the absent-key tombstones contribute NOTHING
      (no live row ever existed);
    - gen 3 (CDC batch 1): STALE update for k%5=1 (seq k*10+3 — the
      tombstone's _seq rejects it: NO feed row), NEWER update for
      k%13=4 (seq k*10+9 — legitimate resurrection: a live INSERT with
      the T- values), LATE insert for k+2o (seq (k+2o)*10+2 — rejected
      by the standing tombstone: nothing), control update for k%17=2
      (live UPDATE pre/post pair, K- values; keys overlapping the
      deleted classes resolve by latest-seq, same as the oracle);
    - gen 4: ``expire_tombstones(horizon = o*10)`` hard-deletes every
      base-keyed tombstone (all seqs < o*10) and keeps the re-keyed
      k+2o ones — the LIVE span must be EMPTY (the builder asserts it;
      a physical follower would have emitted their delete rows).

    After each generation both streams drain on their own checkpoints
    (restart legs by construction); the builder asserts the expiry
    removed tombstones, that above-horizon tombstones survive, that the
    view's watermark reached gen 4, and that the maintained live view
    equals a from-scratch ``read_cdc_table`` aggregate EXACTLY. The
    result is the per-(span, change class) feed census plus the view
    rows themselves (``live:<seg>``), so the hash pins both surfaces.

    100 TB shape: identical physics to q235 (guarded pruned merges,
    file-pruned expiry) + q236 (manifest-summary ledger rows, delta-
    sized feeds); ``live_only`` adds one parquet-pushable boolean
    filter per diff side — no new shuffle, no new pass, and the expiry
    span's cost stays ∝ the rewritten files even though its live feed
    is empty. Builder cost is dominated by the availableNow harness's
    fixed start/stop (2 CDC + 3 SHARED follower+IVM drain lifecycles —
    one ledger stream fanning out to both consumers per drain — around
    three pruned merges and one expiry) — the cost a
    production follower, started once and kept running, never re-pays;
    the per-commit marginal work is the delta-sized feed.

    Reference parity: engine-added (SURVEY §2.6); the reference has no
    delete, versioning, or derived-view story
    (src/function_app.py:389-414)."""
    from iotgp_func_raw_data_ingest_spark.sources import ivm
    from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
    from iotgp_func_raw_data_ingest_spark.sources.lake import read_cdc_table
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        expire_tombstones,
    )
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_cdc_merge_stream,
        start_changes_and_ivm_stream,
    )

    t = prep(spark, sf_dir)
    cust = t["customer"].select(
        F.col("c_custkey").cast("bigint").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    work = tempfile.mkdtemp(prefix="q237_")
    try:
        with _few_shuffle_partitions(spark):
            lake = f"{work}/lake"
            cfg = EngineConfig(output_path=lake)
            route = f"{lake}/curated/crm/customers"
            view = f"{work}/view"
            outdir = f"{work}/out"
            feed_ckpt = f"{work}/feed-ckpt"
            cdc_ckpt = f"{work}/cdc-ckpt"
            cust.repartitionByRange(8, "k").write.parquet(route)
            assert snap.enable_snapshots(spark, route) == 1

            off = cust.agg((F.max("k") + 1).alias("o")).first()["o"]
            k = F.col("k")
            null_s = F.lit(None).cast("string")
            null_d = F.lit(None).cast("double")

            def _chg(filt, key, seg, bal, op, seq, batch):
                return cust.filter(filt).select(
                    key.alias("k"), seg.alias("seg"), bal.alias("bal"),
                    F.lit(op).alias("op"), seq.alias("seq"),
                    F.lit(batch).alias("b"),
                )

            changes = (
                _chg(k % 5 == 1, k, null_s, null_d, "d", k * 10 + 8, 0)
                .unionByName(_chg(k % 13 == 4, k, null_s, null_d, "d",
                                  k * 10 + 1, 0))
                .unionByName(_chg(k % 19 == 6, k + 2 * off, null_s, null_d,
                                  "d", (k + 2 * off) * 10 + 5, 0))
                .unionByName(_chg(k % 5 == 1, k, F.concat(F.lit("Z-"), "seg"),
                                  F.round(F.col("bal") + 1.5, 2), "u",
                                  k * 10 + 3, 1))
                .unionByName(_chg(k % 13 == 4, k, F.concat(F.lit("T-"), "seg"),
                                  F.round(F.col("bal") + 9.0, 2), "u",
                                  k * 10 + 9, 1))
                .unionByName(_chg(k % 19 == 6, k + 2 * off, F.lit("LATE"),
                                  F.lit(7.0), "c", (k + 2 * off) * 10 + 2, 1))
                .unionByName(_chg(k % 17 == 2, k, F.concat(F.lit("K-"), "seg"),
                                  F.round(F.col("bal") + 2.75, 2), "u",
                                  k * 10 + 7, 1))
            )
            # stage both tranches, feed them to the CDC stream ONE AT A
            # TIME (renames preserve the pinned mtimes) so each batch
            # commits its own generation with a follower drain between
            stage = f"{work}/stage"
            indir = f"{work}/in"
            _write_ordered_tranches(
                [changes.filter(F.col("b") == i).drop("b") for i in range(2)],
                stage,
            )
            os.makedirs(indir, exist_ok=True)
            feed_schema = changes.drop("b").schema

            def cdc_step(i: int) -> None:
                os.rename(f"{stage}/tranche-{i}.parquet",
                          f"{indir}/tranche-{i}.parquet")
                stream = (
                    spark.readStream.schema(feed_schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(indir)
                )
                q = start_cdc_merge_stream(
                    stream, lake, "curated", "crm", "customers",
                    ["k"], "seq", cfg, cdc_ckpt,
                    persist_seq=True, retain_tombstones=True,
                )
                q.awaitTermination()

            def sink(feed: DataFrame, frm: int, to: int) -> None:
                feed.withColumn(
                    "from_gen", F.lit(frm).cast("bigint")
                ).withColumn(
                    "to_gen", F.lit(to).cast("bigint")
                ).write.mode("append").parquet(outdir)

            def drain() -> None:
                # ONE shared ledger lifecycle drives both consumers
                # (feed export + IVM refresh, fanned out and overlapped
                # in foreachBatch) — q236's structure; the per-drain
                # Python-DataSource planner spawn is paid once, and the
                # offset-equals-generation checkpoint design is intact
                q = start_changes_and_ivm_stream(
                    spark, route, sink, feed_ckpt,
                    view_path=view, group_cols=["seg"], sum_cols=["bal"],
                    key_cols=["k"], live_only=True,
                )
                q.awaitTermination()

            cdc_step(0)      # gen 2: the soft deletes
            # first drain AFTER the tombstones exist: the follower's
            # batch spans (1,2] (gen 1 contributes nothing, per q236),
            # and the IVM INITIAL build runs against a route already
            # holding tombstone rows — exercising the live filter on
            # the pinned snapshot, not just on incremental feeds
            drain()
            cdc_step(1)      # gen 3: stale/newer/late/control changes
            drain()
            report = expire_tombstones(spark, route, horizon_seq=off * 10)
            if report["tombstones_removed"] <= 0:
                raise AssertionError(
                    "q237: expiry removed no tombstones — the empty-span "
                    "property is untested"
                )
            drain()          # gen 4: expiry — live span must be EMPTY

            raw = spark.read.option("mergeSchema", "true").parquet(route)
            if raw.filter(F.coalesce("_deleted", F.lit(False))).count() <= 0:
                raise AssertionError(
                    "q237: no tombstone survived the horizon — retention "
                    "composition untested"
                )
            exported = spark.read.parquet(outdir)
            n_expiry = exported.filter(F.col("from_gen") >= 3).count()
            if n_expiry != 0:
                raise AssertionError(
                    f"q237: the expiry span leaked {n_expiry} live feed "
                    "row(s) — live_only failed to net it to zero"
                )
            meta = ivm.read_view_meta(spark, view)
            if meta["applied_generation"] != 4 or not meta["live_only"]:
                raise AssertionError(
                    f"q237: view watermark/spec wrong: {meta}"
                )
            recomputed = (
                read_cdc_table(spark, lake, "curated", "crm", "customers")
                .groupBy("seg")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                    F.round(F.sum("bal"), 2).alias("sum_bal"),
                )
            )
            maintained = ivm.read_view(spark, view).select(
                "seg", "n_rows", F.round("sum_bal", 2).alias("sum_bal")
            )
            # one action for the symmetric multiset diff (q236's note)
            if (
                maintained.exceptAll(recomputed)
                .unionAll(recomputed.exceptAll(maintained))
                .head(1)
            ):
                raise AssertionError(
                    "q237: live IVM view diverged from the read_cdc_table "
                    "recompute"
                )

            spans = (
                exported.groupBy(
                    "from_gen", "to_gen",
                    F.col("_change_type").alias("change_type"),
                )
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.sum("k").cast("bigint").alias("sum_k"),
                    F.round(F.sum("bal"), 2).alias("sum_bal"),
                )
            )
            view_rows = maintained.select(
                F.lit(0).cast("bigint").alias("from_gen"),
                F.lit(0).cast("bigint").alias("to_gen"),
                F.concat(F.lit("live:"), "seg").alias("change_type"),
                F.col("n_rows").alias("n"),
                F.lit(None).cast("bigint").alias("sum_k"),
                F.col("sum_bal"),
            )
            return spans.unionByName(view_rows).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
