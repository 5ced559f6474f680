"""Round-7 tranche 3: streaming dimension refresh + the SQL DML/DDL
surface.

- q226: **mid-stream dimension refresh** — the operational reality
  q196's stream-static join abstracts away: the dimension is NOT
  frozen for the life of the stream. Two ``availableNow`` runs share
  one checkpoint; between them the dimension table is overwritten.
  Rows must join against the dimension version current AT PROCESSING
  TIME — tranche A with v1, tranche B with v2 — which the oracle
  states declaratively with a CASE on the tranche split key. Re-joining
  tranche A against v2 on the restart (state/checkpoint broken) or
  joining B against a cached v1 (dim captured at plan time instead of
  per run) both flip the hash.
- q227: **CREATE TABLE … DEFAULT + the INSERT forms** — the ANSI DML
  surface a service schema migration leans on: column DEFAULTs filled
  for omitted columns, the explicit ``DEFAULT`` keyword, partial
  column lists, and ``INSERT INTO … SELECT``. The oracle reconstructs
  the final table from pure VALUES/SELECT with the defaults resolved
  by hand.

Reference parity: engine-added (SURVEY §2.6).
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


@register(
    "q226_stream_dim_refresh",
    oracle="""
    WITH cut AS (SELECT MAX(event_id) // 2 AS c FROM events)
    SELECT CASE WHEN e.event_id <= (SELECT c FROM cut)
                THEN cu.c_mktsegment
                ELSE 'R2-' || cu.c_mktsegment END AS segment,
           e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM events e
    JOIN customer cu ON cu.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
)
def q226_stream_dim_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment across a dimension refresh: run 1
    drains the event_id ≤ max/2 tranche joined (inside foreachBatch,
    which re-reads the dimension path per batch — the refresh-capable
    pattern) against dim v1; the dimension is then overwritten with v2
    (segments prefixed 'R2-'), the second tranche file lands, and run 2
    resumes the SAME checkpoint, draining only the new tranche against
    v2. The sink aggregate must equal the oracle's CASE-split join:
    checkpoint replay of tranche A, a plan-time-frozen dimension, or a
    lost batch each change counts or segment labels.

    100 TB shape: the dimension re-read costs one broadcast-sized scan
    per micro-batch — the standard price of refreshable enrichment
    (contrast q196, where the dim is fixed at plan time and free);
    schedule dim refreshes at batch granularity, never mid-batch, and
    the per-row semantics stay deterministic. Everything else is
    q196's stateless per-batch join."""
    t = prep(spark, sf_dir)
    events = t["events"]
    # integer floor-division on BOTH sides: double-divide-then-cast
    # truncates in Spark but rounds in DuckDB — off-by-one at odd max
    cut = events.agg(F.max("event_id")).first()[0] // 2
    dim_v1 = t["customer"].select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    dim_v2 = dim_v1.withColumn("segment", F.concat(F.lit("R2-"), F.col("segment")))
    work = tempfile.mkdtemp(prefix="q226_")
    try:
        with _few_shuffle_partitions(spark):
            tranche_a = events.filter(F.col("event_id") <= cut)
            tranche_b = events.filter(F.col("event_id") > cut)
            tranche_a.coalesce(1).write.parquet(f"{work}/in/a")

            def _run() -> None:
                stream = (
                    spark.readStream.schema(events.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{work}/in/*")
                )

                def _enrich(batch_df: DataFrame, batch_id: int) -> None:
                    dim = spark.read.parquet(f"{work}/dim")  # per-batch read
                    batch_df.join(F.broadcast(dim), "user_id").write.mode(
                        "append"
                    ).parquet(f"{work}/out")

                q = (
                    stream.writeStream.foreachBatch(_enrich)
                    .option("checkpointLocation", f"{work}/ckpt")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()

            dim_v1.write.mode("overwrite").parquet(f"{work}/dim")
            _run()  # drains tranche A against v1
            dim_v2.write.mode("overwrite").parquet(f"{work}/dim")
            tranche_b.coalesce(1).write.parquet(f"{work}/in/b")
            _run()  # resumes the checkpoint, drains ONLY B against v2

            out = (
                spark.read.parquet(f"{work}/out")
                .groupBy("segment", "event_type")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_events"),
                    F.round(F.sum("value"), 2).alias("sum_value"),
                )
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q227_sql_dml_defaults",
    oracle="""
    WITH rows_ AS (
        SELECT 1 AS id, 'open' AS status, 2.0 AS score
        UNION ALL SELECT 2, 'new', 1.5
        UNION ALL SELECT 3, 'new', 1.5
        UNION ALL
        SELECT event_id, 'bulk', CAST(user_id AS DOUBLE)
        FROM events WHERE event_id <= 20
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(score), 2) AS sum_score,
           CAST(SUM(id) AS BIGINT) AS sum_id
    FROM rows_ GROUP BY status
    """,
)
def q227_sql_dml_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL DDL + every INSERT form against a DEFAULT-bearing table:
    CREATE TABLE (status DEFAULT 'new', score DEFAULT 1.5), then a
    full-row VALUES insert, a partial-column-list insert (defaults
    fill the gap), an explicit DEFAULT-keyword insert, and a bulk
    INSERT … SELECT from the events table. The read-back census must
    equal the oracle's hand-resolved reconstruction — a default
    misapplied, a column-list misalignment, or a dropped insert all
    flip counts or sums.

    Execution note: eager by nature (DDL + four DML statements run in
    the builder, like q214/q221); the result is pinned with
    localCheckpoint so the table and its files can be dropped before
    the caller collects.

    100 TB shape: DEFAULTs are resolved at WRITE time into plain
    column values (parquet carries the materialized value, and the
    scan is indistinguishable from any other) — zero read-side cost,
    unlike formats that resolve defaults at read. INSERT INTO …
    SELECT is an ordinary distributed write job."""
    import uuid as _uuid

    t = prep(spark, sf_dir)
    t["events"]
    tbl = f"q227_dml_{_uuid.uuid4().hex[:8]}"
    work = tempfile.mkdtemp(prefix="q227_")
    try:
        spark.sql(
            f"""
            CREATE TABLE {tbl} (
                id BIGINT,
                status STRING DEFAULT 'new',
                score DOUBLE DEFAULT 1.5
            ) USING parquet LOCATION '{work}/t'
            """
        )
        spark.sql(f"INSERT INTO {tbl} VALUES (1, 'open', 2.0)")
        spark.sql(f"INSERT INTO {tbl} (id) VALUES (2)")
        spark.sql(f"INSERT INTO {tbl} VALUES (3, DEFAULT, DEFAULT)")
        spark.sql(
            f"""
            INSERT INTO {tbl}
            SELECT event_id, 'bulk', CAST(user_id AS DOUBLE)
            FROM events WHERE event_id <= 20
            """
        )
        out = spark.sql(
            f"""
            SELECT status,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(score), 2) AS sum_score,
                   CAST(SUM(id) AS BIGINT) AS sum_id
            FROM {tbl} GROUP BY status
            """
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q228_merge_into",
    oracle="""
    WITH target AS (
        SELECT c_custkey AS k, c_mktsegment AS seg, ROUND(c_acctbal, 2) AS bal
        FROM customer
    ),
    merged AS (
        SELECT k, seg,
               CASE WHEN k % 7 = 0 THEN ROUND(bal + 100.0, 2) ELSE bal END AS bal
        FROM target
        WHERE NOT (k % 7 = 0 AND bal < 0)
        UNION ALL
        SELECT c_custkey + (SELECT MAX(c_custkey) + 1 FROM customer),
               'NEW-' || c_mktsegment, 50.0
        FROM customer WHERE c_custkey % 11 = 3
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(bal), 2) AS sum_bal
    FROM merged GROUP BY seg
    """,
)
def q228_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-clause ANSI MERGE over the lake (``sources.lake.
    merge_lake_table``): the customer dimension is materialized as a
    lake route, then one merge applies WHEN MATCHED AND bal < 0 THEN
    DELETE (clause precedence: tested before update), WHEN MATCHED THEN
    UPDATE SET bal = s.bal + 100, and WHEN NOT MATCHED THEN INSERT (a
    re-keyed slice with fresh segments). The read-back census must equal
    the oracle's declarative CASE/WHERE/UNION reconstruction — a clause
    misapplied, precedence inverted, an unmatched row lost, or the swap
    dropping carried rows all flip counts or sums. Eager lake lifecycle
    per the plans/__init__ convention; result pinned with
    localCheckpoint before the temp route is removed.

    100 TB shape: the merge is ONE full-outer sort-merge join on the
    key (one hash exchange per side) + a codegen'd CASE projection +
    the staged two-rename swap — the same carried-copy economics as
    upsert_lake_table; scope routes so merges touch bounded data."""
    from iotgp_func_raw_data_ingest_spark.config import EngineConfig
    from iotgp_func_raw_data_ingest_spark.sources.lake import merge_lake_table

    t = prep(spark, sf_dir)
    cust = t["customer"].select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    work = tempfile.mkdtemp(prefix="q228_")
    try:
        lake = f"{work}/lake"
        cfg = EngineConfig(output_path=lake)
        route = f"{lake}/curated/crm/customers"
        cust.write.parquet(route)
        updates = cust.filter(F.col("k") % 7 == 0)
        # insert keys re-keyed past max(k): a fixed offset collides with
        # update keys once customer cardinality reaches it (sf ≳ 7) and
        # trips the ANSI duplicate-source-key raise — derive the offset
        # from the data (broadcast 1-row aggregate) so the query is
        # SF-independent; the oracle mirrors it as a scalar subquery
        off = cust.agg((F.max("k") + 1).alias("_off"))
        inserts = (
            cust.filter(F.col("k") % 11 == 3)
            .crossJoin(F.broadcast(off))
            .select(
                (F.col("k") + F.col("_off")).alias("k"),
                F.concat(F.lit("NEW-"), F.col("seg")).alias("seg"),
                F.lit(50.0).alias("bal"),
            )
        )
        merge_lake_table(
            spark, lake, "curated", "crm", "customers",
            updates.unionByName(inserts), ["k"], cfg,
            matched_update={"bal": "ROUND(s.bal + 100.0, 2)"},
            matched_delete_condition="t.bal < 0",
        )
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
    "q229_merge_pruned",
    oracle="""
    WITH cut AS (
        SELECT MAX(c_custkey) - MAX(c_custkey) // 100 AS c FROM customer
    ),
    target AS (
        SELECT c_custkey AS k, c_mktsegment AS seg, ROUND(c_acctbal, 2) AS bal
        FROM customer
    ),
    merged AS (
        SELECT k,
               CASE WHEN k > (SELECT c FROM cut) AND NOT (bal < 0)
                    THEN 'CDC-' || seg ELSE seg END AS seg,
               CASE WHEN k > (SELECT c FROM cut) AND NOT (bal < 0)
                    THEN ROUND(bal + 11.5, 2) ELSE bal END AS bal
        FROM target
        WHERE NOT (k > (SELECT c FROM cut) AND bal < 0)
        UNION ALL
        SELECT c_custkey + (SELECT MAX(c_custkey) + 1 FROM customer),
               'INS', 25.0
        FROM customer WHERE c_custkey % 113 = 7
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(bal), 2) AS sum_bal
    FROM merged GROUP BY seg
    """,
)
def q229_merge_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-PRUNED three-clause MERGE (``sources.lake.
    merge_lake_table_pruned``): the customer dimension is materialized
    as an 8-file RANGE-clustered lake route (the production CDC shape —
    recent keys live together), then the contiguous top-1%-of-keyspace
    CDC slice (k > max − max//100, plus re-keyed inserts at
    k % 113 = 7) merges with WHEN MATCHED AND t.bal < 0 THEN DELETE,
    WHEN MATCHED THEN UPDATE SET seg = 'CDC-'||t.seg,
    bal = ROUND(t.bal + 11.5, 2), and WHEN NOT MATCHED THEN INSERT.
    Identical clause semantics to q228's full merge, but a genuinely
    different physical plan: PLAN (key-pruned scan + range pre-filter +
    broadcast semi-join on input_file_name) → STAGE (merge join over
    ONLY the affected files, inserts included, clause counts as an
    Observation) → COMMIT (manifest-driven per-file replacement;
    untouched files never read twice nor rewritten). The read-back
    census must equal the oracle's declarative CASE/WHERE/UNION
    reconstruction — a file dropped by the pruning plan, an insert lost
    against the slice, or a mis-replaced original all flip counts or
    sums. Eager lake lifecycle per the plans/__init__ convention;
    result pinned with localCheckpoint before the temp route is
    removed.

    100 TB shape: cost ∝ TOUCHED files, not route size — the dominant
    production merge (small CDC batch vs huge target) stays a bounded
    maintenance action. The builder asserts the pruning actually
    happened (files_rewritten < files_total) at EVERY scale factor —
    the contiguous CDC slice against the range-clustered layout touches
    at most the tail file plus a boundary straddle — so the gate cannot
    go green on a silent full rewrite. The cut is integer arithmetic
    (max − max//100) on both sides; a float cut would risk a
    boundary-row disagreement between the engines."""
    from iotgp_func_raw_data_ingest_spark.config import EngineConfig
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        merge_lake_table_pruned,
    )

    t = prep(spark, sf_dir)
    cust = t["customer"].select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    work = tempfile.mkdtemp(prefix="q229_")
    try:
        lake = f"{work}/lake"
        cfg = EngineConfig(output_path=lake)
        route = f"{lake}/curated/crm/customers"
        # RANGE-clustered multi-file layout so the pruning is real at
        # every SF: the contiguous top-1% CDC key slice lands in the
        # tail file (+ at most a boundary straddle), never all 8 — a
        # hash layout would scatter any key set across every file
        cust.repartitionByRange(8, "k").write.parquet(route)
        max_k = cust.agg(F.max("k")).first()[0]
        cut = max_k - max_k // 100
        updates = cust.filter(F.col("k") > cut)
        off = cust.agg((F.max("k") + 1).alias("_off"))
        inserts = (
            cust.filter(F.col("k") % 113 == 7)
            .crossJoin(F.broadcast(off))
            .select(
                (F.col("k") + F.col("_off")).alias("k"),
                F.lit("INS").alias("seg"),
                F.lit(25.0).alias("bal"),
            )
        )
        report = merge_lake_table_pruned(
            spark, lake, "curated", "crm", "customers",
            updates.unionByName(inserts), ["k"], cfg,
            matched_update={
                "seg": "CONCAT('CDC-', t.seg)",
                "bal": "ROUND(t.bal + 11.5, 2)",
            },
            matched_delete_condition="t.bal < 0",
        )
        if not report["files_rewritten"] < report["files_total"]:
            raise AssertionError(
                "q229: merge was not file-pruned "
                f"({report['files_rewritten']}/{report['files_total']})"
            )
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
