"""Round-6 tranche 6: warehouse-maintenance operators under the hash
gate (operators/viewmaint.py).

- q211: INCREMENTAL JOIN-VIEW MAINTENANCE — the bilinear delta identity
  ΔQ = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB applied over a two-batch load must
  reconstruct the full join exactly.
- q212: TABLE DIFF / RECONCILIATION — a deterministically mutated
  second generation of the events table is diffed against the
  original; the added/removed/changed/unchanged census must match the
  oracle deriving the same census from the mutation rules.
- q213: SCD TYPE-2 DIMENSION BUILD — the per-user event-type change
  stream becomes validity intervals [effective_from, effective_to)
  with exact version numbering.

Reference parity: the reference appends rows and stops
(src/function_app.py:230-260); these are the maintenance stages any
lake it feeds needs next. They complete the lake-lifecycle story the
engine already gates (compaction q195, upsert q182, rollups q177/q180/
q184, retention/z-order in sources/lake.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q211_incremental_join_view",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q211_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an orders⋈customer view across a
    two-batch load.

    Batch 0 loads the even halves of both sides and materializes
    Q0 = A0⋈B0; batch 1 delivers the odd halves as insert deltas and
    the view advances by the bilinear delta
    ΔQ = ΔA⋈B0 ∪ A0⋈ΔB ∪ ΔA⋈ΔB (incremental_join_delta).  The
    union Q0 ∪ ΔQ must equal the full join, row for row — a dropped
    delta term loses exactly the odd×even (or even×odd, or odd×odd)
    pairs and a duplicated term doubles them, so the hash gate detects
    every mis-derivation of the identity.

    100 TB shape: per batch the full relations are touched only by
    delta-sized joins (ΔA⋈B broadcast or co-located on the key;
    A⋈ΔB likewise), so view freshness costs O(|Δ|·selectivity), not
    O(|view|) — the join analog of the mergeable rollups. Bucket A, B,
    and the view on the join key and no term reshuffles history."""
    from iotgp_func_raw_data_ingest_spark.operators.viewmaint import (
        incremental_join_delta,
    )

    t = prep(spark, sf_dir)
    orders = t["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    cust = t["customer"].select("c_custkey", "c_mktsegment")
    a0 = orders.filter(F.col("o_orderkey") % 2 == 0)
    a1 = orders.filter(F.col("o_orderkey") % 2 == 1)
    b0 = cust.filter(F.col("c_custkey") % 2 == 0)
    b1 = cust.filter(F.col("c_custkey") % 2 == 1)
    on = F.col("o_custkey") == F.col("c_custkey")
    q0 = a0.join(b0, on)
    view = q0.unionByName(incremental_join_delta(a0, a1, b0, b1, on))
    return view.select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")


@register(
    "q212_table_diff",
    oracle="""
    SELECT 'removed' AS status, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_id
    FROM events WHERE event_id % 97 = 0
    UNION ALL
    SELECT 'added', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(-event_id - 1) AS BIGINT)
    FROM events WHERE event_id % 103 = 0
    UNION ALL
    SELECT 'changed', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(event_id) AS BIGINT)
    FROM events WHERE event_id % 97 <> 0 AND event_id % 101 = 0
    UNION ALL
    SELECT 'unchanged', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(event_id) AS BIGINT)
    FROM events WHERE event_id % 97 <> 0 AND event_id % 101 <> 0
    """,
)
def q212_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content reconciliation between two generations of a table.

    Generation 2 is derived from the events table by three
    deterministic mutations — rows with event_id ≡ 0 (mod 97) deleted,
    values bumped where event_id ≡ 0 (mod 101), and new rows (key
    −id−1: negative, so disjoint from real ids at ANY scale) appended
    where event_id ≡ 0 (mod 103) — then ``diff_tables``
    full-outer-joins the generations on the key and classifies every
    row from md5 fingerprints of the compared columns.  The oracle
    derives the same added/removed/changed/unchanged census directly
    from the mutation rules, so a fingerprint that misses a column, a
    join that drops unmatched keys, or null-canonicalization bugs all
    flip a census row.

    100 TB shape: the backfill/migration acceptance check — map-side
    fingerprints mean only (key, 16-byte hash) pairs shuffle through
    the one full outer join; census output is 4 rows. Run it before
    swapping any rewritten generation live (q195's fingerprint gate is
    the per-partition variant of the same idea)."""
    from iotgp_func_raw_data_ingest_spark.operators.viewmaint import diff_tables

    t = prep(spark, sf_dir)
    ev = t["events"].select("event_id", "user_id", "event_type", "value")
    v2 = (
        ev.filter(F.col("event_id") % 97 != 0)
        .withColumn(
            "value",
            F.col("value")
            + F.when(F.col("event_id") % 101 == 0, 1.0).otherwise(0.0),
        )
        .unionByName(
            ev.filter(F.col("event_id") % 103 == 0).withColumn(
                "event_id", -F.col("event_id") - 1
            )
        )
    )
    d = diff_tables(
        ev, v2, ["event_id"], ["user_id", "event_type", "value"]
    )
    return d.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("event_id").cast("bigint").alias("sum_id"),
    )


@register(
    "q213_scd2_build",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               (ROW_NUMBER() OVER w = 1)
               OR (LAG(event_type) OVER w IS DISTINCT FROM event_type)
                   AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    starts AS (SELECT * FROM marked WHERE is_start)
    SELECT user_id,
           CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
           event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS eff_from,
           COALESCE(strftime(LEAD(ts) OVER w2, '%Y-%m-%d %H:%M:%S.%f'),
                    '9999-12-31 23:59:59.999999') AS eff_to,
           LEAD(ts) OVER w2 IS NULL AS is_current
    FROM starts
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q213_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension from a change stream: each user's
    event_type history becomes validity intervals.

    ``scd2_from_events`` detects version starts with lag() over the
    (ts, event_id)-ordered per-user stream (the tiebreak makes the
    order total) and closes each interval with the next version's
    start via lead(); the current version carries the warehouse
    sentinel end and is_current=true.  Timestamps are emitted as
    microsecond ISO strings per the cross-engine date convention
    (driver-gate rule: calendar cells ride as strings).

    100 TB shape: two window passes shuffled once on the dimension
    key — the standard CDC→dimension build. Skewed keys (one user
    with millions of events) range-partition within the key on ts
    first; at that point the lag/lead become a segmented two-pass like
    operators/prefix.py."""
    from iotgp_func_raw_data_ingest_spark.operators.viewmaint import (
        scd2_from_events,
    )

    t = prep(spark, sf_dir)
    scd = scd2_from_events(
        t["events"], key="user_id", attr="event_type",
        ts_col="ts", tiebreak="event_id",
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return scd.select(
        "user_id",
        F.col("version").cast("bigint").alias("version"),
        "event_type",
        F.date_format("effective_from", fmt).alias("eff_from"),
        F.date_format("effective_to", fmt).alias("eff_to"),
        "is_current",
    )


@register(
    "q214_keyed_delete",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(event_id) AS BIGINT) AS sum_id
    FROM events WHERE user_id % 37 <> 0
    GROUP BY event_type
    """,
)
def q214_keyed_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten delete that rewrites only affected files.

    The events table is materialized as an 8-file lake table, every
    user_id ≡ 0 (mod 37) is deleted through
    ``maintenance.delete_keys_from_table`` (plan → stage survivors of
    affected files → manifest-driven commit), and the surviving table
    must aggregate exactly like the oracle's filtered view — a key
    escaping the delete, a survivor lost with it, or a staged file
    double-moved all flip the gate.  The file-PRUNING property (only
    files holding doomed keys are rewritten) is asserted by
    tests/test_keyed_delete.py, where the doomed keys are chosen to
    co-locate; here the 27 doomed users hash across all 8 files, so the
    gate exercises the every-file-affected edge instead.

    100 TB shape: documented in the operator — the plan pass reads
    footers + pruned row groups, the rewrite touches only files that
    contain the keys, and the commit is metadata renames off a
    manifest, idempotent across crashes."""
    import shutil
    import tempfile

    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        delete_keys_from_table,
    )

    t = prep(spark, sf_dir)
    ev = t["events"].select("event_id", "user_id", "event_type", "value")
    work = tempfile.mkdtemp(prefix="q214_")
    try:
        table = f"{work}/events_lake"
        ev.repartition(8, "user_id").write.parquet(table)
        doomed = ev.filter(F.col("user_id") % 37 == 0).select("user_id")
        report = delete_keys_from_table(spark, table, "user_id", doomed)
        assert report["rows_deleted"] > 0, report
        out = (
            spark.read.parquet(table)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum("event_id").cast("bigint").alias("sum_id"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
