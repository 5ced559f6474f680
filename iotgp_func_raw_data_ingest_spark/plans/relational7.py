"""Relational surface, tranche 7: distribution and cohort analytics —
the TPC-H Q13 count-of-counts histogram (customers BY order count,
including the zero bucket only an outer join preserves), the Q7
nation-pair trade-volume matrix, and signup-cohort retention over the
event log. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q114_order_count_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q114_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many
    (non-urgent) orders they placed — the count-of-counts histogram
    whose zero bucket exists only because the join is LEFT OUTER
    (an inner join silently drops customers with no orders; Q13 is the
    canonical test that an engine keeps them).

    Scale shape: the join condition carries the filter on the orders
    side (predicate pushed to the orders scan, NOT applied after the
    join — outer-join semantics differ), one shuffle on custkey, then a
    tiny count-of-counts agg. The double-desc ordering is total (both
    keys integers, pairs unique), so the output is deterministic."""
    t = prep(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q115_nation_trade_matrix",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           ((SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
             + 50) // 100) / 100.0 AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def q115_nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border trade volume — revenue between every
    (supplier nation, customer nation) pair by ship year, domestic trade
    excluded. (Q7 proper picks two nations; the full matrix is the same
    plan with the disjunctive pair filter relaxed to an inequality.)

    Scale shape: the only big-table shuffle is lineitem⋈orders on
    orderkey; supplier, customer, and both nation copies broadcast. The
    final agg is |nations|² × years rows — partial aggregation collapses
    it map-side."""
    t = prep(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(F.col("n1_key") != F.col("n2_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            # exact integer 1e-4 units per item, summed as int64: the
            # per-row double product is bit-identical on both engines, so
            # rounding it once to an integer makes the SUM order-free.
            # Cents come from INTEGER (+50 div 100) arithmetic — a float
            # ROUND(v, 2) here diverges by a cent between engines because
            # one rounds the exact decimal and the other scales by 100 in
            # floating point first.
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("_e4")
        )
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            (F.expr("(_e4 + 50) div 100") / 100.0).alias("revenue"),
        )
    )


@register(
    "q116_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(week_offset AS INT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity
    GROUP BY 1, 2
    """,
)
def q116_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-cohort retention triangle: bucket each user by the week of
    their first event, then count distinct users active in each
    subsequent week offset — the cohort × week retention matrix every
    product-analytics pipeline derives from an event log.

    Scale shape: two aggregations on user_id (first-seen, then the
    distinct (user, offset) set) — the second groupBy reuses the
    user_id exchange under AQE; the final matrix is |cohorts| ×
    |offsets| rows. Week bucketing uses date_trunc, which both engines
    anchor to ISO Monday."""
    t = prep(spark, sf_dir)
    ev = t["events"].select("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
    firsts = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.col("wk"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "q117_event_window_dedup",
    oracle="""
    WITH g AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= 600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed
    FROM g GROUP BY event_type
    """,
)
def q117_event_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce: suppress events that repeat the same
    (user, event_type) within 10 minutes of the previous raw occurrence
    — the lag-gap dedup every event pipeline applies to retries and
    double-fires before aggregation. (This is the stateless variant:
    gap vs the previous RAW event. Suppressing relative to the last
    KEPT event is a chained fixpoint — that semantics lives in
    streaming/stateful.py where per-key state makes it one pass.)

    Scale shape: one shuffle on (user_id, event_type), per-partition
    sorted lag, then a tiny per-type rollup. The window key matches the
    natural event-log bucketing so a date-partitioned lake gives
    near-sorted input."""
    from pyspark.sql.window import Window

    t = prep(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    kept = (gap.isNull() | (gap > 600_000_000)).cast("int")
    return (
        t["events"]
        .select("event_type", kept.alias("_kept"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_kept").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum("_kept")).alias("n_suppressed"),
        )
    )
