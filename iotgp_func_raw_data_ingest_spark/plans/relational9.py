"""Round-3 event-stream and order-flow analytics: per-user anomaly
detection, event-type transition matrices, shipping-span distribution,
and signup→purchase conversion latency.

Same determinism discipline as llm_ops4: membership/ordering decisions
ride on integer arithmetic (counts, epoch-microsecond integer division);
doubles only appear as rounded output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q131_event_anomaly",
    oracle="""
    WITH stats AS (
        SELECT user_id,
               avg(value)        AS mu,
               stddev_pop(value) AS sigma,
               count(*)          AS n
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.event_type,
           ROUND(e.value, 4) AS value,
           ROUND((e.value - s.mu) / s.sigma, 2) AS z
    FROM events e JOIN stats s USING (user_id)
    WHERE s.n >= 10 AND s.sigma > 0
      AND ROUND(abs(e.value - s.mu) - 3 * s.sigma, 6) >= 0
    """,
)
def q131_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user outlier events: |value − μ_user| ≥ 3σ_user (population σ,
    users with ≥10 events). The membership predicate is pre-rounded at
    1e-6 on BOTH engines (the q131/q158 boundary convention) so a
    last-ulp difference in the engines' float summation order can never
    flip a row exactly on the 3σ boundary; z is ROUNDed to 2 for output.

    100 TB shape: one groupBy(user_id) with partial aggregation for the
    stats, then a same-key join that reuses the hash partitioning — two
    scans, one shuffle exchange. No windows over the raw event stream."""
    t = prep(spark, sf_dir)
    e = t["events"]
    stats = e.groupBy("user_id").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        e.join(stats, "user_id")
        .filter(
            (F.col("n") >= 10)
            & (F.col("sigma") > 0)
            & (
                F.round(
                    F.abs(F.col("value") - F.col("mu")) - 3 * F.col("sigma"), 6
                )
                >= 0
            )
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 2).alias("z"),
        )
    )


@register(
    "q132_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    cnt AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT from_type, to_type, n,
           ROUND(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 4) AS p
    FROM cnt
    """,
)
def q132_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix: per user, order events
    by (ts, event_id) — the id tiebreak makes simultaneous events
    deterministic — take lead(event_type), count (from, to) pairs, and
    normalize to row-stochastic probabilities with one division over
    integer counts.

    100 TB shape: the lead window shuffles once on user_id (bounded
    per-user sequences), the transition count aggregates to a ≤
    |types|² relation, and the normalizing window runs on that tiny
    matrix — corpus rows pass through exactly one exchange."""
    t = prep(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    cnt = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wsum = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wsum).cast("double"), 4).alias("p"),
    )


@register(
    "q133_ship_span_distribution",
    oracle="""
    WITH spans AS (
        SELECT l_orderkey,
               date_diff('day', min(l_shipdate), max(l_shipdate)) AS span_days,
               count(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(span_days // 7 AS BIGINT) AS span_weeks,
           CAST(count(*) AS BIGINT)       AS n_orders,
           CAST(min(span_days) AS BIGINT) AS min_days,
           CAST(max(span_days) AS BIGINT) AS max_days,
           ROUND(avg(n_lines), 2)         AS avg_lines
    FROM spans GROUP BY span_days // 7
    """,
)
def q133_ship_span_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order fulfillment spread: days between an order's first and last
    line shipment, bucketed into weeks — the multi-shipment latency
    distribution. All bucket math is integer (datediff → div 7); only
    avg_lines is a rounded output double over small integer counts.

    100 TB shape: one groupBy(l_orderkey) with partial min/max/count
    (map-side combine does most of the work since lineitem is
    effectively clustered by orderkey), then a ≤hundreds-key histogram
    aggregation."""
    t = prep(spark, sf_dir)
    spans = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.datediff(F.max("l_shipdate"), F.min("l_shipdate")).alias("span_days"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return (
        spans.groupBy((F.col("span_days") / 7).cast("long").alias("span_weeks"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("span_days").cast("long").alias("min_days"),
            F.max("span_days").cast("long").alias("max_days"),
            F.round(F.avg("n_lines"), 2).alias("avg_lines"),
        )
    )


@register(
    "q141_value_deciles",
    oracle="""
    WITH d AS (
        SELECT event_type, value,
               ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id)
                   AS decile
        FROM events
    )
    SELECT event_type, CAST(decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(min(value), 4) AS lo,
           ROUND(max(value), 4) AS hi
    FROM d GROUP BY event_type, decile
    """,
)
def q141_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value deciles via ntile(10): decile boundaries and
    populations — the monitoring histogram for metric drift. ntile
    assigns by integer row position over a total order made unique with
    the event_id tiebreak, so both engines produce identical buckets
    even for tied values; lo/hi are raw parquet doubles rounded for
    output only.

    100 TB shape: the window partitions by event_type (few, large
    partitions — the skew risk). At scale swap the exact ntile for
    approx_percentile boundaries broadcast back as range predicates
    (one pass, no per-type total order); the exact form here is the
    oracle-checkable semantics."""
    t = prep(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    d = t["events"].select("event_type", "value", F.ntile(10).over(w).alias("decile"))
    return d.groupBy("event_type", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


@register(
    "q144_single_source_parts",
    oracle="""
    WITH ps AS (
        SELECT l_partkey,
               count(DISTINCT l_suppkey) AS n_suppliers,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents,
               count(*) AS n_lines
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_name, p.p_brand,
           CAST(ps.n_lines AS BIGINT) AS n_lines,
           ROUND(ps.revenue_cents / 100.0, 2) AS exposure
    FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE ps.n_suppliers = 1 AND ps.revenue_cents >= 5000000
    """,
)
def q144_single_source_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain risk: parts shipped by exactly ONE supplier with
    material revenue exposure (≥ $50k) — the single-point-of-failure
    report. Revenue is summed in integer cents (round half-up both
    engines) so the threshold compare is exact; the dollar figure is
    derived by one division at the end.

    100 TB shape: groupBy(l_partkey) with a per-group distinct count
    (low per-part supplier cardinality → in-memory hash set per group;
    Spark auto-expands to the two-level distinct aggregate if not), then
    a broadcast-sized join against part filtered rows only."""
    t = prep(spark, sf_dir)
    ps = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "revenue_cents"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .filter((F.col("n_suppliers") == 1) & (F.col("revenue_cents") >= 5000000))
    )
    return ps.join(
        t["part"].select("p_partkey", "p_name", "p_brand"),
        ps.l_partkey == F.col("p_partkey"),
    ).select(
        "p_partkey",
        "p_name",
        "p_brand",
        "n_lines",
        F.round(F.col("revenue_cents") / 100.0, 2).alias("exposure"),
    )


@register(
    "q138_signup_to_purchase",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS purchase_ts
        FROM events e JOIN s USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
        GROUP BY e.user_id
    )
    SELECT s.user_id, s.signup_ts, p.purchase_ts,
           CAST((epoch_us(p.purchase_ts) - epoch_us(s.signup_ts)) // 60000000 AS BIGINT)
               AS latency_min
    FROM s JOIN p USING (user_id)
    """,
)
def q138_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency: per user, first signup → first subsequent
    purchase, latency in whole minutes via integer division of epoch
    microseconds (NOT calendar boundary counting, which DuckDB's
    date_diff does — the two disagree across minute boundaries).
    Complements q87's funnel counts with the time-to-convert relation.

    100 TB shape: two filtered groupBy(user_id) aggregations and two
    same-key joins — all four operators share the user_id hash
    partitioning, so AQE plans a single exchange on the events scan;
    the signup relation re-join is semi-join-sized."""
    t = prep(spark, sf_dir)
    e = t["events"]
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        s.join(p, "user_id")
        .select(
            "user_id",
            "signup_ts",
            "purchase_ts",
            ((F.unix_micros("purchase_ts") - F.unix_micros("signup_ts")) / 60000000)
            .cast("long")
            .alias("latency_min"),
        )
    )
