"""Round-4 tranche, part 3: session statistics, event-type
co-occurrence, and customer RFM segmentation — the classic
behavioral-analytics trio over the events/orders tables.

Determinism: durations and counts are integers (epoch-microsecond
diffs, integer division); ntile scores order by unique tiebreaks;
money sums in integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q150_session_stats",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts, event_id,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM g
    ),
    sess AS (
        SELECT user_id, session_id,
               count(*) AS n_events,
               (epoch_us(max(ts)) - epoch_us(min(ts))) // 60000000 AS dur_min
        FROM s GROUP BY user_id, session_id
    )
    SELECT CAST(dur_min // 10 AS BIGINT)  AS dur_bucket_10min,
           CAST(count(*) AS BIGINT)       AS n_sessions,
           CAST(sum(n_events) AS BIGINT)  AS total_events,
           ROUND(avg(n_events), 2)        AS avg_events
    FROM sess GROUP BY dur_min // 10
    """,
)
def q150_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration distribution over the WHOLE event stream (q47's
    gaps-and-islands sessionization, un-sampled): sessions bucketed by
    duration decaminute with event-count stats — the engagement-depth
    histogram. Duration is epoch-microsecond integer arithmetic.

    100 TB shape: one user_id shuffle feeds both windows (lag and the
    running sum share the partitioning+ordering, one exchange + one
    sort), the session roll-up reuses the same key prefix, and the
    final histogram is a ≤hundreds-key aggregation."""
    t = prep(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = (
        t["events"]
        .withColumn("new_sess", F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0))
        .withColumn(
            "session_id",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
    )
    sess = flagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 60000000)
        .cast("long")
        .alias("dur_min"),
    )
    return (
        sess.groupBy((F.col("dur_min") / 10).cast("long").alias("dur_bucket_10min"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("total_events"),
            F.round(F.avg("n_events"), 2).alias("avg_events"),
        )
    )


@register(
    "q151_type_cooccurrence",
    oracle="""
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    per_type AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
        FROM ut GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b, p.n_both, pa.n_users AS n_a, pb.n_users AS n_b,
           ROUND(p.n_both / CAST(pa.n_users + pb.n_users - p.n_both AS DOUBLE), 4)
               AS user_jaccard
    FROM pairs p
    JOIN per_type pa ON pa.event_type = p.type_a
    JOIN per_type pb ON pb.event_type = p.type_b
    """,
)
def q151_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence: for each type pair, how many users did
    BOTH, with user-set Jaccard — the behavioral-affinity matrix behind
    'users who X also Y'. All memberships are exact integer counts from
    the distinct (user, type) relation.

    100 TB shape: the distinct projection is the only corpus-sized
    shuffle; the self-join runs on (user_id) with ≤|types| rows per
    user, and everything downstream is a |types|²-sized relation. The
    per-type counts broadcast."""
    t = prep(spark, sf_dir)
    ut = t["events"].select("user_id", "event_type").distinct()
    per_type = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    pa = per_type.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    pb = per_type.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    out = pairs.join(F.broadcast(pa), "type_a").join(F.broadcast(pb), "type_b")
    return out.select(
        "type_a",
        "type_b",
        "n_both",
        "n_a",
        "n_b",
        F.round(
            F.col("n_both") / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double"),
            4,
        ).alias("user_jaccard"),
    )


@register(
    "q153_order_status_aging",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31'))
                // count(*) AS BIGINT) AS avg_age_days,
           CAST(max(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31'))
                AS BIGINT) AS oldest_age_days
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def q153_order_status_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-book aging: per (status, priority), order count, mean and
    max age in days against the dataset horizon — the backlog table an
    operations review reads. Ages are integer day-diffs; the mean is
    integer floor division, so no float crosses an engine boundary.

    100 TB shape: single groupBy over a ≤ 3×5 key space — pure map-side
    partial aggregation, one tiny shuffle."""
    t = prep(spark, sf_dir)
    age = F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date"))
    return (
        t["orders"]
        .select("o_orderstatus", "o_orderpriority", age.alias("age"))
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("age").alias("_sum_age"),
            F.max("age").cast("long").alias("oldest_age_days"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "n_orders",
            F.expr("_sum_age div n_orders").alias("avg_age_days"),
            "oldest_age_days",
        )
    )


@register(
    "q154_error_burst_detection",
    oracle="""
    WITH h AS (
        SELECT date_trunc('hour', ts) AS hour_ts,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_errors
        FROM events GROUP BY date_trunc('hour', ts)
    ),
    g AS (
        SELECT CAST(sum(n_errors) AS BIGINT) AS tot_err,
               CAST(sum(n_events) AS BIGINT) AS tot_all
        FROM h
    )
    SELECT h.hour_ts, h.n_events, h.n_errors,
           ROUND(h.n_errors / CAST(h.n_events AS DOUBLE), 4) AS error_share
    FROM h, g
    WHERE h.n_errors * g.tot_all * 2 > g.tot_err * h.n_events * 3
      AND h.n_events >= 5
    """,
)
def q154_error_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-burst detection: hours whose error share exceeds 1.5× the
    global error rate (≥5 events) — the alerting query behind an ingest
    health monitor. The burst predicate is an exact integer
    cross-multiplication (n_err·tot_all·2 > tot_err·n_events·3), so no
    float ratio decides membership; the share column is output-only.

    100 TB shape: one hour-bucket aggregation (partial agg, ≤ hours
    keys), the global totals reduce that relation to one broadcast row,
    and the burst filter runs on the hourly relation — the raw stream
    is scanned once. Streaming twin: the same predicate over a
    watermarked tumbling-window aggregate."""
    t = prep(spark, sf_dir)
    h = (
        t["events"]
        .groupBy(F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
                "n_errors"
            ),
        )
    )
    g = h.agg(
        F.sum("n_errors").alias("tot_err"), F.sum("n_events").alias("tot_all")
    )
    return (
        h.crossJoin(F.broadcast(g))
        .filter(
            (F.col("n_errors") * F.col("tot_all") * 2 > F.col("tot_err") * F.col("n_events") * 3)
            & (F.col("n_events") >= 5)
        )
        .select(
            "hour_ts",
            "n_events",
            "n_errors",
            F.round(F.col("n_errors") / F.col("n_events").cast("double"), 4).alias(
                "error_share"
            ),
        )
    )


@register(
    "q152_customer_rfm",
    oracle="""
    WITH base AS (
        SELECT o_custkey,
               date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '1998-12-31')
                   AS recency_days,
               count(*) AS frequency,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey, recency_days, frequency, monetary_cents,
               ntile(5) OVER (ORDER BY recency_days, o_custkey)            AS r_score,
               ntile(5) OVER (ORDER BY frequency DESC, o_custkey)         AS f_score,
               ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey)    AS m_score
        FROM base
    )
    SELECT CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(monetary_cents) // count(*) AS BIGINT) AS avg_monetary_cents
    FROM scored GROUP BY r_score, f_score, m_score
    """,
)
def q152_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer RFM segmentation: quintile scores for Recency (days
    since last order, lower = better), Frequency, and Monetary (integer
    cents), rolled up to the ≤125 (r,f,m) segments with size and mean
    spend — the classic lifecycle-marketing table. Every ntile orders by
    a unique (metric, custkey) key, so quintile assignment is identical
    across engines; mean spend stays in integer cents (floor division)
    because round(float-division, 2) straddles the half-cent boundary
    differently per engine (observed: .695-in-binary rounding up on one
    side, down on the other).

    100 TB shape: one groupBy(custkey) builds the base; the three
    global ntiles are the scale pressure — at 100 TB replace with
    approx_percentile boundary broadcasts (the q141 note); the segment
    roll-up is 125 keys."""
    t = prep(spark, sf_dir)
    base = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.lit("1998-12-31").cast("date"), F.max("o_orderdate").cast("date")
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "monetary_cents"
            ),
        )
    )
    scored = base.select(
        "monetary_cents",
        F.ntile(5).over(Window.orderBy("recency_days", "o_custkey")).alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency").desc(), "o_custkey"))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary_cents").desc(), "o_custkey"))
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_cents").alias("_sum_cents"),
        )
        .select(
            "r_score",
            "f_score",
            "m_score",
            "n_customers",
            F.expr("_sum_cents div n_customers").alias("avg_monetary_cents"),
        )
    )
