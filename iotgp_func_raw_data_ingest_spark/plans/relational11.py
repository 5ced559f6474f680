"""Round-5 tranche, part 1: operational analytics the reference's users
run downstream of ingest — shuffle-skew audits, Markov transitions,
inter-arrival latency percentiles, robust (MAD) outlier detection,
month-over-month revenue deltas, and user-lifespan rollups.

Registered behind the q139–q154 window (plans/__init__._reorder bucket
2 sorts by name, so these queue after the due tranche without evicting
its re-checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iotgp_func_raw_data_ingest_spark.operators.skew import heavy_hitters
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q155_heavy_hitter_keys",
    oracle="""
    WITH c AS (
        SELECT CAST(l_suppkey AS VARCHAR) AS key,
               CAST(count(*) AS BIGINT)   AS n_rows
        FROM lineitem GROUP BY 1
    ),
    t AS (SELECT sum(n_rows) AS tot, count(*) AS nk FROM c),
    r AS (
        SELECT key, n_rows,
               ROUND(n_rows / CAST(tot AS DOUBLE), 4)      AS share,
               ROUND(n_rows * nk / CAST(tot AS DOUBLE), 4) AS skew,
               CAST(row_number() OVER (ORDER BY n_rows DESC, key) AS BIGINT)
                   AS rank
        FROM c, t
    )
    SELECT key, n_rows, share, skew, rank FROM r WHERE rank <= 20
    """,
)
def q155_heavy_hitter_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew audit on lineitem's supplier join key: the top-20
    heaviest keys with their row share and skew factor (count over the
    mean key). This is the planning query run before choosing between a
    plain shuffle join, AQE skew split, and salting (q95) for a 100 TB
    fact-to-fact join.

    100 TB shape: operators/skew.heavy_hitters — one partial-agg groupBy
    on the key, totals folded in by broadcast (single scan), and the
    top-k rank rewritten to WindowGroupLimit by Catalyst, so the rank
    never funnels the full key domain through one task."""
    t = prep(spark, sf_dir)
    return heavy_hitters(t["lineitem"], "l_suppkey", k=20)


@register(
    "q156_transition_probs",
    oracle="""
    WITH seq AS (
        SELECT event_type AS cur,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    c AS (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    )
    SELECT cur, nxt, n,
           ROUND(n / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE), 4)
               AS prob
    FROM c
    """,
)
def q156_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current), the row-normalized companion to q132's
    raw transition counts — what a funnel/anomaly model consumes.
    Ordering ties on ts break by event_id so both engines walk the same
    sequence.

    100 TB shape: the lead() window shuffles once on user_id (bounded
    per-user partitions), the count groupBy operates on a types² key
    space, and the normalizing window runs over that tiny aggregated
    relation."""
    t = prep(spark, sf_dir)
    seq = t["events"].select(
        F.col("event_type").alias("cur"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    c = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return c.select(
        "cur",
        "nxt",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(Window.partitionBy("cur")).cast("double"), 4
        ).alias("prob"),
    )


@register(
    "q157_interarrival_stats",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
        FROM events
    ),
    q AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_gaps,
               quantile_cont(gap_us, [0.5, 0.9, 0.99]) AS p
        FROM gaps WHERE gap_us IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n_gaps,
           ROUND(p[1] / 1e6, 4) AS p50_s,
           ROUND(p[2] / 1e6, 4) AS p90_s,
           ROUND(p[3] / 1e6, 4) AS p99_s
    FROM q
    """,
)
def q157_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival latency per event type: p50/p90/p99 of the gap (in
    seconds) between consecutive events of the same type — the queueing
    profile an ingest-capacity plan reads. Gaps are computed in integer
    microseconds (exact in double up to 2^52, so both engines interpolate
    identical values) and converted to seconds only at output.

    100 TB shape: one shuffle on event_type for the lag window — at
    scale you'd sub-partition by (event_type, day) and merge digests;
    the exact-percentile agg is per-type and Spark's single-pass
    `percentile` keeps a per-group buffer (switch to approx_percentile's
    t-digest when groups outgrow memory; q59 shows that form)."""
    t = prep(spark, sf_dir)
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(
        Window.partitionBy("event_type").orderBy("ts", "event_id")
    )
    gaps = t["events"].select("event_type", gap.alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    q = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.expr("percentile(gap_us, array(0.5D, 0.9D, 0.99D))").alias("p"),
    )
    return q.select(
        "event_type",
        "n_gaps",
        F.round(F.col("p")[0] / 1e6, 4).alias("p50_s"),
        F.round(F.col("p")[1] / 1e6, 4).alias("p90_s"),
        F.round(F.col("p")[2] / 1e6, 4).alias("p99_s"),
    )


@register(
    "q158_robust_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, min(med) AS med,
               quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(m.mad, 4) AS mad_r,
           ROUND(m.med, 4) AS med_r,
           CAST(sum(CASE WHEN ROUND(d.adev - 3 * 1.4826 * m.mad, 6) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type, m.mad, m.med
    """,
)
def q158_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier detection per event type — the
    companion to q131's mean/stddev z-score that survives heavy-tailed
    value distributions: a point is anomalous when its absolute deviation
    exceeds 3 × 1.4826 × MAD (the normal-consistency constant). The
    predicate operand is pre-rounded at 1e-6 (the q131/ADVICE boundary
    convention) so a last-ulp interpolation difference between engines
    cannot flip a row's membership.

    100 TB shape: two broadcast-joined scalar-per-group passes (median,
    then MAD of deviations) + one counting pass — every join side after
    aggregation is ≤ n_types rows, so the corpus is scanned, never
    shuffled on a wide key. At true scale the exact medians become
    approx_percentile t-digests."""
    t = prep(spark, sf_dir)
    ev = t["events"]
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.min("med").alias("med"),
        F.expr("percentile(adev, 0.5D)").alias("mad"),
    )
    out = F.when(
        F.round(F.col("adev") - 3 * 1.4826 * F.col("mad"), 6) > 0, 1
    ).otherwise(0)
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "mad", "med")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(out).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            F.round("mad", 4).alias("mad_r"),
            F.round("med", 4).alias("med_r"),
            "n_outliers",
        )
    )


@register(
    "q159_revenue_mom",
    oracle="""
    WITH m AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
               ROUND(sum(o_totalprice), 2) AS revenue,
               CAST(count(*) AS BIGINT)    AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT month, revenue, n_orders,
           ROUND((revenue - lag(revenue) OVER (ORDER BY month))
                 / lag(revenue) OVER (ORDER BY month), 4) AS mom_change
    FROM m
    """,
)
def q159_revenue_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue: monthly order totals with the relative
    change vs the prior month — the KPI time series every revenue
    dashboard leads with. The MoM ratio divides the already-rounded
    monthly sums so both engines divide identical operands; the month is
    emitted as an ISO string because DATE cells do not survive the
    driver's pandas canonicalization uniformly across engines.

    100 TB shape: one partial-agg groupBy onto a months-sized relation;
    the unpartitioned lag window runs AFTER aggregation on ~80 rows, so
    the single-partition exchange carries KPIs, not data (contrast q134,
    which needed the two-phase prefix sum because its running sum was
    over the corpus)."""
    t = prep(spark, sf_dir)
    m = (
        t["orders"]
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month"
            )
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        "n_orders",
        F.round((F.col("revenue") - prev) / prev, 4).alias("mom_change"),
    )


@register(
    "q160_user_lifespan",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(floor((epoch_us(max(ts)) - epoch_us(min(ts)))
                          / 86400000000.0) AS BIGINT) AS span_days,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT CAST(span_days // 7 AS BIGINT)  AS week_bucket,
           CAST(count(*) AS BIGINT)        AS n_users,
           ROUND(avg(n_events), 2)         AS avg_events,
           ROUND(avg(span_days), 2)        AS avg_span_days
    FROM u GROUP BY 1
    """,
)
def q160_user_lifespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-lifespan histogram: per user, days between first and last
    event and total activity, rolled up into week-wide lifespan buckets —
    the retention-shape summary behind q116's cohort matrix. Spans are
    integer microsecond differences floored to days, so bucket edges are
    exact on both engines.

    100 TB shape: groupBy(user_id) with map-side partial min/max/count
    (one shuffle, fixed-width rows), then a second agg onto a buckets-
    sized relation. No windows, no joins."""
    t = prep(spark, sf_dir)
    span_days = F.floor(
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 86400000000.0
    ).cast("long")
    u = t["events"].groupBy("user_id").agg(
        span_days.alias("span_days"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        u.groupBy(F.floor(F.col("span_days") / 7).cast("long").alias("week_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("n_events"), 2).alias("avg_events"),
            F.round(F.avg("span_days"), 2).alias("avg_span_days"),
        )
    )
