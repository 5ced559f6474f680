"""Relational surface, tranche 6: classic TPC-H deep-join shapes the
engine had not yet covered — market-share ratio over a 7-table join
(Q8), profit rollup over a 5-table join (Q9), conditional-ratio promo
share (Q14), disjunctive OR-of-ANDs pushdown (Q19), and a
max-of-aggregate view join (Q15).

These exercise Catalyst behaviors that matter at 100 TB: join
reordering across many dims (all dims broadcast — no shuffle except the
final agg), partial aggregation before the ratio division, and
disjunctive predicate pushdown into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register

def _rev() -> F.Column:
    # built lazily: F.col needs an active SparkContext (PySpark 4 classic)
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q80_market_share",
    oracle="""
    WITH sales AS (
        SELECT EXTRACT(year FROM o.o_orderdate)         AS order_year,
               sn.n_name                                AS supp_nation,
               l.l_extendedprice * (1 - l.l_discount)   AS volume
        FROM lineitem l
        JOIN part     p  ON p.p_partkey   = l.l_partkey
        JOIN supplier s  ON s.s_suppkey   = l.l_suppkey
        JOIN nation   sn ON sn.n_nationkey = s.s_nationkey
        JOIN orders   o  ON o.o_orderkey  = l.l_orderkey
        JOIN customer c  ON c.c_custkey   = o.o_custkey
        JOIN nation   cn ON cn.n_nationkey = c.c_nationkey
        JOIN region   r  ON r.r_regionkey = cn.n_regionkey
        WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
    )
    SELECT order_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END)
                 / SUM(volume), 5) AS mkt_share
    FROM sales GROUP BY order_year
    """,
)
def q80_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_2's share of PROMO-part revenue sold into
    ASIA customers, by order year. Seven-table join; every dimension side
    (part, supplier, nation, customer-side chain) is broadcast, so the
    only shuffle is the final year-grouped aggregate of lineitem."""
    t = prep(spark, sf_dir)
    cust_region = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nation = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    sales = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t["orders"].select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.col("supp_nation"),
            _rev().alias("volume"),
        )
    )
    nation_vol = F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(0.0))
    return sales.groupBy("order_year").agg(
        F.round(nation_vol / F.sum("volume"), 5).alias("mkt_share")
    )


@register(
    "q81_product_profit",
    oracle="""
    SELECT n.n_name                                  AS nation,
           EXTRACT(year FROM o.o_orderdate)          AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey
    JOIN part     p ON p.p_partkey   = l.l_partkey
    JOIN orders   o ON o.o_orderkey  = l.l_orderkey
    JOIN nation   n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    """,
)
def q81_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus a 60%-of-retail synthetic
    supply cost — the driver tables have no partsupp) by supplier nation
    and order year, for parts whose name contains 'widget'. The LIKE
    filter prunes part before its broadcast."""
    t = prep(spark, sf_dir)
    profit = _rev() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"]
                .filter(F.col("p_name").contains("widget"))
                .select("p_partkey", "p_retailprice")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@register(
    "q82_promo_share",
    oracle="""
    SELECT date_trunc('month', l.l_shipdate) AS ship_month,
           ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 5) AS promo_share
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY ship_month
    """,
)
def q82_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of 1996 revenue from PROMO parts, by
    ship month. Conditional-sum ratio; the shipdate range predicate
    reaches the parquet scan (min/max row-group pruning at scale)."""
    t = prep(spark, sf_dir)
    promo_rev = F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(F.round(100.0 * promo_rev / F.sum(_rev()), 5).alias("promo_share"))
    )


@register(
    "q83_disjunctive_predicates",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT)                              AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q83_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst
    extracts the common per-side disjuncts (brand IN set, quantity range
    union) and pushes them below the join, so each scan is pre-filtered
    even though the full predicate straddles the join."""
    t = prep(spark, sf_dir)
    li, p = t["lineitem"], t["part"]
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
                F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q84_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS suppkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q84_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The scalar subquery MAX decorrelates to an empty-frame window max over
    the tiny aggregated rev set (supplier cardinality), not lineitem.
    Revenue is rounded BEFORE the max-equality compare so both engines
    test identical values (registry determinism contract)."""
    t = prep(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.round(F.sum(_rev()), 2).alias("total_rev"))
    )
    from pyspark.sql.window import Window

    best = rev.withColumn("max_rev", F.max("total_rev").over(Window.partitionBy())).filter(
        F.col("total_rev") == F.col("max_rev")
    )
    return (
        best.join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q87_conversion_funnel",
    oracle="""
    WITH stages AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS BIGINT) AS viewed,
           CAST(COUNT(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT)
               AS clicked_after_view,
           CAST(COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)
                AS BIGINT) AS purchased_after_click
    FROM stages
    """,
)
def q87_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase) per user: one
    grouped pass computes each user's first event time per stage, then a
    global conditional count. Product-analytics staple; a single shuffle
    on user_id regardless of funnel depth (NULL comparisons make the
    stage-order predicates self-gating)."""
    t = prep(spark, sf_dir)
    first_of = lambda et: F.min(F.when(F.col("event_type") == et, F.col("ts")))
    stages = t["events"].groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    count_if = lambda c: F.count(F.when(c, F.lit(1)))
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        count_if(F.col("t_view").isNotNull()).alias("viewed"),
        count_if(F.col("t_click") > F.col("t_view")).alias("clicked_after_view"),
        count_if(
            (F.col("t_click") > F.col("t_view")) & (F.col("t_purchase") > F.col("t_click"))
        ).alias("purchased_after_click"),
    )


@register(
    "q88_gap_fill",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, ROUND(SUM(value), 2) AS v
        FROM events WHERE event_type = 'purchase' GROUP BY day
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
    )
    SELECT s.day, COALESCE(d.v, 0.0) AS v
    FROM spine s LEFT JOIN daily d USING (day)
    """,
)
def q88_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: daily purchase totals left-joined onto
    a generated calendar spine (F.sequence over the observed min/max) so
    missing days surface as explicit zeros. The spine derives from a
    1-row bounds aggregate — no driver-side collect; the spine side is
    broadcast (bounded by days-in-range, not data size)."""
    t = prep(spark, sf_dir)
    daily = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    spine = (
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"))
    )
    return (
        F.broadcast(spine)
        .join(daily, "day", "left")
        .select("day", F.coalesce("v", F.lit(0.0)).alias("v"))
    )


@register(
    "q89_regression_aggs",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6)           AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4)     AS qty_price_covar,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q89_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics battery: corr / covar_samp / OLS slope +
    intercept / regr_count per return flag — single hash-agg pass with
    map-side partials (all are algebraic aggregates, so they scale like
    SUM: constant state per group, no sort, no second pass)."""
    t = prep(spark, sf_dir)
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.round(F.corr(q, p), 6).alias("qty_price_corr"),
        F.round(F.covar_samp(q, p), 4).alias("qty_price_covar"),
        F.round(F.regr_slope(p, q), 4).alias("slope"),
        F.round(F.regr_intercept(p, q), 4).alias("intercept"),
        F.regr_count(p, q).alias("n"),
    )


@register(
    "q90_try_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           TRY_CAST(CASE WHEN l_linenumber % 3 = 0 THEN 'x#bad'
                         ELSE CAST(l_orderkey AS VARCHAR) END AS BIGINT) AS parsed_key,
           ROUND(l_extendedprice / NULLIF(l_linenumber % 2, 0), 4)       AS safe_div,
           TRY_CAST(l_returnflag AS DOUBLE)                              AS not_a_number
    FROM lineitem
    """,
)
def q90_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error handling: try_cast on mixed-validity strings and
    try_divide with an intermittent zero divisor — malformed input yields
    NULL instead of failing the job (the dead-letter philosophy of the
    ingest surface applied to scalar expressions). Fractional-string→int
    casts are intentionally excluded: Spark truncates where DuckDB
    rounds, a documented cross-engine trap."""
    t = prep(spark, sf_dir)
    s = F.when(F.col("l_linenumber") % 3 == 0, F.lit("x#bad")).otherwise(
        F.col("l_orderkey").cast("string")
    )
    return t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        s.try_cast("bigint").alias("parsed_key"),
        F.round(
            F.try_divide(F.col("l_extendedprice"), (F.col("l_linenumber") % 2)), 4
        ).alias("safe_div"),
        F.col("l_returnflag").try_cast("double").alias("not_a_number"),
    )


@register(
    "q91_url_parse",
    oracle="""
    WITH u AS (
        SELECT c_custkey,
               'https://' || lower(c_mktsegment) || '.example.com/u/'
                   || CAST(c_custkey AS VARCHAR) || '?seg='
                   || lower(c_mktsegment) || '&n=' || CAST(c_nationkey AS VARCHAR)
                   AS url
        FROM customer
    )
    SELECT c_custkey,
           regexp_extract(url, 'https?://([^/?#]+)', 1)   AS host,
           regexp_extract(url, 'https?://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]n=([^&#]*)', 1)       AS n_param
    FROM u
    """,
)
def q91_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with the dedicated parse_url built-in (host /
    path / single query param) — log-analytics staple. The oracle uses
    regexes, demonstrating the two are equivalent; Spark-side parse_url
    is one codegen'd expression instead of three regex passes."""
    t = prep(spark, sf_dir)
    url = F.concat(
        F.lit("https://"), F.lower("c_mktsegment"), F.lit(".example.com/u/"),
        F.col("c_custkey").cast("string"), F.lit("?seg="), F.lower("c_mktsegment"),
        F.lit("&n="), F.col("c_nationkey").cast("string"),
    )
    u = t["customer"].select("c_custkey", url.alias("url"))
    return u.select(
        "c_custkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("n")).alias("n_param"),
    )


@register(
    "q92_grouping_labels",
    oracle="""
    SELECT COALESCE(l_returnflag, '(all)') AS rf,
           COALESCE(l_linestatus, '(all)') AS ls,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q92_grouping_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING() level indicators — the only way to tell an
    aggregation-level NULL from a data NULL in cube/rollup output, which
    matters once group columns are nullable at scale."""
    t = prep(spark, sf_dir)
    t["lineitem"]  # register the view the SQL below reads
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '(all)') AS rf,
               COALESCE(l_linestatus, '(all)') AS ls,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               ROUND(SUM(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        """
    )


@register(
    "q95_salted_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           CAST(COUNT(*) AS BIGINT)       AS cnt
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q95_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators/skew.salted_sum_count)
    under the correctness gate: the salted rewrite must be semantically
    invisible — identical results to the plain GROUP BY oracle. The salt
    spreads a hot key (think the ingest 'assorted' fallback route) over
    16 reducers; 3 return-flag groups here stand in for the pathological
    case, proving the rewrite, not the skew."""
    from iotgp_func_raw_data_ingest_spark.operators.skew import salted_sum_count

    t = prep(spark, sf_dir)
    out = salted_sum_count(
        t["lineitem"], ["l_returnflag"], "l_extendedprice", "l_orderkey", n_salts=16
    )
    return out.select(
        "l_returnflag",
        F.round("sum_l_extendedprice", 2).alias("sum_price"),
        F.col("cnt"),
    )


@register(
    "q97_range_frame_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ), 4) AS trailing_avg,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_in_window
    FROM events
    """,
)
def q97_range_frame_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour moving average per user — a RANGE (value-bounded)
    window frame, which ROWS frames cannot express over irregular event
    cadence. The DataFrame API's rangeBetween needs a numeric ordering,
    so the frame orders by unix_micros(ts) with a ±μs-exact hour bound;
    RANGE semantics (all peers of a value in-frame) are deterministic
    under ties on both engines."""
    from pyspark.sql.window import Window

    t = prep(spark, sf_dir)
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-hour_us, 0)
    )
    return t["events"].select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.avg("value").over(w), 4).alias("trailing_avg"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


@register(
    "q109_late_supplier_blame",
    oracle="""
    WITH flags AS (
        SELECT l.l_orderkey AS orderkey, l.l_suppkey AS suppkey,
               max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    per_order AS (
        SELECT orderkey, count(*) AS n_supps, sum(is_late) AS n_late
        FROM flags GROUP BY orderkey
    )
    SELECT f.suppkey AS s_suppkey, s.s_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM flags f
    JOIN per_order p USING (orderkey)
    JOIN supplier s ON s.s_suppkey = f.suppkey
    WHERE f.is_late = 1 AND p.n_supps > 1 AND p.n_late = 1
    GROUP BY f.suppkey, s.s_name
    ORDER BY numwait DESC, s_suppkey LIMIT 25
    """,
)
def q109_late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): suppliers
    with a late lineitem (shipped > 60 days after the order date — this
    dataset has no receipt/commit dates) in multi-supplier orders where
    no OTHER supplier was late; top 25 by blamed-order count.

    Q21's textbook form is EXISTS + NOT EXISTS — two extra self-joins of
    the largest table. This plan folds both correlated subqueries into
    one aggregation pipeline: per-(order, supplier) late flags, then
    per-order supplier/late counts, then the blame filter — lineitem is
    scanned ONCE and shuffled once on orderkey (both aggs and the flag
    join share the orderkey partitioning; the supplier dim broadcasts).
    Same rows, one big-table exchange instead of three."""
    t = prep(spark, sf_dir)
    flags = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.max(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
                ).cast("int")
            ).alias("is_late")
        )
    )
    per_order = flags.groupBy("orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"), F.sum("is_late").alias("n_late")
    )
    return (
        flags.join(per_order, "orderkey")
        .filter((F.col("is_late") == 1) & (F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .join(
            F.broadcast(t["supplier"]),
            F.col("suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(25)
    )
