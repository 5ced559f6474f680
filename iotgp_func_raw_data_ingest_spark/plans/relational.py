"""Relational operator surface: scans, joins, aggregations, windows, sorts,
set ops, scalar functions — all Spark built-ins, verified against DuckDB.

The reference implements none of these (SURVEY.md §2.6: no joins / aggs /
windows / sorts / SQL) — this module is the relational engine the driver's
correctness gate requires (`__spark_entry__.py`), built DataFrame-first so
Catalyst handles predicate pushdown, column pruning, and join selection.

Scale notes (100 TB design point), applied throughout:
- dimension tables (region/nation/supplier/part/customer) joined via
  ``F.broadcast`` — no shuffle of the fact table for dim joins;
- aggregations are partial (map-side combine) by construction (groupBy.agg);
- top-k = ``orderBy().limit(k)`` which Spark executes as TakeOrderedAndProject
  (per-partition heap + driver merge of k rows, no global sort);
- every filter is an early ``.filter`` on base columns so it reaches the
  parquet scan as a pushed predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


def _r2(c) -> F.Column:
    return F.round(c, 2)


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
        ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
        ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
        ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        ROUND(AVG(l_quantity), 2)                                    AS avg_qty,
        ROUND(AVG(l_extendedprice), 2)                               AS avg_price,
        ROUND(AVG(l_discount), 4)                                    AS avg_disc,
        COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filtered scan → hash aggregate.

    Flagship query. Map-side partial aggregation + AQE-coalesced shuffle;
    the shipdate predicate and 7-column projection push to the parquet scan.
    """
    t = prep(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _r2(F.sum("l_quantity")).alias("sum_qty"),
        _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
        _r2(F.sum(disc_price)).alias("sum_disc_price"),
        _r2(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
        _r2(F.avg("l_quantity")).alias("avg_qty"),
        _r2(F.avg("l_extendedprice")).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q06_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style single-value aggregate over a tightly filtered scan.

    All four predicates push down to parquet (min/max row-group pruning on
    l_shipdate at scale); only 4 columns are read.
    """
    t = prep(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(_r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))


@register(
    "q11_distinct_counts",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(*)                  AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q11_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) alongside plain aggregates (Spark expands to a
    two-phase aggregate; exact, unlike approx_count_distinct)."""
    t = prep(spark, sf_dir)
    return t["orders"].groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count(F.lit(1)).alias("n_orders"),
        _r2(F.sum("o_totalprice")).alias("total"),
    )


@register(
    "q12_rollup_sales",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q12_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grand total + per-flag subtotals)."""
    t = prep(spark, sf_dir)
    return t["lineitem"].rollup("l_returnflag", "l_linestatus").agg(
        _r2(F.sum("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q13_cube_sales",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q13_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    t = prep(spark, sf_dir)
    return t["lineitem"].cube("l_returnflag", "l_linestatus").agg(
        _r2(F.sum("l_extendedprice")).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Scan / filter / project
# ---------------------------------------------------------------------------


@register(
    "q02_selective_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 10
      AND l_returnflag = 'R'
    """,
)
def q02_selective_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan/filter/project — values pass through untouched (exact
    doubles), verifying the read path bit-for-bit against DuckDB."""
    t = prep(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 10)
            & (F.col("l_returnflag") == "R")
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q03_top_revenue_orders",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style 3-way join + aggregate + top-k.

    customer is a dim → broadcast (no shuffle of orders); lineitem⋈orders
    is the one genuine shuffle. Top-k runs as TakeOrderedAndProject.
    """
    t = prep(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_nation_revenue",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q05_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style star join: fact table + 4 broadcast dims.

    Only lineitem⋈orders shuffles; customer/nation/region are broadcast so
    at 100 TB the fact scan streams through map-side hash joins.
    """
    t = prep(spark, sf_dir)
    dims = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "n_name")
    )
    li = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
    orders = t["orders"].select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@register(
    "q04_semi_join",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    GROUP BY o_orderpriority
    """,
)
def q04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): orders having any high-quantity lineitem."""
    t = prep(spark, sf_dir)
    big = t["lineitem"].filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q07_anti_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_inactive
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    GROUP BY c_mktsegment
    """,
)
def q07_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders."""
    t = prep(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"].select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )


@register(
    "q08_outer_join",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey)            AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q08_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving order-less customers, with null-safe agg."""
    t = prep(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _r2(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("spend"),
        )
    )


@register(
    "q09_part_supplier_join",
    oracle="""
    SELECT p.p_brand, s.s_name,
           ROUND(SUM(l.l_quantity), 2) AS qty,
           COUNT(*) AS n
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_size >= 40
    GROUP BY p.p_brand, s.s_name
    """,
)
def q09_part_supplier_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ two broadcast dims with a dim-side filter."""
    t = prep(spark, sf_dir)
    part = t["part"].filter(F.col("p_size") >= 40).select("p_partkey", "p_brand")
    supp = t["supplier"].select("s_suppkey", "s_name")
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand", "s_name")
        .agg(_r2(F.sum("l_quantity")).alias("qty"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "q10_top_orders_per_cust",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o.o_custkey AS c_custkey, o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o.o_custkey
                   ORDER BY o.o_totalprice DESC, o.o_orderkey
               ) AS rn
        FROM orders o
    )
    WHERE rn <= 3
    """,
)
def q10_top_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER window top-n per group (deterministic tiebreak on key).

    Spark pushes the rn<=3 predicate into the window sort as a group-limit
    at scale (WindowGroupLimit), so no full materialization per customer.
    """
    t = prep(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q14_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND(SUM(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_qty
    FROM lineitem
    WHERE l_suppkey <= 3
    """,
)
def q14_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total window with an explicit ROWS frame and a total order
    (shipdate ties broken by the unique (orderkey, linenumber) key so the
    prefix sums are deterministic)."""
    t = prep(spark, sf_dir)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t["lineitem"]
        .filter(F.col("l_suppkey") <= 3)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            _r2(F.sum("l_quantity").over(w)).alias("running_qty"),
        )
    )


@register(
    "q15_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice, 2) AS price,
           ROUND(o_totalprice - LAG(o_totalprice) OVER w, 2)  AS delta_prev,
           ROUND(LEAD(o_totalprice) OVER w, 2)                AS next_price,
           RANK() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS global_rank
    FROM orders
    WHERE o_custkey <= 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q15_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD offsets plus a global RANK in one pass."""
    t = prep(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wg = W.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        t["orders"]
        .filter(F.col("o_custkey") <= 20)
        .select(
            "o_custkey",
            "o_orderkey",
            _r2(F.col("o_totalprice")).alias("price"),
            _r2(F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta_prev"),
            _r2(F.lead("o_totalprice").over(w)).alias("next_price"),
            F.rank().over(wg).alias("global_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k
# ---------------------------------------------------------------------------


@register(
    "q16_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
)
def q16_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: executes as TakeOrderedAndProject (per-partition heaps,
    k-row driver merge — no full sort even at 100 TB)."""
    t = prep(spark, sf_dir)
    return (
        t["lineitem"]
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "q17_set_ops",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
         big_buyers AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                        WHERE o_totalprice > 100000)
    SELECT 'b_and_rich' AS tag, COUNT(*) AS n FROM (SELECT * FROM building INTERSECT SELECT * FROM rich)
    UNION ALL
    SELECT 'b_not_big' AS tag, COUNT(*) AS n FROM (SELECT * FROM building EXCEPT SELECT * FROM big_buyers)
    UNION ALL
    SELECT 'b_or_rich' AS tag, COUNT(*) AS n FROM (SELECT * FROM building UNION SELECT * FROM rich)
    """,
)
def q17_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION DISTINCT over derived key sets."""
    t = prep(spark, sf_dir)
    cust = t["customer"]
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    big_buyers = (
        t["orders"].filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("c_custkey")).distinct()
    )
    a = building.intersect(rich).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("b_and_rich").alias("tag"), "n"
    )
    b = building.subtract(big_buyers).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("b_not_big").alias("tag"), "n"
    )
    c = building.union(rich).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("b_or_rich").alias("tag"), "n"
    )
    return a.unionByName(b).unionByName(c)


# ---------------------------------------------------------------------------
# Scalar function library
# ---------------------------------------------------------------------------


@register(
    "q18_string_date_fns",
    oracle="""
    SELECT o_orderkey,
           UPPER(o_orderpriority)                      AS prio_uc,
           SUBSTR(o_orderstatus, 1, 1)                 AS status_c,
           LENGTH(o_orderpriority)                     AS prio_len,
           CONCAT(o_orderstatus, '-', o_orderpriority) AS status_prio,
           EXTRACT(year FROM o_orderdate)              AS order_year,
           EXTRACT(month FROM o_orderdate)             AS order_month,
           EXTRACT(day FROM o_orderdate)               AS order_day,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_ts
    FROM orders
    WHERE o_orderkey <= 200
    """,
)
def q18_string_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + date scalar functions (upper/substr/length/concat/extract/
    date arithmetic) — all JVM built-ins inside whole-stage codegen."""
    t = prep(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 200)
        .select(
            "o_orderkey",
            F.upper("o_orderpriority").alias("prio_uc"),
            F.substring("o_orderstatus", 1, 1).alias("status_c"),
            F.length("o_orderpriority").alias("prio_len"),
            F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
            F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
            (F.to_date("o_orderdate") + F.expr("INTERVAL 30 DAY"))
            .cast("timestamp")
            .alias("due_ts"),
        )
    )


@register(
    "q19_math_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_discount - 0.05), 6)        AS d_abs,
           CAST(CEIL(l_quantity) AS BIGINT)        AS q_ceil,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
           ROUND(SQRT(l_quantity), 6)              AS q_sqrt,
           ROUND(LN(l_extendedprice), 6)           AS price_ln,
           ROUND(POW(1 + l_tax, 2), 6)             AS tax_sq,
           CAST(l_orderkey % 7 AS BIGINT)          AS key_mod
    FROM lineitem
    WHERE l_orderkey <= 100
    """,
)
def q19_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions; transcendentals rounded to 6 digits to absorb
    last-ulp libm differences between the JVM and DuckDB."""
    t = prep(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("d_abs"),
            F.ceil("l_quantity").alias("q_ceil"),
            F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
            F.round(F.sqrt("l_quantity"), 6).alias("q_sqrt"),
            F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
            F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
            (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
        )
    )


@register(
    "q20_case_when",
    oracle="""
    SELECT
        CASE WHEN c_acctbal < 0 THEN 'debt'
             WHEN c_acctbal < 3000 THEN 'low'
             WHEN c_acctbal < 7000 THEN 'mid'
             ELSE 'high' END AS bal_band,
        COUNT(*) AS n,
        ROUND(AVG(c_acctbal), 2) AS avg_bal
    FROM customer
    GROUP BY 1
    """,
)
def q20_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN banding + aggregate."""
    t = prep(spark, sf_dir)
    band = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        t["customer"]
        .groupBy(band.alias("bal_band"))
        .agg(F.count(F.lit(1)).alias("n"), _r2(F.avg("c_acctbal")).alias("avg_bal"))
    )


@register(
    "q21_json_fns",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 2) AS avg_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def q21_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from a string column (get_json_object — the same
    pattern the ingest surface uses for payload fields)."""
    t = prep(spark, sf_dir)
    k = F.get_json_object("props", "$.k")
    return (
        t["events"]
        .filter(k.isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r2(F.avg(k.cast("double"))).alias("avg_k"),
        )
    )


@register(
    "q22_array_fns",
    oracle="""
    SELECT vec_id,
           len(embedding)                            AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 4)    AS first_val,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 2) AS vec_sum
    FROM embeddings
    WHERE vec_id <= 50
    """,
)
def q22_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (size / element_at / aggregate) over the
    embedding vectors — the JVM-side building blocks the similarity
    operators reuse."""
    t = prep(spark, sf_dir)
    vec_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return (
        t["embeddings"]
        .filter(F.col("vec_id") <= 50)
        .select(
            "vec_id",
            F.size("embedding").cast("long").alias("dim"),
            F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
            _r2(vec_sum).alias("vec_sum"),
        )
    )


@register(
    "q23_events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q23_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation (batch form of the streaming
    windowed agg in streaming/pipeline.py — F.window(ts, '1 hour').start ==
    date_trunc('hour') for aligned windows)."""
    t = prep(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            F.window("ts", "1 hour").start.alias("hour_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), _r2(F.sum("value")).alias("total_value"))
    )


@register(
    "q24_correlated_subquery",
    oracle="""
    SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS price
    FROM orders o
    WHERE o.o_totalprice > 2 * (
        SELECT AVG(o2.o_totalprice) FROM orders o2
        WHERE o2.o_orderpriority = o.o_orderpriority
    )
    """,
)
def q24_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelates to an aggregate + join)."""
    t = prep(spark, sf_dir)
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS price
        FROM orders o
        WHERE o.o_totalprice > 2 * (
            SELECT AVG(o2.o_totalprice) FROM orders o2
            WHERE o2.o_orderpriority = o.o_orderpriority
        )
        """
    )


@register(
    "q25_having_in_subquery",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_custs
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    GROUP BY n.n_name
    HAVING COUNT(*) >= 2
    """,
)
def q25_having_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (→ semi join) + HAVING filter over grouped counts."""
    t = prep(spark, sf_dir)
    open_custs = (
        t["orders"].filter(F.col("o_orderstatus") == "O").select("o_custkey")
    )
    return (
        t["customer"]
        .join(open_custs, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_custs"))
        .filter(F.col("n_custs") >= 2)
    )
