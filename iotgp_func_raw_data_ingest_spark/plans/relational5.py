"""Relational surface, tranche 5: native session windows, forced
sort-merge join (strategy coverage beyond broadcast), and min/max-of-
struct ordering semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


def _r2(c) -> F.Column:
    return F.round(c, 2)


@register(
    "q65_session_window",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WHERE user_id <= 40
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM s GROUP BY user_id, sid
    """,
)
def q65_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native F.session_window (the streaming session operator, batch
    form) vs a gaps-and-islands oracle: session_window merges events
    whose gap is < 30min; window end = last event + gap."""
    t = prep(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("user_id") <= 40)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), _r2(F.sum("value")).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q66_sort_merge_join",
    oracle="""
    SELECT l.l_orderkey,
           o.o_orderpriority,
           ROUND(SUM(l.l_extendedprice), 2) AS order_value,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY l.l_orderkey, o.o_orderpriority
    """,
)
def q66_sort_merge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big join forced to SortMergeJoin via the merge hint — at 100 TB
    lineitem⋈orders cannot broadcast, so this exercises the shuffle-sort
    path the other joins skip (both sides exchange on the join key once;
    the following aggregate reuses that partitioning for l_orderkey)."""
    t = prep(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderpriority")
    li = t["lineitem"].select("l_orderkey", "l_extendedprice")
    return (
        li.join(o.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            _r2(F.sum("l_extendedprice")).alias("order_value"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q67_struct_ordering",
    oracle="""
    SELECT c_mktsegment,
           MIN({'bal': c_acctbal, 'key': c_custkey}).key AS poorest_cust,
           MAX({'bal': c_acctbal, 'key': c_custkey}).key AS richest_cust,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q67_struct_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicographic struct min/max (argmin/argmax without a window):
    both engines order ROW/STRUCT values field-by-field."""
    t = prep(spark, sf_dir)
    s = F.struct(F.col("c_acctbal"), F.col("c_custkey"))
    return t["customer"].groupBy("c_mktsegment").agg(
        F.min(s).getField("c_custkey").alias("poorest_cust"),
        F.max(s).getField("c_custkey").alias("richest_cust"),
        _r2(F.min("c_acctbal")).alias("min_bal"),
        _r2(F.max("c_acctbal")).alias("max_bal"),
    )


@register(
    "q70_map_fns",
    oracle="""
    WITH m AS (
        SELECT o_orderkey,
               MAP {'status': o_orderstatus, 'prio': o_orderpriority} AS props
        FROM orders WHERE o_orderkey <= 200
    )
    SELECT o_orderkey,
           array_to_string(list_sort(map_keys(props)), ',') AS keys_sorted,
           map_extract(props, 'status')[1] AS status_val,
           map_extract(props, 'prio')[1]   AS prio_val,
           CAST(cardinality(props) AS INT) AS n_entries
    FROM m
    """,
)
def q70_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map scalar functions: construction, key listing, element access,
    cardinality — the MapType toolkit the ingest row maps rely on.
    (Map values themselves never appear raw in the output: pandas/hash
    comparison of map cells is engine-specific; keys are sorted.)"""
    t = prep(spark, sf_dir)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("prio"), F.col("o_orderpriority")
    )
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 200)
        .select("o_orderkey", m.alias("props"))
        .select(
            "o_orderkey",
            # stringified: driver canonicalizer can't hash array cells
            F.array_join(F.sort_array(F.map_keys("props")), ",").alias("keys_sorted"),
            F.element_at("props", "status").alias("status_val"),
            F.element_at("props", "prio").alias("prio_val"),
            F.size("props").alias("n_entries"),
        )
    )


@register(
    "q71_full_outer_join",
    oracle="""
    WITH c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 80),
         o AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
               FROM orders WHERE o_custkey <= 120 GROUP BY o_custkey)
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           ROUND(COALESCE(c.c_acctbal, -1), 2) AS acctbal_f,
           COALESCE(o.n_orders, 0)             AS n_orders_f,
           (c.c_custkey IS NULL)               AS only_orders,
           (o.o_custkey IS NULL)               AS only_customer
    FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
    """,
)
def q71_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with disjoint key ranges on each side → rows that
    exist only-left, only-right, and both."""
    t = prep(spark, sf_dir)
    c = t["customer"].filter(F.col("c_custkey") <= 80).select("c_custkey", "c_acctbal")
    o = (
        t["orders"]
        .filter(F.col("o_custkey") <= 120)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.round(F.coalesce("c_acctbal", F.lit(-1.0)), 2).alias("acctbal_f"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders_f"),
        F.isnull("c_custkey").alias("only_orders"),
        F.isnull("o_custkey").alias("only_customer"),
    )


@register(
    "q72_unpivot",
    oracle="""
    SELECT * FROM (
        SELECT p_partkey,
               CAST(p_size AS DOUBLE)      AS size_metric,
               ROUND(p_retailprice, 2)     AS price_metric
        FROM part WHERE p_partkey <= 100
    )
    UNPIVOT (metric_value FOR metric_name IN (size_metric, price_metric))
    """,
)
def q72_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide numeric columns → (name, value) long form."""
    t = prep(spark, sf_dir)
    wide = (
        t["part"]
        .filter(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size_metric"),
            F.round("p_retailprice", 2).alias("price_metric"),
        )
    )
    return wide.unpivot(
        ids=["p_partkey"],
        values=["size_metric", "price_metric"],
        variableColumnName="metric_name",
        valueColumnName="metric_value",
    )


@register(
    "q73_not_in_null_semantics",
    oracle="""
    WITH probe AS (
        SELECT o_custkey,
               CASE WHEN o_custkey % 10 = 0 THEN NULL ELSE o_custkey END AS maybe_null_key
        FROM orders WHERE o_orderkey <= 400
    ),
    excl AS (
        SELECT CASE WHEN c_custkey % 25 = 0 THEN NULL ELSE c_custkey END AS k
        FROM customer WHERE c_custkey <= 50
    )
    SELECT 'not_in_with_nulls' AS tag, count(*) AS n
    FROM probe WHERE maybe_null_key NOT IN (SELECT k FROM excl)
    UNION ALL
    SELECT 'not_in_null_free' AS tag, count(*) AS n
    FROM probe WHERE maybe_null_key NOT IN (SELECT k FROM excl WHERE k IS NOT NULL)
    UNION ALL
    SELECT 'in_with_nulls' AS tag, count(*) AS n
    FROM probe WHERE maybe_null_key IN (SELECT k FROM excl)
    """,
)
def q73_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic trap: NOT IN against a set containing NULL
    matches NOTHING (x <> NULL is unknown) — both engines must agree on
    the classic SQL footgun. Null-free NOT IN and plain IN included for
    contrast."""
    t = prep(spark, sf_dir)
    t["orders"], t["customer"]  # register views for the SQL below
    return spark.sql(
        """
        WITH probe AS (
            SELECT o_custkey,
                   CASE WHEN o_custkey % 10 = 0 THEN NULL ELSE o_custkey END AS maybe_null_key
            FROM orders WHERE o_orderkey <= 400
        ),
        excl AS (
            SELECT CASE WHEN c_custkey % 25 = 0 THEN NULL ELSE c_custkey END AS k
            FROM customer WHERE c_custkey <= 50
        )
        SELECT 'not_in_with_nulls' AS tag, count(*) AS n
        FROM probe WHERE maybe_null_key NOT IN (SELECT k FROM excl)
        UNION ALL
        SELECT 'not_in_null_free' AS tag, count(*) AS n
        FROM probe WHERE maybe_null_key NOT IN (SELECT k FROM excl WHERE k IS NOT NULL)
        UNION ALL
        SELECT 'in_with_nulls' AS tag, count(*) AS n
        FROM probe WHERE maybe_null_key IN (SELECT k FROM excl)
        """
    )


@register(
    "q74_date_parse_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y/%m/%d')                     AS ymd,
           strftime(o_orderdate, '%Y-%m')                        AS ym,
           CAST(strptime(strftime(o_orderdate, '%Y/%m/%d'), '%Y/%m/%d') AS TIMESTAMP) AS reparsed,
           CAST(epoch(o_orderdate) AS BIGINT)                    AS epoch_s
    FROM orders WHERE o_orderkey <= 200
    """,
)
def q74_date_parse_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp formatting and re-parsing round trip + epoch seconds
    (Spark date_format/to_timestamp vs DuckDB strftime/strptime)."""
    t = prep(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 200)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy/MM/dd").alias("ymd"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.to_timestamp(
                F.date_format("o_orderdate", "yyyy/MM/dd"), "yyyy/MM/dd"
            ).alias("reparsed"),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
        )
    )


@register(
    "q75_decimal_aggregation",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS DECIMAL(18, 0))) / 100 AS DOUBLE) AS exact_total,
           -- trunc() made explicit: DuckDB's double->BIGINT cast rounds,
           -- Spark's truncates
           CAST(SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS cents_total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q75_decimal_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent exact aggregation: sums over DECIMAL / integer
    cents are exact regardless of partitioning — the technique for money
    columns where ROUND(SUM(double)) isn't acceptable. The decimal is
    built from explicitly-rounded cents: a direct double→DECIMAL(18,2)
    cast rounds epsilon cases differently across engines."""
    t = prep(spark, sf_dir)
    return t["orders"].groupBy("o_orderpriority").agg(
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)")) / 100
        ).cast("double").alias("exact_total"),
        (
            F.sum((F.col("o_totalprice") * 100).cast("long")).cast("double") / 100
        ).alias("cents_total"),
    )


@register(
    "q76_large_volume_customers",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS total_price,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q76_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery (→ aggregate +
    semi join), then re-join and re-aggregate. Two aggregations over the
    same fact table — Catalyst reuses the exchange."""
    t = prep(spark, sf_dir)
    big_orders = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    li = t["lineitem"].select(F.col("l_orderkey").alias("lk"), "l_quantity")
    return (
        t["orders"]
        .join(big_orders, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("lk"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
    )


@register(
    "q77_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
        SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT SUBSTR(c.c_name, 10, 2) AS name_code,
           COUNT(*) AS n_custs,
           ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)
def q77_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery as a filter + anti join +
    aggregate over a derived key (substring code)."""
    t = prep(spark, sf_dir)
    cust = t["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(t["orders"].select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.substring("c_name", 10, 2).alias("name_code"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "q78_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT l.l_partkey, l.l_suppkey, s.s_name, n.n_name,
               MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE l.l_quantity > 0
        GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
        SELECT *, MIN(unit_cost) OVER (PARTITION BY l_partkey) AS mc FROM costs
    )
    SELECT l_partkey AS partkey, l_suppkey AS suppkey, s_name, n_name,
           ROUND(unit_cost, 6) AS best_unit_cost
    FROM ranked
    WHERE unit_cost = mc
    QUALIFY ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY l_suppkey) = 1
    """,
)
def q78_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated 'minimum over the same relation' —
    expressed as a window min + filter (one pass; the classic decorrelated
    form), with a deterministic pick among tied suppliers."""
    from pyspark.sql import Window as W

    t = prep(spark, sf_dir)
    # Aggregate BEFORE attaching the broadcast dims (guide §2.3): the
    # group key is functionally (l_partkey, l_suppkey) — s_name/n_name
    # hang off l_suppkey 1:1 through inner joins — so grouping the
    # bare lineitem first shuffles narrow (partkey, suppkey, min) rows
    # instead of carrying supplier/nation name strings through the
    # exchange, and the dims broadcast-attach to the one-row-per-part
    # WINNERS at the very end. r12: 2 exchanges -> same count but ~60%
    # fewer bytes through the first, and the dim joins move from the
    # 600k-row pre-window relation to the ~20k-row winner relation.
    #
    # Equivalence is made UNCONDITIONAL (r12 ADVICE) by the broadcast
    # SEMI-join below: the oracle's inner joins run BELOW its window
    # min, so an l_suppkey absent from supplier (or a supplier whose
    # nation is missing) never competes for the minimum. Because MIN is
    # computed independently per (l_partkey, l_suppkey) group, dropping
    # whole phantom GROUPS after the aggregation is identical to
    # dropping their lineitem rows before it — so the semi-join probes
    # the ~80k-group aggregated relation (post-exchange) instead of
    # every lineitem row, at the same unconditional-equivalence
    # guarantee on ANY data, FK-clean or not.
    joinable_supps = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey")
    )
    costs = (
        t["lineitem"]
        .filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
        .join(
            F.broadcast(joinable_supps),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
    )
    w = W.partitionBy("l_partkey")
    w_pick = W.partitionBy("l_partkey").orderBy("l_suppkey")
    return (
        costs.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            "n_name",
            F.round("unit_cost", 6).alias("best_unit_cost"),
        )
    )
