"""Relational surface, tranche 3: dead-letter ingest semantics, schema-
union, window/value-function battery, conditional aggregates, regex and
date function batteries, approximate aggregates (rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators.ingest import parse_envelopes
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q53_dead_letter",
    oracle="""
    WITH counts AS (
        SELECT count(*) FILTER (doc_id % 4 = 0) AS env,
               count(*) FILTER (doc_id % 4 = 1) AS raw,
               count(*) FILTER (doc_id % 4 = 2) AS scalar,
               count(*) FILTER (doc_id % 4 = 3) AS arr,
               count(*) AS total
        FROM documents
    )
    SELECT 'routed' AS tag, env + arr AS n FROM counts
    UNION ALL SELECT 'fallback' AS tag, raw AS n FROM counts
    UNION ALL SELECT 'bodies' AS tag, total AS n FROM counts
    """,
)
def q53_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-message error semantics (reference E1, src/function_app.py:
    330-334): enveloped bodies route; non-JSON bodies become fallback
    ``{"Data": body}`` messages; JSON-scalar bodies are dropped; non-dict
    array elements are dropped while their dict siblings survive. The
    output is an audit count per classification (dropped = bodies −
    routed − fallback)."""
    t = prep(spark, sf_dir)
    doc = F.col("doc_id")
    body = (
        F.when(doc % 4 == 0, F.to_json(F.struct(F.lit("Db.T").alias("Source"))))
        .when(doc % 4 == 1, F.concat(F.lit("not json "), doc.cast("string")))
        .when(doc % 4 == 2, F.lit("42"))
        .otherwise(F.concat(F.lit('[{"Source": "A.B"}, 7, "x"]')))
    )
    bodies = t["documents"].select(body.alias("body"))
    msgs = parse_envelopes(bodies)
    classified = msgs.select(
        F.when(F.col("envelope.Source").isNotNull(), "routed")
        .otherwise("fallback")
        .alias("tag")
    )
    counted = classified.groupBy("tag").agg(F.count(F.lit(1)).alias("n"))
    total = bodies.agg(F.count(F.lit(1)).alias("n")).select(F.lit("bodies").alias("tag"), "n")
    return counted.unionByName(total)


@register(
    "q54_union_by_name",
    oracle="""
    WITH u AS (
        SELECT c_custkey AS custkey, c_acctbal AS acctbal, NULL AS o_count
        FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL BY NAME
        SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS o_count
        FROM orders GROUP BY o_custkey
    )
    SELECT custkey,
           ROUND(COALESCE(acctbal, -1), 2) AS acctbal_f,
           COALESCE(o_count, -1) AS o_count_f
    FROM u
    """,
)
def q54_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True) — the reference's N4 schema-
    union-with-null-padding (src/function_app.py:177-191) as a relational
    operator over frames with disjoint columns."""
    t = prep(spark, sf_dir)
    a = (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_acctbal").alias("acctbal"))
    )
    b = t["orders"].groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("o_count")
    )
    u = a.unionByName(b, allowMissingColumns=True)
    return u.select(
        "custkey",
        F.round(F.coalesce("acctbal", F.lit(-1.0)), 2).alias("acctbal_f"),
        F.coalesce("o_count", F.lit(-1)).alias("o_count_f"),
    )


@register(
    "q55_window_value_fns",
    oracle="""
    SELECT o_orderkey,
           ntile(4)       OVER w AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist()    OVER w, 6) AS cdist,
           first_value(o_orderkey) OVER wf AS first_key,
           last_value(o_orderkey)  OVER wf AS last_key,
           nth_value(o_orderkey, 2) OVER wf AS second_key
    FROM orders
    WHERE o_custkey <= 30
    WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q55_window_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + value window functions: ntile, percent_rank, cume_dist,
    first/last/nth_value with an explicit full frame."""
    t = prep(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        t["orders"]
        .filter(F.col("o_custkey") <= 30)
        .select(
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.first("o_orderkey").over(wf).alias("first_key"),
            F.last("o_orderkey").over(wf).alias("last_key"),
            F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
        )
    )


@register(
    "q56_conditional_aggs",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
           bool_or(o_orderstatus = 'F')           AS any_final,
           bool_and(o_totalprice > 0)             AS all_positive,
           arg_max(o_orderkey, o_totalprice)      AS priciest_order,
           arg_min(o_orderkey, o_totalprice)      AS cheapest_order,
           ROUND(SUM(o_totalprice) FILTER (o_orderstatus = 'O'), 2) AS open_value
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q56_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates: count_if, bool_or/bool_and, max_by/min_by
    (argmax/argmin), filtered sums."""
    t = prep(spark, sf_dir)
    return t["orders"].groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_final"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))), 2
        ).alias("open_value"),
    )


@register(
    "q57_regex_battery",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+) ?([a-z]*)', 1)  AS first_word,
           regexp_extract(p_type, '(\\w+)$', 1)             AS last_word,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
           regexp_matches(p_type, '^STANDARD')              AS is_standard,
           regexp_replace(p_name, '[aeiou]', '*', 'g')      AS masked
    FROM part
    WHERE p_partkey <= 150
    """,
)
def q57_regex_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex battery: group extraction, anchors, match-count, rlike,
    global replace."""
    t = prep(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 150)
        .select(
            "p_partkey",
            F.regexp_extract("p_name", r"([a-z]+) ?([a-z]*)", 1).alias("first_word"),
            F.regexp_extract("p_type", r"(\w+)$", 1).alias("last_word"),
            F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]"), 0)).alias("n_vowels"),
            F.col("p_type").rlike("^STANDARD").alias("is_standard"),
            F.regexp_replace("p_name", "[aeiou]", "*").alias("masked"),
        )
    )


@register(
    "q58_date_battery",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + 90 AS TIMESTAMP)  AS due_date,
           CAST(CAST(o_orderdate AS DATE) - 7 AS TIMESTAMP)   AS week_before,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(quarter(o_orderdate) AS INT)                  AS qtr,
           CAST((dayofweek(CAST(o_orderdate AS DATE)) % 7) + 1 AS INT) AS dow_sun1,
           CAST(weekofyear(o_orderdate) AS INT)               AS woy
    FROM orders
    WHERE o_orderkey <= 300
    """,
)
def q58_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date function battery. Cross-engine notes: DuckDB's dayofweek is
    ISO (Mon=1..Sun=7) vs Spark's Sun=1..Sat=7 → oracle maps with
    ``% 7 + 1``; date-typed outputs are cast to timestamp on both sides
    because pandas renders DuckDB DATE as datetime64 but Spark DateType
    as date objects (the compare canonicalizes by value class)."""
    t = prep(spark, sf_dir)
    d = F.to_date("o_orderdate")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 300)
        .select(
            "o_orderkey",
            F.date_add(d, 90).cast("timestamp").alias("due_date"),
            F.date_sub(d, 7).cast("timestamp").alias("week_before"),
            F.datediff(F.lit("1998-12-31").cast("date"), d).cast("long").alias("days_to_eoy"),
            F.trunc(d, "month").cast("timestamp").alias("month_start"),
            F.last_day(d).cast("timestamp").alias("month_end"),
            F.quarter("o_orderdate").alias("qtr"),
            F.dayofweek(d).alias("dow_sun1"),
            F.weekofyear("o_orderdate").alias("woy"),
        )
    )


@register(
    "q59_approx_aggs",
    # Sketch values are engine-specific, so the checkable invariant is the
    # error bound: each engine asserts ITS OWN sketch lands within 5% of
    # its exact counterpart — a hash-comparable boolean on both sides.
    oracle="""
    WITH a AS (
        SELECT l_returnflag,
               approx_count_distinct(l_orderkey)      AS approx_orders,
               approx_quantile(l_extendedprice, 0.5)  AS approx_median
        FROM lineitem GROUP BY l_returnflag
    ),
    e AS (
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS exact_orders,
               median(l_extendedprice)    AS exact_median
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT a.l_returnflag,
           abs(a.approx_orders - e.exact_orders) / e.exact_orders <= 0.10 AS approx_orders_ok,
           abs(a.approx_median - e.exact_median) / e.exact_median <= 0.05 AS approx_median_ok
    FROM a JOIN e USING (l_returnflag)
    """,
)
def q59_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ count-distinct, quantile sketch)
    checked against their exact counterparts via a 5% error-bound boolean.

    Each aggregate family runs as its OWN subtree joined on the 3-row
    group key: a distinct aggregate alongside sketch buffers triggers the
    Expand rewrite and a sort-aggregate fallback (measured 1s+1s → 29s at
    sf0.1), and countDistinct alongside the sort-based exact percentile
    does the same (3.1s fused vs 2.2s split at sf0.1); separate subtrees
    also let their stages overlap. Exact distinct is a two-level group-by
    (partial-agg friendly, no distinct-Expand at all)."""
    t = prep(spark, sf_dir)
    # rsd=0.01: default 5% rsd leaves no margin under the 10% bound
    # (measured 6% deviation on one group at sf0.01)
    approx = t["lineitem"].groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.expr("approx_percentile(l_extendedprice, 0.5)").alias("approx_median"),
    )
    exact_orders = (
        t["lineitem"].groupBy("l_returnflag", "l_orderkey").agg(F.lit(1))
        .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    exact_median = t["lineitem"].groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
    )
    exact = exact_orders.join(exact_median, "l_returnflag")
    return approx.join(F.broadcast(exact), "l_returnflag").select(
        "l_returnflag",
        (F.abs(F.col("approx_orders") - F.col("exact_orders")) / F.col("exact_orders")
         <= 0.05).alias("approx_orders_ok"),
        (F.abs(F.col("approx_median") - F.col("exact_median")) / F.col("exact_median")
         <= 0.05).alias("approx_median_ok"),
    )
