"""Relational surface, tranche 2: pivot, grouping sets, percentiles,
as-of join, range join, sessionization, argmax-dedup, extended string
functions, null semantics, sliding windows, TF-IDF.

Same contract as relational.py: DataFrame-first Spark plans with exact
DuckDB oracles (floats rounded both sides, unique-key tiebreaks on every
top-k/window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators.asof import asof_join
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


def _r2(c) -> F.Column:
    return F.round(c, 2)


@register(
    "q42_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_quantity) FILTER (l_linestatus = 'O'), 2) AS qty_O,
           ROUND(SUM(l_quantity) FILTER (l_linestatus = 'F'), 2) AS qty_F,
           COUNT(*) FILTER (l_linestatus = 'O') AS n_O,
           COUNT(*) FILTER (l_linestatus = 'F') AS n_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q42_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (no extra pass to discover pivot
    values — required at scale) and two aggregates per cell."""
    t = prep(spark, sf_dir)
    p = (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            _r2(F.sum("l_quantity")).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return p.select(
        "l_returnflag",
        F.col("O_qty").alias("qty_O"),
        F.col("F_qty").alias("qty_F"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_O"),
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_F"),
    )


@register(
    "q43_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def q43_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube)."""
    t = prep(spark, sf_dir)
    t["lineitem"]  # register the view the SQL below reads
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "q44_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(median(o_totalprice), 2) AS median_price,
           array_to_string(list_transform(quantile_cont(o_totalprice, [0.25, 0.5, 0.75]),
                                          x -> printf('%.2f', ROUND(x, 2))), ',') AS quartiles,
           ROUND(min(o_totalprice), 2) AS min_price,
           ROUND(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q44_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median + quartile array) — Spark
    `percentile` and DuckDB `quantile_cont` share linear interpolation."""
    t = prep(spark, sf_dir)
    return t["orders"].groupBy("o_orderpriority").agg(
        _r2(F.expr("percentile(o_totalprice, 0.5)")).alias("median_price"),
        # Serialized to one string: the driver's canonicalizer cannot hash
        # array-typed cells. round() BEFORE %.2f: the engines' quantile
        # interpolation differs in the last ulp, and printf half-rounding
        # of a raw .xx5-boundary double diverges (Java HALF_UP vs C
        # half-even); a 2dp-rounded double is never near a format
        # boundary, and round() itself is cross-engine-stable (q44 r1).
        F.expr(
            "concat_ws(',', transform(percentile(o_totalprice, array(0.25, 0.5, 0.75)),"
            " x -> format_string('%.2f', round(x, 2))))"
        ).alias("quartiles"),
        _r2(F.min("o_totalprice")).alias("min_price"),
        _r2(F.max("o_totalprice")).alias("max_price"),
    )


@register(
    "q45_asof_join",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderdate,
               max(o_orderkey) AS o_orderkey,
               arg_max(o_totalprice, o_orderkey) AS o_totalprice
        FROM orders
        GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS last_order_key,
           o.o_totalprice AS last_order_price
    FROM events e
    ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    WHERE e.user_id <= 50
    """,
)
def q45_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each event gets the user's most
    recent order at-or-before the event time — union + sort + carry-
    forward window, one shuffle, vs DuckDB's native ASOF JOIN."""
    t = prep(spark, sf_dir)
    events = t["events"].filter(F.col("user_id") <= 50).select("event_id", "user_id", "ts")
    out = asof_join(
        events,
        t["orders"],
        key_left="user_id",
        key_right="o_custkey",
        time_left="ts",
        time_right="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("last_order_key"),
        F.col("o_totalprice").alias("last_order_price"),
    )


@register(
    "q46_range_join",
    oracle="""
    SELECT o.o_orderkey,
           COUNT(*) AS n_shipped,
           ROUND(SUM(l.l_extendedprice), 2) AS shipped_value
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderkey
    """,
)
def q46_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + time-range join: lineitems shipped within 60 days of their
    order. The equi key keeps it a hash/sort-merge join (the range is a
    post-join predicate); a pure range join at scale would bucket the
    time axis and join on (key, bucket)."""
    t = prep(spark, sf_dir)
    o = t["orders"].select("o_orderkey", "o_orderdate")
    li = t["lineitem"].select("l_orderkey", "l_shipdate", "l_extendedprice")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_shipped"),
            _r2(F.sum("l_extendedprice")).alias("shipped_value"),
        )
    )


@register(
    "q47_sessionize",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WHERE user_id <= 30
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts, event_id,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
)
def q47_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via gaps-and-islands (lag → flag → running
    sum) — the batch twin of streaming session_window, exactly SQL-
    replayable unlike the stateful streaming operator."""
    t = prep(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = (
        t["events"]
        .filter(F.col("user_id") <= 30)
        .withColumn(
            "new_sess",
            F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "q48_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM events
    WHERE user_id <= 100
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q48_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic argmax-dedup: latest event per user with a unique-key
    tiebreak (the correct replacement for dropDuplicates' arbitrary pick)."""
    t = prep(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        t["events"]
        .filter(F.col("user_id") <= 100)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@register(
    "q49_string_fns2",
    oracle="""
    SELECT p_partkey,
           reverse(p_brand)                       AS brand_rev,
           replace(p_type, ' ', '_')              AS type_us,
           translate(p_brand, '#', '-')           AS brand_tr,
           lpad(CAST(p_size AS VARCHAR), 4, '0')  AS size_pad,
           rpad(p_brand, 12, '.')                 AS brand_pad,
           split_part(p_type, ' ', 1)             AS type_first,
           left(p_name, 5)                        AS name_l,
           right(p_name, 3)                       AS name_r,
           CAST(strpos(p_type, ' ') AS INT)       AS first_space
    FROM part
    WHERE p_partkey <= 150
    """,
)
def q49_string_fns2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string function battery (reverse/replace/translate/pads/
    split_part/left/right/instr)."""
    t = prep(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 150)
        .select(
            "p_partkey",
            F.reverse("p_brand").alias("brand_rev"),
            F.regexp_replace("p_type", " ", "_").alias("type_us"),
            F.translate("p_brand", "#", "-").alias("brand_tr"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
            F.rpad("p_brand", 12, ".").alias("brand_pad"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first"),
            F.substring("p_name", 1, 5).alias("name_l"),
            F.substring("p_name", -3, 3).alias("name_r"),
            F.instr("p_type", " ").alias("first_space"),
        )
    )


@register(
    "q50_null_semantics",
    oracle="""
    WITH e AS (
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS kv,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS et
        FROM events WHERE event_id <= 500
    )
    SELECT event_id,
           COALESCE(kv, -1)                    AS kv_or_default,
           NULLIF(et, 'view')                  AS et_not_view,
           (kv IS NOT DISTINCT FROM 87)        AS k_is_87,
           (et IS NULL)                        AS et_null,
           CASE WHEN et IS NULL THEN 'missing' ELSE et END AS et_filled
    FROM e
    """,
)
def q50_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling battery: coalesce, nullif, null-safe equality (<=>),
    explicit null tests."""
    t = prep(spark, sf_dir)
    e = (
        t["events"]
        .filter(F.col("event_id") <= 500)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("kv"),
            F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("event_type")).alias("et"),
        )
    )
    return e.select(
        "event_id",
        F.coalesce("kv", F.lit(-1)).alias("kv_or_default"),
        F.nullif(F.col("et"), F.lit("view")).alias("et_not_view"),
        F.col("kv").eqNullSafe(F.lit(87)).alias("k_is_87"),
        F.isnull("et").alias("et_null"),
        F.when(F.isnull("et"), "missing").otherwise(F.col("et")).alias("et_filled"),
    )


@register(
    "q51_sliding_window",
    oracle="""
    SELECT date_trunc('hour', ts) - to_hours(off.i) AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS i) off
    GROUP BY 1, 2
    """,
)
def q51_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (2h size, 1h slide): each event lands in
    two overlapping windows — batch twin of the streaming sliding agg."""
    t = prep(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            F.window("ts", "2 hours", "1 hour").start.alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), _r2(F.sum("value")).alias("total_value"))
    )


@register(
    "q52_tfidf",
    oracle="""
    WITH tf AS (
        SELECT doc_id, tok AS term, COUNT(*) AS tf
        FROM (SELECT doc_id,
                     unnest(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS tok
              FROM documents)
        GROUP BY doc_id, tok
    ),
    df AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tf) GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 4) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
)
def q52_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-native TF-IDF with smoothed IDF; top-5 terms per doc.

    tf: one shuffle on (doc, term); df: aggregate of the same relation
    (exchange reuse); N broadcast as a 1-row crossJoin. No MLlib needed —
    and unlike HashingTF there are no hash collisions to un-verify.
    """
    t = prep(spark, sf_dir)
    from iotgp_func_raw_data_ingest_spark.operators.dedup import words

    toks = t["documents"].select(
        "doc_id", F.explode(words("text")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.select("doc_id", "term").groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = t["documents"].agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0), 4
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "term", "tfidf", "rank")
    )
