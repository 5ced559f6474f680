"""Relational surface, tranche 4: statistical aggregates, array function
battery, sorted collect/string-agg, bitwise aggregates, posexplode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q60_stats_aggs",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6)        AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 3)  AS qty_price_covar,
           ROUND(covar_pop(l_quantity, l_extendedprice), 3)   AS qty_price_covar_pop,
           ROUND(stddev_samp(l_extendedprice), 4)             AS price_stddev,
           ROUND(stddev_pop(l_extendedprice), 4)              AS price_stddev_pop,
           ROUND(var_samp(l_discount), 6)                     AS disc_var,
           ROUND(skewness(l_quantity), 3) + 0.0               AS qty_skew,
           ROUND(kurtosis(l_quantity), 3) + 0.0               AS qty_kurt
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q60_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr/covar/stddev/var/skewness/kurtosis).
    Both engines use the same moment conventions; skew/kurt rounded to 3
    decimals to absorb float-summation-order noise in the higher moments."""
    t = prep(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 3).alias("qty_price_covar"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 3).alias("qty_price_covar_pop"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.stddev_pop("l_extendedprice"), 4).alias("price_stddev_pop"),
        F.round(F.var_samp("l_discount"), 6).alias("disc_var"),
        # + 0.0 canonicalizes IEEE negative zero (round can yield -0.0 on
        # one engine and +0.0 on the other → value-hash mismatch)
        (F.round(F.skewness("l_quantity"), 3) + 0.0).alias("qty_skew"),
        (F.round(F.kurtosis("l_quantity"), 3) + 0.0).alias("qty_kurt"),
    )


@register(
    "q61_array_battery",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
        FROM documents WHERE doc_id <= 100
    )
    SELECT doc_id,
           CAST(len(toks) AS INT)                                   AS n,
           COALESCE(array_to_string(list_sort(list_distinct(toks)), ','), '')  AS uniq_sorted,
           CAST(list_position(toks, 'the') AS INT)                  AS the_pos,
           list_contains(toks, 'data')                              AS has_data,
           COALESCE(array_to_string(toks[2:4], ','), '')            AS mid_slice,
           COALESCE(array_to_string(list_sort(list_distinct(list_intersect(toks, ['the', 'a', 'data', 'spark']))), ','), '') AS kw_hits,
           COALESCE(array_to_string(flatten([toks[1:2], toks[-2:]]), ','), '') AS ends
    FROM t
    """,
)
def q61_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery: size, sorted distinct, position, contains, slice,
    intersect, flatten. DuckDB's list_distinct is unordered → both sides
    sort before comparing; DuckDB slices are inclusive (2:4 = 3 elems =
    Spark slice(start=2, length=3))."""
    t = prep(spark, sf_dir)
    from iotgp_func_raw_data_ingest_spark.operators.dedup import words

    toks = words("text")
    d = t["documents"].filter(F.col("doc_id") <= 100).select("doc_id", toks.alias("toks"))
    tk = F.col("toks")
    # Array outputs serialized with array_join: the driver's canonicalizer
    # cannot hash array-typed cells (round-1 red).
    return d.select(
        "doc_id",
        F.size(tk).alias("n"),
        F.array_join(F.array_sort(F.array_distinct(tk)), ",").alias("uniq_sorted"),
        F.array_position(tk, "the").cast("int").alias("the_pos"),
        F.array_contains(tk, "data").alias("has_data"),
        F.array_join(F.slice(tk, 2, 3), ",").alias("mid_slice"),
        F.array_join(
            F.array_sort(
                F.array_distinct(F.array_intersect(tk, F.array(*[F.lit(w) for w in ["the", "a", "data", "spark"]])))
            ),
            ",",
        ).alias("kw_hits"),
        F.array_join(F.flatten(F.array(F.slice(tk, 1, 2), F.slice(tk, -2, 2))), ",").alias("ends"),
    )


@register(
    "q62_collect_sorted",
    oracle="""
    SELECT n_name,
           string_agg(c_name, ',' ORDER BY c_name)            AS members,
           array_to_string(list_sort(list(c_custkey)), ',')   AS custkeys,
           CAST(count(*) AS BIGINT)                           AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey <= 60
    GROUP BY n_name
    """,
)
def q62_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / string-agg made deterministic by sorting the
    collected values (collect order is nondeterministic by contract)."""
    t = prep(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_custkey") <= 60)
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("members"),
            # int→string cast is engine-consistent (unlike double→string)
            F.array_join(
                F.transform(F.array_sort(F.collect_list("c_custkey")), lambda x: x.cast("string")), ","
            ).alias("custkeys"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q63_bitwise_aggs",
    oracle="""
    SELECT event_type,
           bit_and(CAST(event_id % 256 AS BIGINT)) AS band,
           bit_or(CAST(event_id % 256 AS BIGINT))  AS bor,
           bit_xor(CAST(event_id % 256 AS BIGINT)) AS bxor
    FROM events
    GROUP BY event_type
    """,
)
def q63_bitwise_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates."""
    t = prep(spark, sf_dir)
    b = (F.col("event_id") % 256).cast("long")
    return t["events"].groupBy("event_type").agg(
        F.bit_and(b).alias("band"),
        F.bit_or(b).alias("bor"),
        F.bit_xor(b).alias("bxor"),
    )


@register(
    "q64_posexplode",
    oracle="""
    SELECT doc_id,
           CAST(unnest(generate_series(0, len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) - 1)) AS INT) AS pos,
           unnest(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS tok
    FROM documents
    WHERE doc_id <= 50
    """,
)
def q64_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: token stream with positions (DuckDB zips parallel
    unnests; Spark emits (pos, col) directly)."""
    t = prep(spark, sf_dir)
    from iotgp_func_raw_data_ingest_spark.operators.dedup import words

    return (
        t["documents"]
        .filter(F.col("doc_id") <= 50)
        .select("doc_id", F.posexplode(words("text")).alias("pos", "tok"))
    )
