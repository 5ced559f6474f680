"""Relational surface, tranche 8: the remaining classic TPC-H join
shapes adapted to this schema (no partsupp / commitdate / shipmode
columns in the testdata, so Q4/Q11/Q16/Q20 keep their PLAN shape —
EXISTS semi-join, value-share scalar subquery, NOT-IN + distinct
count, doubly-aggregated correlated HAVING — against the columns that
exist), plus a sliding-window document chunker for training-data
prep. All oracle-checked.

Money sums use the penny-exact pattern proven in q115: round each
row's double product once to an integer 1e-4 unit (bit-identical on
both engines), SUM as int64 (order-free), and derive display cents
with integer (+50 div 100) arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


def _rev_e4(price: str = "l_extendedprice", disc: str = "l_discount"):
    """Per-row revenue as an exact int64 count of 1e-4 dollar units."""
    return F.round(F.col(price) * (1 - F.col(disc)) * 10000).cast("long")


@register(
    "q118_returned_item_revenue",
    oracle="""
    WITH rev AS (
        SELECT o.o_custkey,
               SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                        AS BIGINT)) AS e4
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01'
        GROUP BY o.o_custkey
    )
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           ((rev.e4 + 50) // 100) / 100.0 AS revenue,
           c.c_acctbal
    FROM rev
    JOIN customer c ON c.c_custkey = rev.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    ORDER BY rev.e4 DESC, c.c_custkey
    LIMIT 20
    """,
)
def q118_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue
    in a quarter — the who-to-call-first report. Returns-only lineitems
    join their quarter's orders, roll up per customer, then decorate
    with name/nation.

    Scale shape: the only big-big shuffle is lineitem⋈orders on
    orderkey (both sides filtered BEFORE the join — returnflag and the
    date window push to the scans); the per-customer rollup is the
    second and last shuffle, and customer/nation broadcast onto the
    already-tiny aggregate. The top-20 cutoff orders by the EXACT
    integer revenue with a custkey tiebreak, so the limit is
    deterministic — ranking on a float sum would let last-ulp
    reassociation flip the 20th place. TakeOrderedAndProject keeps it
    a per-partition heap, never a global sort."""
    t = prep(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1996-04-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum(_rev_e4()).alias("e4"))
    )
    return (
        rev.join(
            F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey")
        )
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .orderBy(F.desc("e4"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            (F.expr("(e4 + 50) div 100") / 100.0).alias("revenue"),
            "c_acctbal",
        )
    )


@register(
    "q119_priority_late_ships",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q119_priority_late_ships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: how many orders per priority class had at least
    one lineitem shipped more than 60 days after the order date (the
    testdata has no commitdate/receiptdate, so "late" is defined
    against o_orderdate — same EXISTS-decorrelation plan).

    Scale shape: the EXISTS becomes a LEFT SEMI join on orderkey with
    the date comparison inside the join condition — the semi join
    short-circuits per order (no duplicate explosion, no distinct),
    and the six-month window prunes the orders scan before the
    shuffle. The final rollup is 5 rows."""
    t = prep(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q120_part_value_share",
    oracle="""
    WITH v AS (
        SELECT l.l_partkey,
               SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                        AS BIGINT)) AS e4
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, ((e4 + 50) // 100) / 100.0 AS part_value
    FROM v
    WHERE e4 * 2000 > (SELECT SUM(e4) FROM v)
    """,
)
def q120_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue through one region's
    suppliers exceeds 0.05% of that region's total — the
    "important stock" report re-expressed over lineitem (the testdata
    has no partsupp). The signature plan feature survives: a grouped
    aggregate filtered against a scalar subquery over the SAME
    aggregate.

    Scale shape: supplier→nation→region all broadcast (the region
    filter prunes suppliers before the fact scan joins them); one
    shuffle groups by partkey. The scalar total then re-aggregates the
    per-part relation — tiny — and broadcasts back as a literal
    crossjoin, so the threshold filter is map-side. The share test is
    integer (e4*2000 > total_e4): no float threshold, no cross-engine
    cutoff jitter."""
    t = prep(spark, sf_dir)
    asia_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey")
    )
    v = (
        t["lineitem"]
        .join(F.broadcast(asia_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev_e4()).alias("e4"))
    )
    total = v.agg(F.sum("e4").alias("total_e4"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("e4") * 2000 > F.col("total_e4"))
        .select(
            "l_partkey", (F.expr("(e4 + 50) div 100") / 100.0).alias("part_value")
        )
    )


@register(
    "q121_supplier_diversity",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 50)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 3000
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q121_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct (well-capitalized) suppliers
    ship each surviving (brand, type, size) part class — sourcing
    diversity. The part-supplier relation is derived from lineitem
    (no partsupp table); the NOT-IN exclusion keys on account balance
    (the testdata has no supplier comments).

    Scale shape: the NOT IN compiles to a broadcast ANTI join (the
    exclusion list is non-null by construction, so NOT IN ≡ anti
    semantics); part broadcasts with brand/type/size predicates
    already applied at its scan. One shuffle for the distinct-count
    aggregate on the (brand,type,size) grouping — countDistinct
    expands to a two-phase partial-distinct aggregate, no extra
    exchange."""
    t = prep(spark, sf_dir)
    excluded = t["supplier"].filter(F.col("s_acctbal") < 3000).select("s_suppkey")
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 50))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(excluded), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q122_small_qty_revenue",
    oracle="""
    WITH pq AS (
        SELECT l_partkey, count(*) AS cnt, SUM(l_quantity) AS sq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(CAST(ROUND(l.l_extendedprice * 10000) AS BIGINT))
                 / 10000.0 / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN pq ON pq.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND 5 * l.l_quantity * pq.cnt < pq.sq
    """,
)
def q122_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if one brand's
    small-quantity orders (below 20% of that part's mean order
    quantity) moved to bulk. The correlated AVG subquery decorrelates
    into a per-part aggregate joined back to the fact table.

    Scale shape: lineitem is scanned twice — once for the per-part
    (count, sum) profile, once for the probe — and both shuffles hash
    on partkey, so AQE plans a local join for the second stage. The
    20% threshold is tested as 5·qty·cnt < sum(qty): quantities are
    integral doubles, so both sides are exact and the comparison can't
    flip between engines the way qty < 0.2·avg (an order-dependent
    float) could. Single-row output; cents derived from the exact e4
    integer sum."""
    t = prep(spark, sf_dir)
    pq = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pq_partkey"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("l_quantity").alias("sq"),
        )
    )
    brand = t["part"].filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    return (
        t["lineitem"]
        .join(F.broadcast(brand), F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pq_partkey") == F.col("l_partkey"))
        .filter(5 * F.col("l_quantity") * F.col("cnt") < F.col("sq"))
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 10000).cast("long"))
                / 10000.0
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q123_dominant_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l.l_suppkey, l.l_partkey, SUM(l.l_quantity) AS sup_qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%widget%'
          AND l.l_shipdate >= TIMESTAMP '2000-01-01'
          AND l.l_shipdate <  TIMESTAMP '2001-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
    ),
    tot AS (
        SELECT l_partkey, SUM(sup_qty) AS tot_qty FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM shipped sh
    JOIN tot ON tot.l_partkey = sh.l_partkey
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    WHERE 2 * sh.sup_qty > tot.tot_qty
    """,
)
def q123_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than half of some
    widget part's total volume in a year — single-source risk. The
    original's availqty correlation (partsupp) becomes a share-of-part
    correlation, preserving the doubly-nested decorrelation: inner
    GROUP BY (supplier, part), outer total per part, correlated
    HAVING → join.

    Scale shape: `shipped` is repartitioned by partkey BEFORE fanning
    into its two consumers (the per-part total and the share join), so
    the expensive first aggregate materializes ONE exchange both reuse
    — without it the whole subplan runs twice. The share test doubles
    the left side instead of halving the right: quantities are
    integral, 2·x stays exact. Supplier names decorate via broadcast
    at the end; DISTINCT is over suppliers only (tiny)."""
    t = prep(spark, sf_dir)
    widget = t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01"))
            & (F.col("l_shipdate") < F.lit("2001-01-01"))
        )
        .join(F.broadcast(widget), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sup_qty"))
        .repartition("l_partkey")
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("tot_partkey")).agg(
        F.sum("sup_qty").alias("tot_qty")
    )
    return (
        shipped.join(tot, F.col("tot_partkey") == F.col("l_partkey"))
        .filter(2 * F.col("sup_qty") > F.col("tot_qty"))
        .select("l_suppkey")
        .distinct()
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name")
    )


@register(
    "q124_doc_chunking",
    oracle="""
    WITH c AS (
        SELECT doc_id, n_chars,
               unnest(generate_series(0, (n_chars + 383) // 384 - 1)) AS i
        FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(i * 384 AS BIGINT) AS start_char,
           CAST(least(i * 384 + 512, n_chars) AS BIGINT) AS end_char
    FROM c
    """,
)
def q124_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking for embedding/training prep:
    512-char windows with 384-char stride (128 overlap), emitting
    (doc_id, chunk_idx, start, end) spans. The chunk COUNT per doc is
    closed-form — ceil(n_chars/384) — so the generator is pure
    arithmetic; the actual substring extraction is `substr(text,
    start_char+1, 512)` at the consumer, kept out of this plan so the
    span table stays narrow.

    Scale shape: sequence()+explode generates rows with ZERO shuffle —
    each input partition expands locally, and Spark's Generate node
    streams (no per-doc array materialization beyond the chunk-index
    list, bounded at n_chars/384 ints). A 100 TB corpus chunks
    embarrassingly parallel; downstream consumers repartition by
    whatever key they aggregate on."""
    t = prep(spark, sf_dir)
    n_chunks = F.expr("(n_chars + 383) div 384")
    return (
        t["documents"]
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
            "n_chars",
        )
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * 384).alias("start_char"),
            F.least(F.col("chunk_idx") * 384 + 512, F.col("n_chars")).alias(
                "end_char"
            ),
        )
    )
