"""Round-6 tranche: declarative data-quality expectations (q187) and a
fixed-iteration join-based PageRank over the near-dup similarity graph
(q188) — the last two pipeline-shaped capabilities the registry lacked:
a pre-publish row-level data contract, and an iterative graph algorithm
expressed as pure distributed joins (no driver-side loop state beyond
the plan builder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import dedup as D
from iotgp_func_raw_data_ingest_spark.operators import expectations as E
from iotgp_func_raw_data_ingest_spark.operators import graph as G
from iotgp_func_raw_data_ingest_spark.plans.llm_ops8 import _simhash64_sql
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q187_expectations_audit",
    oracle="""
    SELECT 'l_shipdate_not_null' AS expectation,
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) = 0 AS ok
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity_in_range',
           CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'l_discount_le_5pct',
           CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 0.05 THEN 0 ELSE 1 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           SUM(CASE WHEN l_discount BETWEEN 0 AND 0.05 THEN 0 ELSE 1 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'o_status_in_domain',
           CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) = 0
    FROM orders
    UNION ALL
    SELECT 'c_name_format',
           CAST(SUM(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]{9}$') THEN 0 ELSE 1 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           SUM(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]{9}$') THEN 0 ELSE 1 END) = 0
    FROM customer
    UNION ALL
    SELECT 'lineitem_pk_unique',
           CAST(SUM(c - 1) AS BIGINT),
           CAST(SUM(c) AS BIGINT),
           SUM(c - 1) = 0
    FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
    UNION ALL
    SELECT 'l_orderkey_fk_orders',
           CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) = 0
    FROM lineitem l
    LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      ON l.l_orderkey = o.o_orderkey
    """,
)
def q187_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-publish data contract over the TPC-H-ish tables
    (operators/expectations.py): five row-level constraints FUSED into
    one aggregation per table scan (not-null, two ranges, domain
    membership, name format), plus the two that need their own shuffle —
    key uniqueness (a groupBy; the synthetic lineitem deliberately has
    duplicate (l_orderkey, l_linenumber) keys, so this one reports
    nonzero violations and ok=false, proving the audit detects rather
    than asserts) and referential integrity (left-anti join against the
    distinct orders keys).

    100 TB shape: row-level constraints cost one shared scan regardless
    of battery size (conditional counters, map-side partials); the
    report is one row per expectation — violating ROWS never travel to
    the driver."""
    t = prep(spark, sf_dir)
    li, orders, cust = t["lineitem"], t["orders"], t["customer"]

    li_report = E.validate_expectations(
        li,
        [
            E.expect_not_null("l_shipdate_not_null", "l_shipdate"),
            E.expect_between("l_quantity_in_range", "l_quantity", 1, 50),
            E.expect_between("l_discount_le_5pct", "l_discount", 0, 0.05),
            E.expect_unique("lineitem_pk_unique", ["l_orderkey", "l_linenumber"]),
            E.expect_foreign_key(
                "l_orderkey_fk_orders", ["l_orderkey"], orders, ["o_orderkey"]
            ),
        ],
    )
    ord_report = E.validate_expectations(
        orders,
        [E.expect_in_set("o_status_in_domain", "o_orderstatus", ["O", "F", "P"])],
    )
    cust_report = E.validate_expectations(
        cust,
        [E.expect_matches("c_name_format", "c_name", "^Customer#[0-9]{9}$")],
    )
    return li_report.unionByName(ord_report).unionByName(cust_report)


@register(
    "q188_simgraph_pagerank",
    oracle=f"""
    WITH fps AS ({_simhash64_sql()}),
    pairs AS (
        SELECT a.id AS ia, b.id AS ib
        FROM fps a JOIN fps b ON a.id < b.id
        WHERE bit_count(xor(a.sim_hi, b.sim_hi))
              + bit_count(xor(a.sim_lo, b.sim_lo)) <= 3
    ),
    edges AS (
        SELECT ia AS src, ib AS dst FROM pairs
        UNION ALL
        SELECT ib AS src, ia AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT src AS id, 1.0 AS rank FROM deg),
    r1 AS (
        SELECT e.dst AS id, ROUND(0.15 + 0.85 * SUM(r.rank / d.deg), 9) AS rank
        FROM edges e JOIN deg d ON e.src = d.src JOIN r0 r ON r.id = e.src
        GROUP BY e.dst
    ),
    r2 AS (
        SELECT e.dst AS id, ROUND(0.15 + 0.85 * SUM(r.rank / d.deg), 9) AS rank
        FROM edges e JOIN deg d ON e.src = d.src JOIN r1 r ON r.id = e.src
        GROUP BY e.dst
    ),
    r3 AS (
        SELECT e.dst AS id, ROUND(0.15 + 0.85 * SUM(r.rank / d.deg), 9) AS rank
        FROM edges e JOIN deg d ON e.src = d.src JOIN r2 r ON r.id = e.src
        GROUP BY e.dst
    )
    SELECT id AS doc_id, ROUND(rank, 6) AS pagerank FROM r3
    """,
)
def q188_simgraph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank (damping 0.85) over the symmetrized 64-bit
    SimHash near-dup graph — "which documents sit at the center of a
    duplication cluster", the centrality overlay on q113's degree view.

    Iterative-algorithm-as-joins: each iteration is one join of the
    degree-weighted edge relation with the current rank relation plus a
    groupBy(dst) — a bounded, fixed number of shuffles declared up
    front, with NO driver-side collect between iterations (Catalyst
    sees the whole 3-iteration plan and AQE sizes each shuffle). In the
    symmetric graph every node has degree ≥ 1, so the node set is
    closed under iteration and no dangling-mass term is needed.

    Determinism: per-iteration ranks round to 9 decimals on BOTH
    engines, so float summation-order noise (~1e-15 relative) cannot
    compound across iterations; the output rounds to 6.

    100 TB shape: cost is iterations × |E| shuffle, independent of
    iteration count in memory footprint; the edge relation comes from
    the banded simhash64 index (near-linear candidate stream), never
    all-pairs."""
    t = prep(spark, sf_dir)
    pairs = D.simhash64_pairs(
        t["documents"], "doc_id", "text", max_hamming=3
    ).select("id_a", "id_b")
    ranks = G.pagerank_from_pairs(pairs, iterations=3, damping=0.85)
    return ranks.select(
        F.col("id").alias("doc_id"), F.round("rank", 6).alias("pagerank")
    )
