"""Round-7 tranche 2: SQL parameter-binding surface + composed entity
resolution.

- q224: **parameterized SQL** — ``spark.sql(query, args=...)`` named
  parameter markers (``:cut``), the ``IDENTIFIER(:tbl)`` clause
  resolving a table name from a bound parameter, and ``GROUP BY ALL`` /
  ``ORDER BY ALL``. This is the injection-safe templated-query surface
  a production service should use instead of string interpolation; the
  oracle states the fully-resolved SQL, so the gate proves binding and
  identifier resolution changed nothing.
- q225: **entity resolution, end to end** — the composition the
  individual operators exist for: block → FastSS candidate pairs →
  connected components → survivorship census. Each stage is an
  already-gated operator (q176, q69); the gate here proves the
  COMPOSITION: pair edges feeding the clustering feeding per-cluster
  aggregation, singletons included.

Reference parity: engine-added (SURVEY §2.6); the reference has no
query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q224_parameterized_sql",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(user_id) AS BIGINT) AS sum_uid
    FROM events
    WHERE value > 50.0
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q224_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Templated rollup through bound parameters: the table arrives via
    ``IDENTIFIER(:tbl)`` (catalog-safe name binding — no string
    interpolation), the predicate threshold via ``:cut``, and the
    grouping/ordering through ``GROUP BY ALL`` / ``ORDER BY ALL``
    (every non-aggregate output column, resolution done by the
    analyzer). The oracle is the hand-resolved query.

    100 TB shape: parameter binding is pure front-end — the bound plan
    is byte-identical to the literal one (same pushdown, same pruning),
    which is exactly what the gate asserts. The operational point is
    plan-cache friendliness and injection safety for service-issued
    templated queries."""
    t = prep(spark, sf_dir)
    t["events"]
    return spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(user_id) AS BIGINT) AS sum_uid
        FROM IDENTIFIER(:tbl)
        WHERE value > :cut
        GROUP BY ALL
        ORDER BY ALL
        """,
        args={"tbl": "events", "cut": 50.0},
    )


@register(
    "q225_entity_resolution",
    # The oracle replays the whole pipeline declaratively: quadratic
    # same-block levenshtein pairs (the q176 oracle form), components
    # via the recursive reachability CTE (the q69 oracle form), then
    # survivorship aggregation. The c_custkey < 2000 slice keeps the
    # O(comp^2) reachability enumeration oracle-sized at every SF; the
    # Spark side's operators are the measured 100 TB path regardless.
    oracle="""
    WITH RECURSIVE cust AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal
        FROM customer WHERE c_custkey < 2000
    ),
    p AS (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        FROM cust a JOIN cust b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 2
    ),
    e AS (
        SELECT id_a AS u, id_b AS v FROM p
        UNION ALL SELECT id_b AS u, id_a AS v FROM p
    ),
    reach(u, w) AS (
        SELECT u, v FROM e
        UNION
        SELECT e.u, r.w FROM e JOIN reach r ON r.u = e.v
    ),
    labels AS (
        SELECT u AS c_custkey, least(u, MIN(w)) AS cluster_id
        FROM reach GROUP BY u
    ),
    members AS (
        SELECT c.c_custkey, COALESCE(l.cluster_id, c.c_custkey) AS cluster_id,
               c.c_acctbal
        FROM cust c LEFT JOIN labels l USING (c_custkey)
    ),
    ranked AS (
        SELECT cluster_id, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY c_acctbal DESC, c_custkey)
                   AS rk
        FROM members
    )
    SELECT m.cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MAX(CASE WHEN r.rk = 1 THEN r.c_custkey END) AS BIGINT)
               AS survivor_key,
           ROUND(SUM(m.c_acctbal), 2) AS sum_acctbal
    FROM members m
    JOIN ranked r ON r.cluster_id = m.cluster_id AND r.c_custkey = m.c_custkey
    GROUP BY m.cluster_id
    """,
)
def q225_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution composed from the engine's gated parts: block
    customers by nation, generate radius-2 FastSS candidate pairs on
    the name (``blocked_levenshtein_pairs`` — the q176 operator),
    resolve components with ``cluster_neardups`` (q69's min-label
    propagation), then survivorship: every cluster reports its size,
    its surviving record (max acctbal, ties → min custkey) and its
    merged balance. Unmatched customers are their own single-member
    clusters — an ER output must cover every input entity.

    100 TB shape: each stage is the at-scale path already measured in
    isolation — the FastSS inverted index (no quadratic block join),
    iterative min-label with per-round shuffle ∝ edges, and the
    survivorship pass is one groupBy + window over cluster-partitioned
    rows. Composition adds no new shuffle class: labels join back to
    the entity slice on its key. The deliberate contrast with the
    oracle (quadratic pairs + O(comp²) reachability) is the point —
    same answer, scale-viable plan."""
    from iotgp_func_raw_data_ingest_spark.operators.dedup import (
        blocked_levenshtein_pairs,
        cluster_neardups,
    )

    t = prep(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_custkey") < 2000).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    pairs = blocked_levenshtein_pairs(
        cust, "c_custkey", "c_name", "c_nationkey", max_dist=2
    ).select(F.col("id_a"), F.col("id_b"))
    labels = cluster_neardups(pairs).withColumnRenamed("id", "c_custkey")
    members = cust.join(labels, "c_custkey", "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("c_custkey"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    ranked = members.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.max(F.when(F.col("rk") == 1, F.col("c_custkey")))
        .cast("bigint")
        .alias("survivor_key"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    )
