"""Round-7 Spark-4 surface tranche: procedural SQL + SQL-defined
functions — the three extension points left unprobed after round 6's
sweep (recursive CTE, Variant, UDTF, DataSource, state-store reader,
pipe syntax, Observation, XML, collation, approx_top_k).

- q221: **SQL scripting** (``BEGIN … END`` with DECLARE/WHILE/SET,
  Spark 4.x) — loop-carried scalar state fed by per-iteration scalar
  subqueries. The DuckDB oracle replays the identical recursion as a
  recursive CTE, so the gate proves the loop ran in order with exact
  integer arithmetic (an out-of-order iteration or a lost SET flips the
  chained modular hash).
- q222: **SQL scalar UDF** (``CREATE FUNCTION … RETURN <expr>``) —
  Catalyst inlines the body like a macro, so the whole plan stays in
  whole-stage codegen: the 100 TB reason SQL UDFs beat Python UDFs for
  expression-shaped logic. Integer floor-division keeps the score
  cross-engine exact.
- q223: **SQL table UDF + LATERAL** (``RETURNS TABLE … RETURN SELECT``)
  — the declarative sibling of q200's Python UDTF: the expansion logic
  lives in SQL, planned as a lateral generate in the scan stage (no
  Python boundary at all).

Reference parity: none of this exists in the reference (423-line Azure
Function, src/function_app.py) — engine-added SQL surface per SURVEY
§2.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q221_sql_scripting",
    oracle="""
    WITH RECURSIVE seg_aggs AS (
        SELECT c_custkey % 5 AS seg,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c_nationkey) AS BIGINT) AS s
        FROM customer GROUP BY 1
    ),
    rec AS (
        SELECT -1 AS seg, CAST(0 AS BIGINT) AS acc, CAST(1 AS BIGINT) AS chain
        UNION ALL
        SELECT r.seg + 1,
               r.acc + (r.seg + 2)
                   * COALESCE((SELECT n FROM seg_aggs a WHERE a.seg = r.seg + 1), 0),
               (r.chain * 31
                   + COALESCE((SELECT s FROM seg_aggs a WHERE a.seg = r.seg + 1), 0))
                   % 1000000007
        FROM rec r WHERE r.seg < 4
    )
    SELECT CAST(acc AS BIGINT) AS weighted_total,
           CAST(chain AS BIGINT) AS chained_hash
    FROM rec WHERE seg = 4
    """,
)
def q221_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procedural SQL script with loop-carried state: five WHILE
    iterations walk the customer table's custkey-mod-5 segments, each
    SET folding that segment's count and nationkey sum into a weighted
    total and a chained modular hash (chain = chain·31 + sₖ mod p). The
    chained hash is ORDER-SENSITIVE — the gate's DuckDB oracle replays
    the same recursion as a recursive CTE, so a skipped iteration,
    reordered loop, or a subquery evaluated against stale state cannot
    hash-match.

    Execution note: ``spark.sql`` on a script runs the body eagerly
    (each SET's scalar subquery is its own job) and returns the final
    SELECT — this builder is eager by nature of the surface, like the
    materializing writers (q214).

    100 TB shape: scripting is CONTROL FLOW, not a data path — each
    iteration's work is an ordinary Catalyst-planned aggregate (here:
    segment-pruned scans); the loop itself moves only scalars through
    the driver. Use it for orchestration (retry loops, threshold-driven
    reprocessing), never to iterate rows — row iteration belongs in
    joins/windows (q218) or the fixpoint CTE (q198)."""
    t = prep(spark, sf_dir)
    t["customer"]
    return spark.sql(
        """
        BEGIN
          DECLARE seg INT DEFAULT 0;
          DECLARE acc BIGINT DEFAULT 0;
          DECLARE chain BIGINT DEFAULT 1;
          WHILE seg < 5 DO
            SET acc = acc + (seg + 1) * COALESCE(
                (SELECT COUNT(*) FROM customer WHERE c_custkey % 5 = seg), 0);
            SET chain = (chain * 31 + COALESCE(
                (SELECT CAST(SUM(c_nationkey) AS BIGINT) FROM customer
                 WHERE c_custkey % 5 = seg), 0)) % 1000000007;
            SET seg = seg + 1;
          END WHILE;
          SELECT acc AS weighted_total, chain AS chained_hash;
        END
        """
    )


@register(
    "q222_sql_scalar_udf",
    oracle="""
    WITH scored AS (
        SELECT lang,
               CAST(length(text) * 10000
                    // (1 + len(string_split(text, ' '))) AS BIGINT) AS score
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(score) AS BIGINT) AS sum_score,
           CAST(MAX(score) AS BIGINT) AS max_score,
           CAST(SUM(CASE WHEN score > 55000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_wordy
    FROM scored GROUP BY lang
    """,
)
def q222_sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function used in projection AND predicate: a
    crude tokens-per-char quality score (chars·10⁴ floor-divided by the
    whitespace word count — all-integer, so cross-engine exact) is
    declared once as ``CREATE FUNCTION … RETURN <expr>`` and applied
    per document, rolled up per language.

    100 TB shape: Catalyst INLINES the SQL UDF body at analysis time —
    the plan is indistinguishable from writing the expression inline
    (whole-stage codegen, predicate usable for pruning), which is the
    entire case for SQL UDFs over Python UDFs for expression-shaped
    logic: shared vocabulary with zero runtime boundary. The oracle
    states the inlined expression directly, so the gate proves the
    definition/inlining changed nothing."""
    t = prep(spark, sf_dir)
    t["documents"]
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION q222_quality(t STRING)
        RETURNS BIGINT
        RETURN CAST(length(t) AS BIGINT) * 10000
               DIV (1 + size(split(t, ' ')))
        """
    )
    return spark.sql(
        """
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(q222_quality(text)) AS BIGINT) AS sum_score,
               CAST(MAX(q222_quality(text)) AS BIGINT) AS max_score,
               CAST(SUM(CASE WHEN q222_quality(text) > 55000 THEN 1 ELSE 0
                        END) AS BIGINT) AS n_wordy
        FROM documents GROUP BY lang
        """
    )


@register(
    "q223_sql_table_udf",
    oracle="""
    WITH terms AS (
        SELECT doc_id,
               unnest(string_split(lower(text), ' ')) AS term
        FROM documents WHERE doc_id < 500
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM terms
    WHERE length(term) > 3
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 20
    """,
)
def q223_sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL table function applied laterally: ``q223_terms(t)`` RETURNS
    TABLE(term) expands a document into its lowercase whitespace terms;
    a LATERAL join runs it per row of the doc_id<500 slice and the
    outer query builds the >3-char term census (top 20, count-desc with
    the term itself as the deterministic tiebreak).

    100 TB shape: the TVF body is planned as a lateral GENERATE inside
    the scan stage — same zero-shuffle expansion as writing
    explode(split(…)) inline, no Python boundary (contrast q200's
    Arrow UDTF, measured 27× slower at the 2M tier: STRESS.md). The
    reason to prefer the SQL TVF wherever the expansion logic is
    expressible: it composes like a relation but costs like an
    expression. Census then shuffles once on the term and top-k rides
    TakeOrderedAndProject."""
    t = prep(spark, sf_dir)
    t["documents"]
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION q223_terms(t STRING)
        RETURNS TABLE(term STRING)
        RETURN SELECT explode(split(lower(t), ' ')) AS term
        """
    )
    return spark.sql(
        """
        SELECT c.term,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT d.doc_id) AS BIGINT) AS n_docs
        FROM documents d, LATERAL q223_terms(d.text) c
        WHERE d.doc_id < 500 AND length(c.term) > 3
        GROUP BY c.term
        ORDER BY n DESC, term
        LIMIT 20
        """
    )
