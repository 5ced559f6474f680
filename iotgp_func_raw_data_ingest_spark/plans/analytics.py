"""Round-6 tranche 7: ML-prep and behavioral analytics.

- q217: EMBEDDING GRAM MATRIX — the Σxxᵀ statistic PCA/whitening
  starts from, computed as a single-scan map-side expansion (no
  self-join) over the vector column.
- q218: SESSION PATH MINING — top event-type sequences per session,
  using Spark 4's ordered ``listagg`` aggregate against DuckDB's
  ordered ``string_agg``.

Reference parity: beyond-reference analytics per the SURVEY §2
training-pipeline mandate (the reference has no vector or session
surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q217_embedding_gram",
    oracle="""
    WITH pairs AS (
        SELECT unnest(flatten(list_transform(range(64), i ->
                   list_transform(range(i, 64), j -> {
                       'i': i, 'j': j,
                       'v': CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * 1e6)
                                 AS BIGINT)
                            * CAST(FLOOR(CAST(embedding[j + 1] AS DOUBLE) * 1e6)
                                   AS BIGINT)
                   })))) AS p
        FROM embeddings
    )
    SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
           CAST(SUM(p.v) AS BIGINT) AS gram_e12
    FROM pairs GROUP BY p.i, p.j
    """,
)
def q217_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix Σ x·xᵀ over the embedding corpus — the sufficient
    statistic for PCA/whitening/linear probes (covariance = gram/n −
    μμᵀ, with μ from one more grouped sum).

    Spark-first shape: each vector expands MAP-SIDE into its 2080
    upper-triangle component products (nested transform + flatten +
    one explode — no self-join, no per-row Python), and the only
    shuffle is the partial-aggregated (i, j) rollup: 2080 groups of
    fixed width however large the corpus. Arithmetic is the q194 exact
    fixed-point convention — components floor to int64 micro-units, so
    products and sums are bit-identical across engines (a first attempt
    with 2dp-rounded double sums diverged on .xx5 midpoints: 2080
    near-zero cells make midpoint straddles routine, the q184 lesson).

    100 TB shape: this is the canonical distributed second-moment
    pattern — O(n·d²) flops streamed through map-side combine with a
    d²-row shuffle; d=64 keeps the expansion (2080 doubles/vector)
    smaller than a single raw text field. For d in the thousands,
    switch to block-partitioned BLAS on mapInArrow batches; the
    aggregation contract (sum of per-partition grams) is unchanged."""
    t = prep(spark, sf_dir)
    t["embeddings"]
    return spark.sql(
        """
        WITH pairs AS (
            SELECT explode(flatten(transform(sequence(0, 63), i ->
                       transform(sequence(i, 63), j -> struct(
                           i AS i, j AS j,
                           CAST(FLOOR(CAST(element_at(embedding, i + 1)
                                           AS DOUBLE) * 1e6) AS BIGINT)
                           * CAST(FLOOR(CAST(element_at(embedding, j + 1)
                                             AS DOUBLE) * 1e6) AS BIGINT)
                               AS v
                       ))))) AS p
            FROM embeddings
        )
        SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
               CAST(SUM(p.v) AS BIGINT) AS gram_e12
        FROM pairs GROUP BY p.i, p.j
        """
    )


@register(
    "q218_session_paths",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT *, SUM(brk) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_no
        FROM ordered
    ),
    capped AS (
        SELECT user_id, session_no, ts, event_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, session_no
                   ORDER BY ts, event_id
               ) AS rn
        FROM sess
    ),
    paths AS (
        SELECT user_id, session_no,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM capped WHERE rn <= 8
        GROUP BY user_id, session_no
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
)
def q218_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session paths: the event-type sequence each session walks
    (first 8 steps), counted across all sessions — the behavioral
    pattern-mining pass behind funnel design and bot detection.

    Sessions are the q47 convention (per-user 30-minute inactivity
    gaps, islands-and-gaps via a summed break flag); the path string is
    built with Spark 4's ordered ``listagg`` WITHIN GROUP — the first
    registry use of the new ordered string aggregate — and DuckDB's
    ordered ``string_agg`` must produce byte-identical sequences, which
    only holds because (ts, event_id) makes the order total.

    100 TB shape: two windows and the path aggregate all shuffle on
    user_id (one exchange reused); the path census is a count-then-top-k
    over at most |sessions| short strings — TakeOrderedAndProject, no
    global sort."""
    t = prep(spark, sf_dir)
    t["events"]
    return spark.sql(
        """
        WITH ordered AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                        OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT *, SUM(brk) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_no
            FROM ordered
        ),
        capped AS (
            SELECT user_id, session_no, ts, event_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, session_no
                       ORDER BY ts, event_id
                   ) AS rn
            FROM sess
        ),
        paths AS (
            SELECT user_id, session_no,
                   listagg(event_type, '>')
                       WITHIN GROUP (ORDER BY ts, event_id) AS path
            FROM capped WHERE rn <= 8
            GROUP BY user_id, session_no
        )
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path
        LIMIT 20
        """
    )


@register(
    "q220_gram_blocked",
    oracle="""
    WITH pairs AS (
        SELECT unnest(flatten(list_transform(range(64), i ->
                   list_transform(range(i, 64), j -> {
                       'i': i, 'j': j,
                       'v': CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * 1e6)
                                 AS BIGINT)
                            * CAST(FLOOR(CAST(embedding[j + 1] AS DOUBLE) * 1e6)
                                   AS BIGINT)
                   })))) AS p
        FROM embeddings
    )
    SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
           CAST(SUM(p.v) AS BIGINT) AS gram_e12
    FROM pairs GROUP BY p.i, p.j
    """,
)
def q220_gram_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gram matrix again, through the d≫64 SCALE PATH q217's
    docstring commits to: ``operators/similarity.gram_blocked`` — block-
    partitioned int64 BLAS over ``mapInArrow``, one d²/2-cell partial
    per partition, summed in a 2080-group rollup. Same oracle as q217
    because the operator's contract IS bit-identity with the expression
    plan (exact micro-unit fixed point end to end); a float sneaking
    into the numpy path, a mis-tiled ragged block, or a double-counted
    partition all flip the hash.

    100 TB shape: per-partition work is dense BLAS on (rows × d) int
    tiles — the arithmetic-intensity-optimal layout when d²-per-row
    expression expansion stops fitting; shuffle stays partitions × d²/2
    fixed-width cells regardless of corpus size. This is the deliberate
    Arrow-batch exception to the JVM-only rule (guide: vectorized
    mapInArrow, never per-row Python)."""
    from iotgp_func_raw_data_ingest_spark.operators.similarity import (
        gram_blocked,
    )

    t = prep(spark, sf_dir)
    return gram_blocked(t["embeddings"], "embedding", d=64, block=32)
