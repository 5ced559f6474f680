"""Round-6 tranche 5: training-loader determinism operators.

The data loader side of a 100 TB pretraining run needs two properties
the lake queries so far don't gate: a SEEDED, REPRODUCIBLE global
shuffle (every epoch visits the corpus in a new but replayable order)
and a DETERMINISTIC SOURCE-MIXTURE SCHEDULE (which document of which
source occupies step t).  Both are pure hash/window arithmetic — no
RNG state, no driver loops — so any engine (or a restarted job) can
re-derive the exact same order.

- q205: seeded epoch shuffle → shard assignment + per-shard audit.
- q206: round-robin source interleave → the first 64 steps of the
  mixture schedule.
- q215: WEIGHTED mixture via integer stride scheduling (virtual time
  = rank · lcm/weight).
- q216: exact-size proportional quotas via largest-remainder
  (Hamilton) apportionment — all-integer, sums exactly to the target.

Reference parity: the reference engine (src/function_app.py) has no
training-loader surface; this extends SURVEY §2's training-pipeline
mandate alongside dedup/packing (q111) and curation (q169).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q205_epoch_shuffle",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               md5('epoch:7:' || CAST(doc_id AS VARCHAR)) AS k
        FROM documents
    )
    SELECT substr(k, 1, 1) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(arg_min(doc_id, k) AS BIGINT) AS first_doc,
           CAST(arg_max(doc_id, k) AS BIGINT) AS last_doc
    FROM keyed GROUP BY substr(k, 1, 1)
    """,
)
def q205_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded reproducible epoch shuffle with shard audit.

    Every document gets a pseudo-random but fully deterministic shuffle
    key md5('epoch:<seed>:' || doc_id); the first hex nibble assigns it
    to one of 16 loader shards.  The query audits each shard: size,
    char mass, and the first/last document in key order (min_by/max_by
    on the key) — so a changed seed, a hash mismatch between runs, or a
    shard boundary drift all flip the gate.  A new epoch is a new seed
    string: a fresh, replayable permutation with zero stored state.

    100 TB shape: the shuffle never materializes a global sort — shard
    assignment is a map-side expression, and the trainer materializes
    shards with repartitionByRange(k) + partitioned write (each shard
    internally key-sorted via sortWithinPartitions, giving the full
    epoch order without any single-partition stage). This audit query
    itself is one scan + a 16-group aggregate."""
    t = prep(spark, sf_dir)
    t["documents"]
    return spark.sql(
        """
        WITH keyed AS (
            SELECT doc_id, n_chars,
                   md5(concat('epoch:7:', CAST(doc_id AS STRING))) AS k
            FROM documents
        )
        SELECT substring(k, 1, 1) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(min_by(doc_id, k) AS BIGINT) AS first_doc,
               CAST(max_by(doc_id, k) AS BIGINT) AS last_doc
        FROM keyed GROUP BY substring(k, 1, 1)
        """
    )


@register(
    "q206_mixture_schedule",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('mix:3:' || CAST(doc_id AS VARCHAR))
               ) AS step
        FROM documents
    )
    SELECT CAST(step AS BIGINT) AS step, source,
           CAST(doc_id AS BIGINT) AS doc_id
    FROM ranked
    ORDER BY step, source
    LIMIT 64
    """,
)
def q206_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixture schedule (round-robin interleave).

    Within each source, documents are put in seeded-shuffle order
    (ROW_NUMBER over the md5 key); the global training order then
    interleaves sources round-robin — step t serves each source's t-th
    shuffled document.  The gate pins the first 64 (step, source) slots
    exactly: a different per-source permutation, an unstable window
    ordering, or a tie-broken-differently rank all change which doc_id
    occupies a slot.

    Uniform round-robin is the base case; weighted mixtures reuse the
    same shape with step = row_number scaled by 1/weight (the schedule
    stays a pure expression of (doc_id, source, seed)).

    100 TB shape: the window partitions by source — parallel across
    sources, and within a source the rank is computed by
    sort-within-partition after a repartition on source (skewed giant
    sources would range-partition the key instead, the q205 note).
    The top-64 slice compiles to TakeOrderedAndProject — no global
    materialization."""
    t = prep(spark, sf_dir)
    t["documents"]
    return spark.sql(
        """
        WITH ranked AS (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(concat('mix:3:', CAST(doc_id AS STRING)))
                   ) AS step
            FROM documents
        )
        SELECT CAST(step AS BIGINT) AS step, source,
               CAST(doc_id AS BIGINT) AS doc_id
        FROM ranked
        ORDER BY step, source
        LIMIT 64
        """
    )


@register(
    "q215_weighted_mixture",
    oracle="""
    WITH w AS (
        SELECT doc_id, source,
               6 // (1 + CAST(substr(source, 4) AS INT) % 3) AS stride,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('mix:5:' || CAST(doc_id AS VARCHAR))
               ) AS rnk
        FROM documents
    )
    SELECT CAST(rnk * stride AS BIGINT) AS vt,
           source,
           CAST(rnk AS BIGINT) AS rnk,
           CAST(doc_id AS BIGINT) AS doc_id
    FROM w
    ORDER BY vt, source
    LIMIT 60
    """,
)
def q215_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED source mixture schedule — the general form of q206's
    uniform round-robin, still a pure integer expression.

    Each source gets a weight w ∈ {1,2,3} (derived deterministically
    from its id); a source's t-th document is scheduled at virtual time
    t · (L/w) with L = lcm of the weights, so a weight-3 source serves
    three documents for every one from a weight-1 source — the
    stride-scheduling identity, exact in integers, no RNG state.  The
    gate pins the first 60 (vt, source) slots: a drifted per-source
    permutation, a mis-scaled stride, or an unstable tiebreak all
    change which doc_id fills a slot.

    100 TB shape: identical to q205/q206 — the schedule is a pure
    expression of (seed, source, doc_id); a trainer materializes any
    window of it with a filter on vt, no global sort (TopK compiles to
    TakeOrderedAndProject here)."""
    t = prep(spark, sf_dir)
    t["documents"]
    return spark.sql(
        """
        WITH w AS (
            SELECT doc_id, source,
                   6 DIV (1 + CAST(substring(source, 4) AS INT) % 3) AS stride,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(concat('mix:5:', CAST(doc_id AS STRING)))
                   ) AS rnk
            FROM documents
        )
        SELECT CAST(rnk * stride AS BIGINT) AS vt,
               source,
               CAST(rnk AS BIGINT) AS rnk,
               CAST(doc_id AS BIGINT) AS doc_id
        FROM w
        ORDER BY vt, source
        LIMIT 60
        """
    )


@register(
    "q216_quota_allocation",
    oracle="""
    WITH c AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ),
    b AS (
        SELECT source, n_docs,
               (100 * n_docs) // (SUM(n_docs) OVER ()) AS base,
               (100 * n_docs) % (SUM(n_docs) OVER ()) AS rem
        FROM c
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr,
               100 - SUM(base) OVER () AS leftover
        FROM b
    )
    SELECT source, n_docs,
           CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS quota
    FROM r
    """,
)
def q216_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size proportional quota allocation (largest-remainder /
    Hamilton apportionment) — 'sample exactly 100 documents,
    proportional to source sizes' without floating point.

    Each source's base quota is floor(100·n_s / T); the leftover seats
    go to the largest integer remainders (100·n_s mod T), tie-broken by
    source name.  All arithmetic is integer, so both engines agree
    bit-for-bit and the quotas always sum to exactly 100 — the property
    a downstream exact-size sampler (q93's hash-order selection per
    source) depends on.

    100 TB shape: one grouped count (partial-agg), then window ranking
    over |sources| rows — the allocation is metadata-sized regardless
    of corpus size; the totals ride empty-frame windows over the tiny
    grouped relation, so the plan has no join at all."""
    t = prep(spark, sf_dir)
    t["documents"]
    return spark.sql(
        """
        WITH c AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
        ),
        b AS (
            SELECT source, n_docs,
                   (100 * n_docs) DIV (SUM(n_docs) OVER ()) AS base,
                   (100 * n_docs) % (SUM(n_docs) OVER ()) AS rem
            FROM c
        ),
        r AS (
            SELECT *,
                   ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr,
                   100 - SUM(base) OVER () AS leftover
            FROM b
        )
        SELECT source, n_docs,
               CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
                   AS quota
        FROM r
        """
    )
