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
