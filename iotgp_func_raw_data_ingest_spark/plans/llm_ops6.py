"""Round-4 tranche, part 2: pipeline QA / monitoring queries — LSH
recall evaluation, duplication-by-length interaction, and the activity
heatmap. Registered now, driver-windowed in a later round (they sort
into plans/__init__._reorder bucket 2 with the rest of q≥139).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import dedup as D
from iotgp_func_raw_data_ingest_spark.operators.textstats import fingerprint
from iotgp_func_raw_data_ingest_spark.plans.llm_ops import (
    _minhash_sql,
    _sql_shingles,
    _SQL_TOKS,
)
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q145_hourly_heatmap",
    oracle="""
    WITH h AS (
        SELECT event_type,
               CAST(dayofweek(ts) AS BIGINT) AS dow,
               CAST(hour(ts) AS BIGINT)      AS hod
        FROM events
    ),
    c AS (
        SELECT event_type, dow, hod, CAST(count(*) AS BIGINT) AS n
        FROM h GROUP BY event_type, dow, hod
    )
    SELECT event_type, dow, hod, n,
           ROUND(n / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE), 4)
               AS share
    FROM c
    """,
)
def q145_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap: event counts by (type, day-of-week, hour-of-day)
    with within-type share — the seasonality fingerprint monitoring
    dashboards draw. Calendar fields are integers extracted from the
    normalized UTC timestamp (DuckDB dayofweek is 0=Sunday; Spark
    dayofweek is 1=Sunday, so Spark subtracts 1 to match).

    100 TB shape: one groupBy over a ≤ types×7×24 key space — pure
    map-side partial aggregation; the share window runs on the tiny
    aggregated relation."""
    t = prep(spark, sf_dir)
    from pyspark.sql.window import Window

    c = (
        t["events"]
        .select(
            "event_type",
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .groupBy("event_type", "dow", "hod")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type")
    return c.select(
        "event_type",
        "dow",
        "hod",
        "n",
        F.round(F.col("n") / F.sum("n").over(w).cast("double"), 4).alias("share"),
    )


@register(
    "q146_duplication_by_length",
    oracle="""
    WITH fp AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f,
               CAST(length(bin(n_chars)) - 1 AS BIGINT) AS len_bucket
        FROM documents WHERE n_chars > 0
    ),
    g AS (SELECT f, count(*) AS copies FROM fp GROUP BY f)
    SELECT fp.len_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN g.copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_duplicated,
           ROUND(sum(CASE WHEN g.copies > 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS dup_rate
    FROM fp JOIN g USING (f)
    GROUP BY fp.len_bucket
    """,
)
def q146_duplication_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication × length interaction: exact-dup rate per log2 char-
    length bucket — short boilerplate duplicates at a very different
    rate than long documents, and this table is what justifies
    length-conditional dedup thresholds. Bucket = length(bin(n))-1
    (integer, q128's trick); a doc is duplicated iff its fingerprint
    group has >1 member.

    100 TB shape: fingerprint groupBy + same-key join (one reused hash
    partitioning), then a ≤64-bucket aggregation."""
    t = prep(spark, sf_dir)
    fp = (
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            fingerprint("text").alias("f"),
            (F.length(F.bin("n_chars")) - 1).cast("long").alias("len_bucket"),
        )
    )
    g = fp.groupBy("f").agg(F.count(F.lit(1)).alias("copies"))
    dup = F.when(F.col("copies") > 1, 1).otherwise(0)
    return (
        fp.join(g, "f")
        .groupBy("len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(dup).alias("n_duplicated"),
            F.round(F.sum(dup) / F.count(F.lit(1)).cast("double"), 4).alias("dup_rate"),
        )
    )


@register(
    "q148_vocab_coverage_curve",
    oracle=f"""
    WITH tok AS (SELECT unnest({_SQL_TOKS}) AS token FROM documents),
    freq AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token),
    ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, token) AS r,
               CAST(sum(n) OVER (ORDER BY n DESC, token
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_n
        FROM freq
    ),
    total AS (SELECT CAST(sum(n) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v FROM freq)
    SELECT k AS vocab_size,
           CAST((SELECT max(cum_n) FROM ranked WHERE r <= k) AS BIGINT) AS covered,
           total.t AS total_tokens,
           ROUND((SELECT max(cum_n) FROM ranked WHERE r <= k)
                 / CAST(total.t AS DOUBLE), 4) AS coverage,
           total.v AS full_vocab
    FROM (SELECT unnest([10, 50, 100, 500, 1000]) AS k), total
    WHERE k <= total.v
    """,
)
def q148_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: for candidate vocab sizes k, what share
    of all token OCCURRENCES the top-k most frequent tokens cover — the
    table that sizes a tokenizer vocabulary (the knee of this curve is
    where OOV rate stops paying for vocab slots). Ranks tie-break on the
    token string; cumulative counts are integers divided once.

    100 TB shape: word-count partial agg, rank window over the small
    distinct-vocab relation (vocab ≪ corpus), and the k-probe is a
    5-row broadcast against that relation — corpus rows shuffle once."""
    t = prep(spark, sf_dir)
    from pyspark.sql.window import Window

    tok = t["documents"].select(F.explode(D.words("text")).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    ranked = freq.select(
        F.row_number().over(w).alias("r"),
        F.sum("n")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_n"),
    )
    # totals ride along as a broadcast 1-row relation instead of a scalar
    # collect — both this agg and `ranked` hang off the same freq groupBy
    # exchange, so ReuseExchange makes the corpus scan+shuffle happen
    # once (previously the collect forced a second full pass).
    totals = freq.agg(
        F.sum("n").alias("total_tokens"), F.count(F.lit(1)).alias("full_vocab")
    )
    ks = spark.createDataFrame(
        [(k,) for k in (10, 50, 100, 500, 1000)], "vocab_size long"
    )
    covered = (
        ranked.join(F.broadcast(ks), ranked.r <= ks.vocab_size)
        .groupBy("vocab_size")
        .agg(F.max("cum_n").alias("covered"))
    )
    return (
        covered.crossJoin(F.broadcast(totals))
        .filter(F.col("vocab_size") <= F.col("full_vocab"))
        .select(
            "vocab_size",
            "covered",
            "total_tokens",
            F.round(
                F.col("covered") / F.col("total_tokens").cast("double"), 4
            ).alias("coverage"),
            "full_vocab",
        )
    )


@register(
    "q149_doc_length_gini",
    oracle="""
    WITH ranked AS (
        SELECT n_chars,
               row_number() OVER (ORDER BY n_chars, doc_id) AS r
        FROM documents
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS total,
               CAST(sum(r * n_chars) AS BIGINT) AS weighted
        FROM ranked
    )
    SELECT n AS n_docs, total AS total_chars,
           ROUND((2.0 * weighted) / (n * CAST(total AS DOUBLE))
                 - (n + 1.0) / n, 4) AS gini
    FROM agg
    """,
)
def q149_doc_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document lengths — the corpus-balance scalar
    (0 = uniform lengths, →1 = a few giants hold all the chars) used to
    detect concatenation bugs or boilerplate floods upstream. Computed
    with the rank formula G = 2·Σ(r·xᵣ)/(n·Σx) − (n+1)/n: every
    aggregate is an exact integer; two float divisions at the end.

    100 TB shape: the rank over n_chars is the only global order; at
    scale replace row_number with a two-phase rank (per-partition ranks
    + broadcast offsets, same trick as q134's prefix sum) — the
    aggregation itself is a 1-row reduce."""
    t = prep(spark, sf_dir)
    from pyspark.sql.window import Window

    ranked = t["documents"].select(
        "n_chars", F.row_number().over(Window.orderBy("n_chars", "doc_id")).alias("r")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("total"),
        F.sum(F.col("r") * F.col("n_chars")).alias("weighted"),
    )
    return agg.select(
        F.col("n").alias("n_docs"),
        F.col("total").alias("total_chars"),
        F.round(
            (2.0 * F.col("weighted")) / (F.col("n") * F.col("total").cast("double"))
            - (F.col("n") + 1.0) / F.col("n"),
            4,
        ).alias("gini"),
    )


@register(
    "q147_lsh_recall_eval",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, {_sql_shingles(3)} AS sh FROM documents
    ),
    sized AS (SELECT doc_id, sh, len(sh) AS n FROM s WHERE len(sh) > 0),
    inv AS (SELECT doc_id, n, unnest(sh) AS g FROM sized),
    truth AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               count(*) AS shared, a.n AS na, b.n AS nb
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id, a.n, b.n
        HAVING ROUND(count(*) / CAST(a.n + b.n - count(*) AS DOUBLE), 4) >= 0.3
    ),
    cand AS ({_minhash_sql(k=3, num_hashes=16, bands=8, threshold=0.3)}),
    j AS (
        SELECT t.id_a, t.id_b,
               ROUND(t.shared / CAST(t.na + t.nb - t.shared AS DOUBLE), 4) AS jac,
               CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS found
        FROM truth t LEFT JOIN cand c
          ON t.id_a = c.id_a AND t.id_b = c.id_b
    )
    SELECT CAST(floor(jac * 10) AS BIGINT) AS jaccard_band,
           CAST(count(*) AS BIGINT)        AS n_true_pairs,
           CAST(sum(found) AS BIGINT)      AS n_found,
           ROUND(sum(found) / CAST(count(*) AS DOUBLE), 4) AS recall
    FROM j GROUP BY floor(jac * 10)
    """,
)
def q147_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality evaluation: recall of the banded MinHash candidate set
    (16 hashes × 8 bands, the q32 configuration) against exact 3-shingle
    Jaccard ≥ 0.3 ground truth, reported per Jaccard band — the curve
    that validates a banding configuration before trusting it at scale
    (theory: collision probability 1-(1-j²)⁸). Both the truth side and
    the candidate side are deterministic, so even this eval op is
    hash-checked.

    100 TB shape: this is an OFFLINE eval run on a sample, not a
    production operator — but both sides still use inverted-index joins
    (truth via shared-shingle self-join, candidates via band buckets),
    so the eval itself scales to a large sample. The left-join
    recall roll-up touches only the true-pair relation."""
    t = prep(spark, sf_dir)
    docs = t["documents"]
    # ONE shingle pass for both sides (guide §1.2): the truth side's
    # inverted index and the candidate side's signatures + verify sets
    # all consume the same (id, shingles) relation, which previously
    # re-tokenized the corpus in three separate subtrees. The eager pin
    # materializes it once; the pin is per-invocation (inside the timed
    # region), not a cross-run cache.
    shingled = D.shingle_frame(docs, "doc_id", "text", k=3).localCheckpoint(
        eager=True
    )
    truth = D.jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.3, shingled=shingled
    )
    cand = D.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, bands=8, threshold=0.3,
        shingled=shingled,
    ).select("id_a", "id_b", F.lit(1).alias("found"))
    j = truth.join(cand, ["id_a", "id_b"], "left").select(
        "id_a", "id_b", "jaccard", F.coalesce("found", F.lit(0)).alias("found")
    )
    return (
        j.groupBy(F.floor(F.col("jaccard") * 10).cast("long").alias("jaccard_band"))
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.sum("found").alias("n_found"),
            F.round(F.sum("found") / F.count(F.lit(1)).cast("double"), 4).alias(
                "recall"
            ),
        )
    )
