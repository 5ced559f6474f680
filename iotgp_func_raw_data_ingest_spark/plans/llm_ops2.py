"""LLM-data-pipeline queries, part 2: corpus-hygiene operators a
training-data pipeline runs before anything reaches a tokenizer —
benchmark-contamination detection, PII redaction, repetition filtering,
and winnowing fingerprints. All JVM built-ins; every query oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators.barrier import generate_barrier
from iotgp_func_raw_data_ingest_spark.operators.dedup import word_shingles, words
from iotgp_func_raw_data_ingest_spark.plans.llm_ops import _sql_shingles, _SQL_TOKS
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


# ---------------------------------------------------------------------------
# Benchmark contamination
# ---------------------------------------------------------------------------


@register(
    "q98_contamination_check",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, {_sql_shingles(8)} AS sh FROM documents
    ),
    bench AS (
        SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 97 = 0
    ),
    corpus AS (
        SELECT doc_id, unnest(sh) AS g, len(sh) AS n_grams
        FROM sh WHERE doc_id % 97 <> 0 AND len(sh) > 0
    ),
    hits AS (
        SELECT c.doc_id,
               min(c.n_grams) AS n_grams,
               count(b.g) AS n_contaminated
        FROM corpus c LEFT JOIN bench b ON c.g = b.g
        GROUP BY c.doc_id
    )
    SELECT doc_id, n_grams, n_contaminated,
           ROUND(n_contaminated / n_grams, 4) AS contamination,
           (n_contaminated / n_grams) >= 0.2 AS contaminated
    FROM hits
    """,
)
def q98_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: fraction of each corpus doc's
    distinct word-8-gram fingerprints that appear in a held-out benchmark
    set (docs with doc_id % 97 == 0 stand in for the benchmark).

    Scale shape: the benchmark gram set is tiny relative to the corpus →
    aggregate it and BROADCAST into the probe side, so the corpus pays one
    narrow scan + a broadcast hash join, never a shuffle of 100 TB of
    grams. (On a cluster the same plan upgrades to a bloom-filter
    pre-filter before the join; semantics identical.)
    """
    t = prep(spark, sf_dir)
    docs = t["documents"]
    bench = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(word_shingles("text", 8)).alias("g"))
        .distinct()
    )
    # barrier AFTER the filter (pushdown still reaches the scan), so the
    # shingle array is built once per doc instead of once for size() and
    # again for explode() (CollapseProject; 3.9s -> 1.5s at sf0.1)
    corpus = generate_barrier(
        docs.filter(F.col("doc_id") % 97 != 0).select(
            "doc_id", word_shingles("text", 8).alias("sh")
        )
    )
    corpus = corpus.filter(F.size("sh") > 0).select(
        "doc_id", F.size("sh").alias("n_grams"), F.explode("sh").alias("g")
    )
    hits = (
        corpus.join(F.broadcast(bench.withColumn("_hit", F.lit(1))), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.min("n_grams").alias("n_grams"),
            F.count("_hit").alias("n_contaminated"),
        )
    )
    ratio = F.col("n_contaminated") / F.col("n_grams")
    return hits.select(
        "doc_id",
        "n_grams",
        "n_contaminated",
        F.round(ratio, 4).alias("contamination"),
        (ratio >= 0.2).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): char classes, \d, bounded repeats — no
# backrefs, no lookaround.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def _with_pii(doc_id, text):
    """Deterministic PII injection so the redactor has real work: every
    3rd doc gains an email, every 5th a phone number."""
    email = F.when(
        doc_id % 3 == 0,
        F.concat(F.lit(" contact user"), doc_id.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        doc_id % 5 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad((doc_id % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((doc_id % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(text, email, phone)


@register(
    "q99_pii_redaction",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               text ||
               CASE WHEN doc_id % 3 = 0
                    THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                    ELSE '' END ||
               CASE WHEN doc_id % 5 = 0
                    THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                         || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END AS txt
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(txt, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(txt, '{_PHONE_RE}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(txt, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_hash,
           CAST(length(regexp_replace(regexp_replace(txt, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                      '{_PHONE_RE}', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
    FROM t
    """,
)
def q99_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact emails / phone numbers (regex
    classes portable between Java regex and RE2). Output carries an md5 of
    the redacted text, not the text itself — the hash proves byte-exact
    redaction parity without shipping the document through the gate.

    One projection pass, no shuffle — at 100 TB this pipelines with the
    scan."""
    t = prep(spark, sf_dir)
    doc = t["documents"]
    txt = _with_pii(F.col("doc_id"), F.col("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(txt, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return doc.select(
        "doc_id",
        F.size(F.regexp_extract_all(txt, F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(txt, F.lit(_PHONE_RE), F.lit(0))).alias("n_phones"),
        F.md5(redacted.cast("binary")).alias("redacted_hash"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


# ---------------------------------------------------------------------------
# Repetition filtering (Gopher-style quality signal)
# ---------------------------------------------------------------------------


@register(
    "q100_repetition_ratio",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               greatest(len({_SQL_TOKS}) - 2, 0) AS total_grams,
               len({_sql_shingles(3)}) AS distinct_grams
        FROM documents
    )
    SELECT doc_id, total_grams, distinct_grams,
           ROUND(1.0 - distinct_grams / total_grams, 4) AS rep_ratio,
           (1.0 - distinct_grams / total_grams) > 0.2 AS repetitive
    FROM t WHERE total_grams > 0
    """,
)
def q100_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: 1 − distinct/total word-3-grams — the
    duplicated-n-gram-fraction quality filter LLM corpus pipelines apply
    (high ratio ⇒ boilerplate/spam). Single projection pass, no shuffle."""
    t = prep(spark, sf_dir)
    total = F.greatest(F.size(words("text")) - F.lit(2), F.lit(0))
    distinct = F.size(word_shingles("text", 3))
    ratio = F.lit(1.0) - F.col("distinct_grams") / F.col("total_grams")
    return (
        t["documents"]
        .select(
            "doc_id",
            total.alias("total_grams"),
            distinct.alias("distinct_grams"),
        )
        .filter(F.col("total_grams") > 0)
        .select(
            "doc_id",
            "total_grams",
            "distinct_grams",
            F.round(ratio, 4).alias("rep_ratio"),
            (ratio > 0.2).alias("repetitive"),
        )
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints
# ---------------------------------------------------------------------------


@register(
    "q101_winnow_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_min(list_transform({_sql_shingles(8)}, g -> md5(g))) AS winnow_fp,
           CAST(len({_sql_shingles(8)}) AS INT) AS n_windows
    FROM documents
    WHERE len({_sql_shingles(8)}) > 0
    """,
)
def q101_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash fingerprint: md5 per word-8-gram
    window, keep the minimum as the document representative (textstats.
    rolling_hash_fingerprints) — the standard building block for fuzzy
    containment / plagiarism detection at corpus scale."""
    t = prep(spark, sf_dir)
    # barrier: rolling_hash_fingerprints and size() both consume the
    # shingle array — materialize it once (CollapseProject would otherwise
    # build it per consumer; 4.1s -> 1.7s at sf0.1)
    sh = generate_barrier(
        t["documents"].select("doc_id", word_shingles("text", 8).alias("sh"))
    )
    return (
        sh.select(
            "doc_id",
            F.array_min(F.transform("sh", lambda g: F.md5(g.cast("binary")))).alias(
                "winnow_fp"
            ),
            F.size("sh").alias("n_windows"),
        )
        .filter(F.col("n_windows") > 0)
    )


# ---------------------------------------------------------------------------
# BPE-style pair statistics + curriculum bucketing
# ---------------------------------------------------------------------------


@register(
    "q102_bpe_pair_counts",
    oracle=f"""
    WITH toks AS (
        SELECT lower(unnest({_SQL_TOKS})) AS w FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                                     i -> substr(w, CAST(i AS INT), 2))) AS pair
        FROM toks WHERE length(w) >= 2
    )
    SELECT pair, count(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair ASC LIMIT 50
    """,
)
def q102_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE tokenizer training as a distributed
    aggregation: count adjacent character pairs across all (lowercased)
    corpus tokens, top-50 merge candidates.

    Map-side partial aggregation collapses the pair stream to ≤ |alphabet|²
    rows per task before the shuffle, and the top-k runs as
    TakeOrderedAndProject — at 100 TB the shuffle carries kilobytes."""
    t = prep(spark, sf_dir)
    toks = t["documents"].select(
        F.explode(words("text")).alias("_w")
    ).select(F.lower("_w").alias("w")).filter(F.length("w") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(50)
    )


@register(
    "q103_curriculum_buckets",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, len({_SQL_TOKS}) AS n_tokens FROM documents
    ),
    b AS (
        SELECT doc_id, n_tokens,
               ntile(4) OVER (ORDER BY n_tokens, doc_id) AS bucket
        FROM t
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
           min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
    FROM b GROUP BY bucket
    """,
)
def q103_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucketing: quartile documents by token count (ntile
    over a unique (n_tokens, doc_id) order for determinism) and report
    per-bucket size and token range — the length-staged sampling layout
    curriculum training reads from.

    Note the global ntile is a single-partition sort at this output
    granularity; the 100 TB variant assigns buckets from approx
    percentile cut points (one narrow pass + broadcast), which q94's
    token-budget selection already demonstrates."""
    t = prep(spark, sf_dir)
    from pyspark.sql import Window

    counts = t["documents"].select(
        "doc_id", F.size(words("text")).alias("n_tokens")
    )
    w = Window.orderBy("n_tokens", "doc_id")
    b = counts.withColumn("bucket", F.ntile(4).over(w))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )
