"""LLM-data-pipeline queries, part 3: corpus statistics and selection
operators — balanced stratified sampling, span-level (sub-document)
dedup, n-gram novelty scoring, quantile-threshold quality filtering,
token-distribution entropy, vocabulary OOV coverage, sequence packing,
time-decayed engagement, and similarity-graph degree distribution. All
JVM built-ins; every query oracle-checked.

Reference parity note: the reference ingest pipeline
(src/function_app.py) has no corpus-curation surface; these operators
extend the engine toward the training-data workloads described in
SURVEY.md §6 (scale goals), following the same determinism contract as
plans/llm_ops.py (md5-based hashing so DuckDB can replay every result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators.barrier import generate_barrier
from iotgp_func_raw_data_ingest_spark.operators.dedup import word_shingles, words
from iotgp_func_raw_data_ingest_spark.plans.llm_ops import (
    _SQL_TOKS,
    _sql_shingles,
)
from iotgp_func_raw_data_ingest_spark.plans.llm_ops8 import _simhash64_sql
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


# ---------------------------------------------------------------------------
# Balanced stratified sampling
# ---------------------------------------------------------------------------


@register(
    "q104_stratified_sample",
    oracle="""
    WITH r AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    SELECT doc_id, lang, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 25
    """,
)
def q104_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced stratified sample: deterministically pick 25 documents
    per language by ranking on md5(doc_id) within each stratum — the
    corpus-rebalancing primitive behind 'equal share per language'
    training mixes (reproducible across reruns and engines, unlike
    rand()-based sampling).

    Scale shape: one shuffle on the stratum key; WindowGroupLimit pushes
    the rank-25 cut below the sort. A skewed dominant stratum at 100 TB
    switches to the two-phase variant: count per stratum, derive a hash
    threshold per stratum (rate = target/count), and apply it as a scan
    filter — no per-stratum sort at all (q93 shows the threshold form).
    """
    from pyspark.sql.window import Window

    t = prep(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        t["documents"]
        .select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 25)
    )


# ---------------------------------------------------------------------------
# Span-level (sub-document) dedup
# ---------------------------------------------------------------------------

_SPAN = 16  # tokens per non-overlapping span window


@register(
    "q105_span_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ),
    spans AS (
        SELECT doc_id, CAST(i AS INT) AS chunk_idx,
               md5(array_to_string(list_slice(t, i * {_SPAN} + 1, i * {_SPAN} + {_SPAN}), ' ')) AS h
        FROM toks,
             UNNEST(generate_series(0, CAST(ceil(len(t) / {_SPAN}.0) AS BIGINT) - 1)) AS u(i)
        WHERE len(t) > 0
    ),
    agg AS (
        SELECT h, count(*) AS n_occ,
               min(doc_id * 1000 + chunk_idx) AS owner_key
        FROM spans GROUP BY h
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN a.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           CAST(sum(CASE WHEN a.owner_key // 1000 = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_owned,
           ROUND(sum(CASE WHEN a.n_occ > 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS dup_ratio
    FROM spans s JOIN agg a USING (h)
    GROUP BY s.doc_id
    """,
)
def q105_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (span-level) exact dedup: chunk each document into
    non-overlapping 16-token windows, md5 each span, and report per doc
    how many spans are globally duplicated and how many it "owns" (holds
    the first occurrence of, by (doc_id, chunk_idx) order) — the
    fixed-window approximation of suffix-array substring dedup that
    corpus pipelines run to strip boilerplate shared across documents.

    Scale shape: explode → groupBy(h) (md5 keys are fixed-width 32B, so
    the shuffle carries hashes, never span text) → join back on h →
    groupBy(doc). Hot boilerplate spans skew the h-shuffle; AQE skew-join
    splits them, and the first groupBy's partial agg collapses repeats
    map-side. The ownership min() uses a doc_id*1000+chunk_idx encoding
    (chunk_idx < 1000 for any document under 16k tokens; longer docs
    widen the factor)."""
    t = prep(spark, sf_dir)
    toks = generate_barrier(
        t["documents"].select("doc_id", words("text").alias("t"))
    ).filter(F.size("t") > 0)
    n_chunks = F.ceil(F.size("t") / F.lit(_SPAN)).cast("int")
    spans = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.md5(
                    F.array_join(
                        F.slice(F.col("t"), i * _SPAN + 1, _SPAN), " "
                    ).cast("binary")
                ),
            )
        ).alias("chunk_idx", "h"),
    ).repartition("h")  # one reused exchange: agg + probe share this scan
    agg = spans.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("owner_key"),
    )
    dup = (F.col("n_occ") > 1).cast("int")
    owned = (F.floor(F.col("owner_key") / 1000) == F.col("doc_id")).cast("int")
    return (
        spans.join(agg, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(dup).alias("n_dup_spans"),
            F.sum(owned).alias("n_owned"),
            F.round(F.sum(dup) / F.count(F.lit(1)), 4).alias("dup_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# N-gram novelty scoring
# ---------------------------------------------------------------------------


@register(
    "q106_ngram_novelty",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_sql_shingles(5)}) AS g
        FROM documents WHERE len({_sql_shingles(5)}) > 0
    ),
    first_seen AS (
        SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           ROUND(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS novelty
    FROM sh s JOIN first_seen f USING (g)
    GROUP BY s.doc_id
    """,
)
def q106_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty scoring: for each document, the fraction of its
    distinct word-5-grams whose first corpus occurrence (min doc_id,
    standing in for arrival order) is this document. Streaming corpus
    builders use this to measure marginal contribution — a doc whose
    grams all appeared earlier adds nothing and gets dropped before
    tokenization.

    Scale shape: explode distinct shingles → groupBy(g) min — partial
    aggregation collapses per-task repeats before the shuffle — → join
    back on g → groupBy(doc). Same two-shuffle skeleton as q105; at
    100 TB the first_seen side is the dedup ledger a daily pipeline
    keeps partitioned by gram-hash range so tomorrow's increment joins
    against it without a re-scan."""
    t = prep(spark, sf_dir)
    sh = generate_barrier(
        t["documents"].select("doc_id", word_shingles("text", 5).alias("sh"))
    )
    # xxhash64 the gram (8-byte fixed shuffle keys — the oracle groups by
    # gram text; equivalence classes agree barring a ~n²/2⁶⁵ collision,
    # see dedup.jaccard_pairs) and repartition on it so the agg and the
    # probe side reuse ONE exchange — the shingle build runs once.
    sh = (
        sh.filter(F.size("sh") > 0)
        .select("doc_id", F.explode("sh").alias("_g"))
        .select("doc_id", F.xxhash64("_g").alias("g"))
        .repartition("g")
    )
    first_seen = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("int")
    return (
        sh.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(novel).alias("n_novel"),
            F.round(F.sum(novel) / F.count(F.lit(1)), 4).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# Quantile-threshold quality filtering
# ---------------------------------------------------------------------------


@register(
    "q107_quality_quantile_filter",
    oracle="""
    WITH med AS (
        SELECT lang, quantile_cont(n_chars, 0.5) AS median_chars
        FROM documents GROUP BY lang
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           ROUND(avg(d.n_chars), 2) AS avg_chars_kept,
           ROUND(min(m.median_chars), 1) AS median_chars
    FROM documents d JOIN med m ON d.lang = m.lang
    WHERE d.n_chars > m.median_chars
    GROUP BY d.lang
    """,
)
def q107_quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-threshold quality filtering: compute the per-language
    median document length, keep only documents strictly above their
    stratum's median, and report the surviving population — the
    'drop the bottom half by quality score' pruning step every corpus
    pipeline runs (length is the deterministic stand-in for a model
    score here; medians of integer data interpolate to exact .0/.5
    values so the cross-engine comparison is binary-exact).

    Scale shape: the median side aggregates to |langs| rows and
    BROADCASTS back into the scan-side filter — at 100 TB this is one
    pass for the thresholds (percentile_approx there; exact here for
    the oracle) and one filtered pass for the keep-set, never a sort."""
    t = prep(spark, sf_dir)
    docs = t["documents"]
    med = docs.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("median_chars")
    )
    return (
        docs.join(F.broadcast(med), "lang")
        .filter(F.col("n_chars") > F.col("median_chars"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars_kept"),
            F.round(F.min("median_chars"), 1).alias("median_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Token-distribution entropy
# ---------------------------------------------------------------------------


@register(
    "q108_token_entropy",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lower(unnest({_SQL_TOKS})) AS w FROM documents
    ),
    cnt AS (
        SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           ROUND(count(*) / CAST(sum(c) AS DOUBLE), 4) AS ttr,
           ROUND(ln(sum(c)) - sum(c * ln(c)) / sum(c) + 0.0, 4) AS entropy
    FROM cnt GROUP BY doc_id
    """,
)
def q108_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy + type-token ratio per
    document — the lexical-diversity quality signal (low entropy ⇒
    repetitive/templated text; complements q100's n-gram repetition
    ratio). Uses the one-pass identity H = ln(n) − Σc·ln(c)/n so the
    per-(doc,token) counts aggregate straight to the answer without a
    second join for totals; `+ 0.0` normalizes the IEEE −0.0 a
    single-token document would otherwise emit.

    Scale shape: explode → two stacked aggregations, both with map-side
    partial agg; the (doc_id, w) key inherits the document partitioning
    so the second groupBy(doc_id) reuses locality under AQE."""
    t = prep(spark, sf_dir)
    toks = (
        t["documents"]
        .select("doc_id", F.explode(words("text")).alias("w0"))
        .select("doc_id", F.lower("w0").alias("w"))
    )
    cnt = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    return cnt.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.count(F.lit(1)) / n, 4).alias("ttr"),
        F.round(
            F.log(n) - F.sum(F.col("c") * F.log("c")) / n + F.lit(0.0), 4
        ).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV rate
# ---------------------------------------------------------------------------


@register(
    "q110_vocab_oov",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lower(unnest({_SQL_TOKS})) AS w FROM documents
    ),
    vocab AS (
        SELECT w FROM (
            SELECT w, ROW_NUMBER() OVER (ORDER BY count(*) DESC, w) AS rk
            FROM toks GROUP BY w
        ) WHERE rk <= 16
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           ROUND(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY t.doc_id
    """,
)
def q110_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage: build a top-16 token vocabulary from global
    counts (rank ties broken by token text) and report each document's
    out-of-vocabulary token rate — the tokenizer-prep diagnostic that
    decides whether a vocab needs widening before training.

    Scale shape: the vocab side aggregates to |vocab| rows (map-side
    partial agg makes the count shuffle carry ≤ |distinct tokens| rows
    per task) and BROADCASTS into a left join against the token stream —
    the corpus is never shuffled on the token key for the probe. The
    global rank over the aggregated counts is |vocab|-sized, not
    corpus-sized."""
    from pyspark.sql.window import Window

    t = prep(spark, sf_dir)
    toks = (
        t["documents"]
        .select("doc_id", F.explode(words("text")).alias("w0"))
        .select("doc_id", F.lower("w0").alias("w"))
    )
    rk = F.row_number().over(
        Window.orderBy(F.desc("n"), F.asc("w"))
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("w", rk.alias("rk"))
        .filter(F.col("rk") <= 16)
        .select("w", F.lit(1).alias("_in_vocab"))
    )
    oov = F.col("_in_vocab").isNull().cast("int")
    return (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(oov).alias("n_oov"),
            F.round(F.sum(oov) / F.count(F.lit(1)), 4).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing layout
# ---------------------------------------------------------------------------

_PACK = 2048  # tokens per packed training sequence


@register(
    "q111_sequence_packing",
    oracle=f"""
    WITH counts AS (
        SELECT doc_id, len({_SQL_TOKS}) AS n_tokens FROM documents
    ),
    offs AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS off
        FROM counts
    )
    SELECT CAST(off // {_PACK} AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM offs GROUP BY 1
    """,
)
def q111_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing layout: concatenate documents in doc_id order
    and split into 2048-token training sequences; each document belongs
    to the pack where it starts (running-offset // 2048). Reports pack
    occupancy — the packing plan a trainer's data loader materializes.

    The global running sum is a single-partition window at this output
    granularity; the 100 TB variant computes per-partition token sums,
    broadcasts the |partitions|-sized prefix offsets back, and adds them
    to partition-local cumsums — two narrow passes, no global sort
    (doc_id order is the partition order of the source layout)."""
    from pyspark.sql.window import Window

    t = prep(spark, sf_dir)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offs = t["documents"].select(
        "doc_id",
        F.size(words("text")).alias("n_tokens"),
    ).select(
        "doc_id",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("off"),
    )
    return (
        offs.groupBy(F.floor(F.col("off") / _PACK).alias("pack_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Time-decayed engagement
# ---------------------------------------------------------------------------


@register(
    "q112_decayed_engagement",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(sum(value * exp(-ln(2) *
                 (epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(ts))
                 / (7.0 * 86400 * 1000000))), 2) AS decayed_score
    FROM events
    GROUP BY user_id
    """,
)
def q112_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement score per user: each event's value decays
    with a 7-day half-life from a fixed reference instant — the
    recency-weighted feature a ranking/training pipeline derives from an
    event log (exponential decay composes under addition, so tomorrow's
    score is today's × 2^(−Δ/halflife) + the new events: incrementally
    maintainable without re-scanning history).

    Scale shape: pure scan + one aggregation on user_id; the decay
    weight is a JVM-side expression pipelined with the scan."""
    t = prep(spark, sf_dir)
    ref_us = F.unix_micros(F.to_timestamp(F.lit("2024-02-01 00:00:00")))
    half_life_us = 7.0 * 86400 * 1_000_000
    import math

    weight = F.exp(
        (ref_us - F.unix_micros(F.col("ts"))) / F.lit(-half_life_us / math.log(2.0))
    )
    return (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * weight), 2).alias("decayed_score"),
        )
    )


# ---------------------------------------------------------------------------
# Similarity-graph degree distribution
# ---------------------------------------------------------------------------


@register(
    "q113_simgraph_degree",
    oracle="""
    WITH fps AS ({simhash64}),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b
        FROM fps a JOIN fps b ON a.id < b.id
        WHERE bit_count(xor(a.sim_hi, b.sim_hi))
              + bit_count(xor(a.sim_lo, b.sim_lo)) <= 3
    ),
    ends AS (
        SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs
    ),
    deg AS (
        SELECT id, count(*) AS degree FROM ends GROUP BY id
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree
    """.format(simhash64=_simhash64_sql()),
)
def q113_simgraph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the SimHash near-duplicate graph (Hamming
    ≤ 3 edges): how many documents have 1, 2, … near-neighbors. The
    shape of this histogram is the standard pre-flight check before
    connected-components clustering (q69) — a heavy tail means a giant
    component and motivates stricter thresholds or edge capping.

    Edges come from the 64-bit SimHash band join (``simhash64_pairs``,
    q171/q172) — the at-scale fingerprint: 4×16-bit bands give 262k
    candidate buckets, keeping the candidate stream near-linear in the
    corpus far beyond the 32-bit variant's ~10⁷-doc O(n²/1024) wall
    (measured 14.8s vs 207s at 2M docs, tools/stress_smoke.py). q34
    remains the labeled 32-bit legacy-parity variant.

    Scale shape: the pigeonhole candidate join is inverted-index cost,
    never O(n²) memory; the degree count then shuffles (node_id) rows
    only, and the final histogram is |max_degree| rows."""
    from iotgp_func_raw_data_ingest_spark.operators import dedup as D

    t = prep(spark, sf_dir)
    pairs = D.simhash64_pairs(t["documents"], "doc_id", "text", max_hamming=3)
    # explode(array(...)) counts both endpoints in ONE evaluation of the
    # pair join; unionAll of two projections re-ran the whole candidate
    # pipeline per branch (no exchange reuse across the union).
    ends = pairs.select(F.explode(F.array("id_a", "id_b")).alias("id"))
    return (
        ends.groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


# ---------------------------------------------------------------------------
# KMeans centroid refinement (the IVF index-build step)
# ---------------------------------------------------------------------------

_KM_ASSIGN = """
    SELECT vec_id, v, cid AS cell FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                            c.cid
               ) AS rn
        FROM e CROSS JOIN {cents} c
    ) WHERE rn = 1
"""

_KM_MEANS = """
    SELECT a.cell, d.dim,
           CAST(ROUND(SUM(CAST(ROUND(a.v[d.dim] * 1000000) AS BIGINT))
                      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS comp_e6
    FROM {assign} a
    CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS dim) d
    GROUP BY a.cell, d.dim
"""


@register(
    "q125_kmeans_refine",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
    a1 AS ({_KM_ASSIGN.format(cents="c0")}),
    m1 AS ({_KM_MEANS.format(assign="a1")}),
    c1 AS (
        SELECT cell AS cid, list(comp_e6 / 1000000.0 ORDER BY dim) AS cv
        FROM m1 GROUP BY cell
    ),
    a2 AS ({_KM_ASSIGN.format(cents="c1")}),
    m2 AS ({_KM_MEANS.format(assign="a2")}),
    c2 AS (
        SELECT cell AS cid, list(comp_e6 / 1000000.0 ORDER BY dim) AS cv
        FROM m2 GROUP BY cell
    ),
    af AS ({_KM_ASSIGN.format(cents="c2")}),
    counts AS (SELECT cell, count(*) AS n FROM af GROUP BY cell),
    norms AS (
        SELECT cell AS cid,
               ROUND(sqrt(CAST(SUM(comp_e6 * comp_e6) AS DOUBLE)) / 1000000.0,
                     6) AS c_norm
        FROM m2 GROUP BY cell
    )
    SELECT n.cid AS centroid_id,
           CAST(c.n AS BIGINT) AS n_assigned,
           n.c_norm
    FROM norms n JOIN counts c ON c.cell = n.cid
    """,
)
def q125_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations refining the 16 deterministic seed centroids
    (operators/similarity.py kmeans_refine), then the refreshed cells'
    population and centroid L2 norm — the index-build step that turns
    q86's stand-in centroids into a fitted IVF coarse quantizer. Fixed
    iteration count + fixed-point member means keep the whole fit
    replayable in SQL (the oracle unrolls both iterations as CTEs).

    Scale shape per iteration: broadcast the k centroids, map-side
    argmax assignment, ONE shuffle whose key space is (cell, dim) —
    k·64 groups regardless of corpus size — and a k-row rebuild. The
    final norm/count roll-ups are k rows. Corpus size touches only the
    map side, which is how Lloyd's survives a 100 TB embedding table
    (pyspark.ml KMeans runs the same loop with driver-collected
    centroids; keeping them as a broadcast relation makes the fit a
    single lazy plan the oracle can replay)."""
    from iotgp_func_raw_data_ingest_spark.operators import similarity as S

    t = prep(spark, sf_dir)
    emb = t["embeddings"].select("vec_id", "embedding")
    init = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    # both the population count and the norm branch from `refined`;
    # checkpoint the 16-row fit so the 2-iteration corpus lineage runs
    # once, not once per consumer (lazy: no job until first use)
    refined = S.kmeans_refine(emb, init, iters=2).localCheckpoint(eager=False)
    counts = (
        S.ivf_assign(emb, refined)
        .groupBy(F.col("cell").alias("centroid_id"))
        .agg(F.count(F.lit(1)).alias("n_assigned"))
    )
    comp_e6 = F.transform(
        "centroid_vec", lambda x: F.round(x * 1e6).cast("long")
    )
    sq_e12 = F.aggregate(
        comp_e6, F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )
    norms = refined.select(
        "centroid_id",
        F.round(F.sqrt(sq_e12.cast("double")) / 1e6, 6).alias("c_norm"),
    )
    return norms.join(counts, "centroid_id").select(
        "centroid_id", "n_assigned", "c_norm"
    )
