"""Round-5 tranche, part 4: collocation mining (bigram PMI), embedding
quantization error, and train/val/test split leakage detection — the
last three pipeline ops of the round-4 build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import dedup as D
from iotgp_func_raw_data_ingest_spark.operators.barrier import generate_barrier
from iotgp_func_raw_data_ingest_spark.operators.textstats import fingerprint
from iotgp_func_raw_data_ingest_spark.plans.llm_ops import _SQL_TOKS
from iotgp_func_raw_data_ingest_spark.plans.llm_ops4 import _SQL_FPRINT
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register

# bigrams of an already-materialized token-array column `t`
_SQL_BIGRAMS_T = (
    "list_transform(generate_series(1, greatest(len(t) - 1, 0)), "
    "i -> t[i] || ' ' || t[i + 1])"
)


@register(
    "q173_bigram_pmi",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ),
    uni AS (
        SELECT u AS w, CAST(count(*) AS BIGINT) AS nw
        FROM (SELECT unnest(t) AS u FROM toks) GROUP BY u
    ),
    tot AS (SELECT sum(nw) AS n_tokens FROM uni),
    bi AS (
        SELECT g, CAST(count(*) AS BIGINT) AS ng
        FROM (SELECT unnest({_SQL_BIGRAMS_T}) AS g FROM toks)
        GROUP BY g HAVING count(*) >= 5
    ),
    j AS (
        SELECT bi.g, bi.ng, a.nw AS na, b.nw AS nb, tot.n_tokens
        FROM bi
        JOIN uni a ON a.w = string_split(bi.g, ' ')[1]
        JOIN uni b ON b.w = string_split(bi.g, ' ')[2]
        CROSS JOIN tot
    ),
    scored AS (
        SELECT g AS bigram, ng AS n_pair,
               ROUND(ln((ng * n_tokens) / CAST(na * nb AS DOUBLE)), 4) AS pmi
        FROM j
    )
    SELECT bigram, n_pair, pmi,
           CAST(row_number() OVER (ORDER BY pmi DESC, bigram) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 50
    """,
)
def q173_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-50 bigrams by pointwise mutual
    information, PMI = ln(P(ab) / P(a)P(b)) with counts ≥ 5 — the
    measure that separates true collocations ("machine learning") from
    merely frequent pairs; feeds tokenizer merge decisions alongside
    q102's raw BPE pair counts. The PMI operand is an exact integer
    ratio ((ng·N) / (na·nb)) so both engines take ln of identical
    doubles; 4dp round.

    100 TB shape: one barrier-materialized token pass feeds both the
    unigram and bigram counts; the only corpus-sized shuffles are the
    two gram groupBys (partial-agg, text keys collapse map-side); the
    PMI join probes the unigram relation twice (AQE broadcasts it while
    it fits; at a web-scale vocabulary it degrades to a shuffled join on
    the word — never a forced driver materialization) and the top-50 is
    a WindowGroupLimit."""
    t = prep(spark, sf_dir)
    toks = generate_barrier(
        t["documents"].select(D.words("text").alias("t"))
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("nw"))
    )
    tot = uni.agg(F.sum("nw").alias("n_tokens"))
    m = F.greatest(F.size("t") - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice("t", 1, m), F.slice("t", 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bi = (
        toks.select(F.explode(bigrams).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("ng"))
        .filter(F.col("ng") >= 5)
    )
    parts = F.split("g", " ")
    # the unigram joins are NOT forced broadcast: the vocabulary is
    # broadcast-sized at gate SFs (AQE will pick BHJ on its own) but a
    # web-scale vocabulary is not — forcing it would materialize the
    # vocab on the driver, the exact hazard the dedup verify joins pin
    # against. Only the 1-row total is explicitly broadcast.
    j = (
        bi.withColumn("wa", parts[0]).withColumn("wb", parts[1])
        .join(uni.withColumnRenamed("w", "wa").withColumnRenamed("nw", "na"), "wa")
        .join(uni.withColumnRenamed("w", "wb").withColumnRenamed("nw", "nb"), "wb")
        .crossJoin(F.broadcast(tot))
    )
    pmi = F.round(
        F.log((F.col("ng") * F.col("n_tokens")) / (F.col("na") * F.col("nb")).cast("double")),
        4,
    )
    from pyspark.sql.window import Window

    scored = j.select(F.col("g").alias("bigram"), F.col("ng").alias("n_pair"), pmi.alias("pmi"))
    rk = F.row_number().over(Window.orderBy(F.col("pmi").desc(), "bigram"))
    return scored.withColumn("rank", rk.cast("long")).filter(F.col("rank") <= 50)


@register(
    "q174_quantization_error",
    oracle="""
    WITH comp AS (
        SELECT label, vec_id, CAST(embedding[t.i] AS DOUBLE) AS val
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    bounds AS (
        SELECT min(val) AS lo, max(val) AS hi FROM comp
    ),
    q AS (
        SELECT label, vec_id, val,
               lo + (hi - lo) * (round((val - lo) / (hi - lo) * 255) / 255.0)
                   AS deq
        FROM comp CROSS JOIN bounds
    )
    SELECT label,
           CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
           ROUND(avg((val - deq) * (val - deq)) * 1e6, 4) AS mse_e6,
           ROUND(max(abs(val - deq)) * 1e3, 4)            AS max_err_e3
    FROM q GROUP BY label
    """,
)
def q174_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar 8-bit quantization error report: quantize every embedding
    component to 256 levels over the global [min, max] (the simplest
    production vector-compression scheme — 4× smaller than float32) and
    report per-label reconstruction MSE and max error — the check run
    before switching an ANN index (sources/ann_index.py) to quantized
    storage. Quantization arithmetic is identical on both engines
    (round-half-even to integer levels, exact grid), errors are scaled
    (×1e6 / ×1e3) before the 4dp round so the hash compares meaningful
    digits.

    100 TB shape: one posexplode pass; the global bounds are a
    broadcast single-row agg (the q148 totals-fold shape); per-label
    reduce is labels-sized."""
    t = prep(spark, sf_dir)
    comp = t["embeddings"].select(
        "label", "vec_id", F.explode("embedding").alias("val")
    ).withColumn("val", F.col("val").cast("double"))
    bounds = comp.agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
    span = F.col("hi") - F.col("lo")
    deq = F.col("lo") + span * (
        F.round((F.col("val") - F.col("lo")) / span * 255, 0) / 255.0
    )
    q = comp.crossJoin(F.broadcast(bounds)).withColumn("deq", deq)
    err = F.col("val") - F.col("deq")
    return q.groupBy("label").agg(
        F.countDistinct("vec_id").alias("n_vecs"),
        F.round(F.avg(err * err) * 1e6, 4).alias("mse_e6"),
        F.round(F.max(F.abs(err)) * 1e3, 4).alias("max_err_e3"),
    )


@register(
    "q175_split_leakage",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, {_SQL_FPRINT} AS f,
               CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                          AS INT) % 10 < 8 THEN 'train'
                    WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                          AS INT) % 10 = 8 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    leaky AS (
        SELECT coalesce(sum(CASE WHEN n_splits > 1 THEN n_docs ELSE 0 END), 0)
                   AS n_leaky_docs
        FROM (SELECT f, count(DISTINCT split) AS n_splits, count(*) AS n_docs
              FROM assigned GROUP BY f)
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST((SELECT n_leaky_docs FROM leaky) AS BIGINT) AS n_leaky_docs
    FROM assigned GROUP BY split
    """,
)
def q175_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split assignment with leakage detection: docs
    split ~80/10/10 by an md5-derived digit of the id (the q93/q104
    portable-hash convention — identical hex in both engines, stable
    across runs and cluster sizes), and any whitespace-normalized
    fingerprint group spanning more than one split is counted as leaked
    — identical content in train AND eval poisons the benchmark, so
    this is the release gate every dataset cut runs (q98's
    contamination scan is the cross-corpus variant). Output: per-split
    doc counts plus the global leaked-doc count (0 on this corpus —
    the driver data has no exact duplicates — but the operator's
    machinery is exercised end-to-end).

    100 TB shape: one projection pass (md5 + fingerprint), a
    fingerprint groupBy for the span check (same exchange exact-dedup
    pays), a splits-sized rollup, and a 1-row broadcast of the leak
    total."""
    t = prep(spark, sf_dir)
    digit = (
        F.conv(F.md5(F.col("doc_id").cast("string")).substr(1, 2), 16, 10)
        .cast("int") % 10
    )
    assigned = t["documents"].select(
        "doc_id",
        fingerprint("text").alias("f"),
        F.when(digit < 8, "train").when(digit == 8, "val").otherwise("test")
        .alias("split"),
    )
    by_fp = assigned.groupBy("f").agg(
        F.countDistinct("split").alias("n_splits"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    leaky = by_fp.agg(
        F.coalesce(
            F.sum(F.when(F.col("n_splits") > 1, F.col("n_docs")).otherwise(0)),
            F.lit(0),
        ).alias("n_leaky_docs")
    )
    return (
        assigned.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(leaky))
    )


@register(
    "q176_fastss_d2_pairs",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def q176_fastss_d2_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-2 fuzzy record linkage: same-nation customer-name pairs
    within edit distance 2, via FastSS depth-2 deletion neighborhoods
    (operators/dedup.py blocked_levenshtein_pairs) — the inverted-index
    self-join on (block, deletion-variant) replaces q85's d=1 radius
    with the common fuzzy-match radius WITHOUT falling back to the
    quadratic within-block join. The oracle is the brute-force
    quadratic, so the gate proves the deletion-neighborhood candidate
    set loses no pair (the q171/q172 verify pattern).

    100 TB shape: index size O(n·len²/2) rows of short variant strings
    (sized for keys, not documents), hash-joined on (block, variant) —
    candidate volume tracks true-match density, not block². Verification
    is the banded threshold `levenshtein(a, b, 2)`, JVM codegen
    throughout."""
    t = prep(spark, sf_dir)
    return D.blocked_levenshtein_pairs(
        t["customer"], "c_custkey", "c_name", "c_nationkey", max_dist=2
    )
