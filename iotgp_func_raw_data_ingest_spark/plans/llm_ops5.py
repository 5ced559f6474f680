"""Round-4 tranche of LLM-pipeline queries (registered now, driver-
windowed next round — see plans/__init__._reorder bucket 3): cross-modal
semantic+lexical dedup, cross-source novelty curves, per-language bigram
entropy, and minhash-signature cluster purity.

Same determinism discipline as llm_ops4 (integer decisions, rounded
float outputs); cosine similarity follows the q36-q38 precedent — both
engines reduce the 64-dim arrays in array order, so the doubles are
bit-identical before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import dedup as D
from iotgp_func_raw_data_ingest_spark.operators.barrier import generate_barrier
from iotgp_func_raw_data_ingest_spark.operators import similarity as S
from iotgp_func_raw_data_ingest_spark.plans.llm_ops import (
    _PLANES,
    _sql_bucket,
    _sql_shingles,
    _SQL_TOKS,
    _sql_vec,
)
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q139_semantic_lexical_dedup",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_sql_vec()} AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_sql_bucket('v')} AS bucket FROM e),
    cand AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.3
    ),
    sh AS (
        SELECT doc_id, {_sql_shingles(3)} AS s FROM documents
    ),
    j AS (
        SELECT c.id_a, c.id_b, c.cos_sim,
               len(list_intersect(sa.s, sb.s)) AS shared,
               len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS unioned
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.id_a
        JOIN sh sb ON sb.doc_id = c.id_b
    )
    SELECT id_a, id_b, cos_sim,
           ROUND(shared / CAST(unioned AS DOUBLE), 4) AS jaccard,
           shared * 10 >= unioned * 3 AS lexical_match
    FROM j
    """,
)
def q139_semantic_lexical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup verification: hyperplane-LSH semantic candidates
    (same 8-bit sign bucket, cosine ≥ 0.3) joined back to their DOCUMENT
    texts and verified lexically with 3-shingle Jaccard — the
    embedding-recall + text-precision two-phase every production dedup
    runs, here exercising the doc_id↔vec_id cross-table link. The
    lexical verdict compares integers (shared·10 ≥ union·3).

    100 TB shape: candidates from the bucket self-join (one reused
    exchange, narrow (id, bucket, vec) relation); the text join touches
    only candidate ids — two hash joins against documents pruned to
    (doc_id, shingles). Raw text is never shuffled for non-candidates."""
    t = prep(spark, sf_dir)
    emb = t["embeddings"]
    bucketed = emb.select(
        "vec_id", "embedding", S.hyperplane_bucket(F.col("embedding"), _PLANES).alias("bucket")
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cos = F.round(S.cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    cand = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.3)
    )
    sh = t["documents"].select("doc_id", D.word_shingles("text", 3).alias("s"))
    j = cand.join(
        sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa")), "id_a"
    ).join(sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb")), "id_b")
    shared = F.size(F.array_intersect("sa", "sb"))
    unioned = F.size("sa") + F.size("sb") - shared
    return j.select(
        "id_a",
        "id_b",
        "cos_sim",
        F.round(shared / unioned.cast("double"), 4).alias("jaccard"),
        (shared * 10 >= unioned * 3).alias("lexical_match"),
    )


@register(
    "q140_cross_source_novelty",
    oracle="""
    WITH fp AS (
        SELECT CAST(substr(source, 4) AS BIGINT) AS src_num,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
        FROM documents
    ),
    first_seen AS (
        SELECT f, min(src_num) AS first_src FROM fp GROUP BY f
    )
    SELECT fp.src_num AS source_num,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN fs.first_src = fp.src_num THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           ROUND(sum(CASE WHEN fs.first_src = fp.src_num THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS novelty_rate
    FROM fp JOIN first_seen fs USING (f)
    GROUP BY fp.src_num
    """,
)
def q140_cross_source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty curve across sources: treating source number as arrival
    order, how much of each source's content is first-seen there vs
    already delivered by an earlier source — the marginal-value signal
    that decides whether acquiring the next crawl/dump is worth it. A
    doc counts as novel iff its source IS the minimum source of its
    fingerprint (ties: the earliest source owns the content).

    100 TB shape: fingerprint groupBy (partial agg), then a same-key
    join fp↔first_seen reusing the hash partitioning, then a
    sources-sized aggregation. Incremental form: persist first_seen as
    the dedup ledger and each new source joins against it — no
    re-scan of history (same ledger pattern as q106's novelty)."""
    t = prep(spark, sf_dir)
    from iotgp_func_raw_data_ingest_spark.operators.textstats import fingerprint

    fp = t["documents"].select(
        F.substring("source", 4, 10).cast("long").alias("src_num"),
        fingerprint("text").alias("f"),
    )
    first_seen = fp.groupBy("f").agg(F.min("src_num").alias("first_src"))
    novel = F.when(F.col("first_src") == F.col("src_num"), 1).otherwise(0)
    return (
        fp.join(first_seen, "f")
        .groupBy(F.col("src_num").alias("source_num"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(novel).alias("n_novel"),
            F.round(F.sum(novel) / F.count(F.lit(1)).cast("double"), 4).alias(
                "novelty_rate"
            ),
        )
    )


@register(
    "q142_bigram_entropy_by_lang",
    oracle=f"""
    WITH bi AS (
        SELECT lang, g, count(*) AS n FROM (
            SELECT lang,
                   unnest(list_transform(
                       generate_series(1, greatest(len({_SQL_TOKS}) - 1, 0)),
                       i -> {_SQL_TOKS}[i] || ' ' || {_SQL_TOKS}[i + 1])) AS g
            FROM documents
        ) GROUP BY lang, g
    ),
    tot AS (SELECT lang, sum(n) AS total FROM bi GROUP BY lang)
    SELECT bi.lang,
           CAST(tot.total AS BIGINT) AS n_bigrams,
           CAST(count(*) AS BIGINT)  AS distinct_bigrams,
           ROUND(ln(CAST(tot.total AS DOUBLE))
                 - sum(n * ln(CAST(n AS DOUBLE))) / tot.total, 4) AS entropy_nats
    FROM bi JOIN tot USING (lang)
    GROUP BY bi.lang, tot.total
    """,
)
def q142_bigram_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus word-bigram entropy, H = ln N − Σ n·ln n / N —
    the repetitiveness/diversity signal used to compare corpus slices
    (low entropy ⇒ boilerplate-heavy). Computed from integer counts with
    the log transform applied once per distinct bigram; the float sum is
    over the small distinct-bigram relation, and the 4-decimal round
    absorbs summation-order noise (same tolerance class as q60/q79,
    both long-green).

    100 TB shape: bigram explode → (lang, gram) partial-agg count (the
    only corpus-sized shuffle, md5-able keys), then entropy reduces the
    distinct-gram relation to |langs| rows."""
    t = prep(spark, sf_dir)
    # barrier: materialize the token array once, then build bigrams by
    # zipping two shifted slices — the transform(sequence(...),
    # i -> element_at(toks, i)...) form inlines the split expression into
    # every element_at, re-tokenizing each document O(n) times (same
    # CollapseProject trap as word_shingles, dedup.py:46-61; measured
    # 5.8s -> ~1.3s at sf0.1).
    toks = generate_barrier(
        t["documents"].select("lang", D.words("text").alias("toks"))
    )
    m = F.greatest(F.size("toks") - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice("toks", 1, m),
        F.slice("toks", 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bi = (
        toks.select("lang", F.explode(bigrams).alias("g"))
        .groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = bi.groupBy("lang").agg(F.sum("n").alias("total"))
    return (
        bi.join(tot, "lang")
        .groupBy("lang", "total")
        .agg(
            F.count(F.lit(1)).alias("distinct_bigrams"),
            F.round(
                F.log(F.col("total").cast("double"))
                - F.sum(F.col("n") * F.log(F.col("n").cast("double"))) / F.col("total"),
                4,
            ).alias("entropy_nats"),
        )
        .select(
            "lang",
            F.col("total").alias("n_bigrams"),
            "distinct_bigrams",
            "entropy_nats",
        )
    )


@register(
    "q143_signature_cluster_purity",
    oracle=f"""
    WITH s AS (SELECT doc_id, lang, {_sql_shingles(3)} AS sh FROM documents),
    sig AS (
        SELECT doc_id, lang,
               md5(array_to_string(list_sort(sh), '|')) AS sig
        FROM s WHERE len(sh) > 0
    )
    SELECT sig,
           CAST(count(*) AS BIGINT)             AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(min(doc_id) AS BIGINT)          AS exemplar_id,
           count(DISTINCT lang) = 1             AS is_pure
    FROM sig GROUP BY sig HAVING count(*) > 1
    """,
)
def q143_signature_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-cluster purity QA: group documents by their full sorted
    shingle-set signature (md5 of the sorted 3-shingle set — equal sets
    ⇒ equal signature regardless of word order repetition) and check
    whether each multi-document cluster is language-pure. Mixed-language
    clusters flag mislabeled lang metadata or template boilerplate —
    the standard post-dedup audit before dropping 'duplicates' that
    are actually translations.

    100 TB shape: one projection computes the signature (shingle sort is
    per-document, bounded), one groupBy(sig) with partial aggregation;
    the md5 signature keeps the shuffle key fixed-width."""
    t = prep(spark, sf_dir)
    sh = t["documents"].select(
        "doc_id", "lang", D.word_shingles("text", 3).alias("sh")
    ).filter(F.size("sh") > 0)
    sig = sh.select(
        "doc_id",
        "lang",
        F.md5(F.concat_ws("|", F.sort_array("sh")).cast("binary")).alias("sig"),
    )
    return (
        sig.groupBy("sig")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("exemplar_id"),
            (F.countDistinct("lang") == 1).alias("is_pure"),
        )
        .filter(F.col("n_docs") > 1)
    )
