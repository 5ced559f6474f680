"""Round-3 LLM-data-pipeline queries: trained language ID, containment
dedup, corpus statistics (token histogram, Zipf curve), survivorship
dedup, weighted sampling, per-language curation, embedding cluster
stats, and a per-source corpus report card.

Design rule shared by every query here: the value that decides a row's
membership or ordering is INTEGER arithmetic (counts, integer division,
md5 prefixes) wherever possible, so Spark and DuckDB agree bit-for-bit;
doubles appear only in output columns that both engines ROUND after a
single division (no order-dependent float accumulation feeding a
filter). See plans/registry.py's determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iotgp_func_raw_data_ingest_spark.operators import textstats as T
from iotgp_func_raw_data_ingest_spark.operators.barrier import generate_barrier
from iotgp_func_raw_data_ingest_spark.operators.dedup import word_shingles, words
from iotgp_func_raw_data_ingest_spark.operators.prefix import partitioned_prefix_sum
from iotgp_func_raw_data_ingest_spark.operators.textstats import fingerprint
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register

# DuckDB fragments mirroring operators.dedup.words / textstats exactly
# (same definitions as plans/llm_ops.py — kept textual so each oracle is
# a standalone ANSI-SQL string).
_SQL_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"


def _sql_shingles(k: int) -> str:
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len({_SQL_TOKS}) - {k - 1}, 0)), "
        f"i -> array_to_string(list_slice({_SQL_TOKS}, i, i + {k - 1}), ' ')))"
    )


_SQL_FPRINT = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"

# quality_score (operators/textstats.py) replayed in SQL — identical to
# the q35/q68 fragment.
_SQL_QUALITY = """
    ROUND(0.5 * least(len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) / 50.0, 1.0)
        + 0.3 * (1.0 - least((CASE WHEN length(text) > 0
                 THEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / length(text)
                 ELSE 0.0 END) * 5, 1.0))
        + 0.2 * least((CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) > 0
                 THEN len(list_filter(string_split_regex(trim(text), '\\s+'),
                          t -> lower(t) IN ('the','a','of','and','to','in','is','that','it','for')))
                      / CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS DOUBLE)
                 ELSE 0.0 END) * 5, 1.0), 4)
"""


def _trigrams(col):
    """Distinct char trigrams of an ALREADY-normalized text column — the
    langid feature. The caller must pass a plain attribute (lower/trim
    applied behind a Generate barrier): if a compound expression is
    passed here, CollapseProject inlines it into every per-position
    substring and the normalization runs len(text) times per row
    (measured 3-4s extra per corpus pass at sf0.1)."""
    n = F.greatest(F.length(col) - 2, F.lit(0))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(col, i, 3))
    )


_SQL_TRIGRAMS = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(length(lower(trim(text))) - 2, 0)), "
    "i -> substr(lower(trim(text)), i, 3)))"
)


@register(
    "q126_trigram_langid",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id, lang, unnest({_SQL_TRIGRAMS}) AS g FROM documents
    ),
    profile AS (
        SELECT lang, g, count(*) AS cnt FROM grams
        WHERE doc_id % 5 < 4 GROUP BY lang, g
    ),
    scored AS (
        SELECT d.doc_id, p.lang AS cand, CAST(sum(p.cnt) AS BIGINT) AS score
        FROM grams d JOIN profile p ON d.g = p.g
        WHERE d.doc_id % 5 = 4
        GROUP BY d.doc_id, p.lang
    ),
    best AS (
        SELECT doc_id, cand, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
        FROM scored
    )
    SELECT b.doc_id, b.cand AS pred_lang, d.lang AS true_lang, b.score,
           b.cand = d.lang AS correct
    FROM best b JOIN documents d USING (doc_id) WHERE rn = 1
    """,
)
def q126_trigram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained character-trigram language ID: per-language trigram counts
    from an 80% split (doc_id % 5 < 4) score the held-out 20%; the
    predicted language is the integer-sum argmax (ties break by language
    code, so cross-engine hashes agree). Complements q35's stopword
    heuristic with the train-a-profile variant the reference's docs
    describe for corpus routing.

    100 TB shape: the profile is tiny (langs x trigram vocab, ~100k rows)
    — it aggregates with map-side partial combine, is PIVOTED wide (one
    row per trigram, one count column per language: the language set is
    a bounded-metadata collect, same contract as typed.py's sample), and
    BROADCASTS to the scoring join. The pivot makes the join 1:1 — the
    scoring output is |heldout grams| rows instead of |grams| × |langs|,
    and the per-doc reduce is a single groupBy summing n_lang columns;
    the argmax is array_max over an n_lang struct array (tie-break by
    language code via descending index, matching the oracle's window).
    Measured 1.7× over the tall-join formulation at sf0.1."""
    t = prep(spark, sf_dir)
    docs = t["documents"]
    langs = sorted(r["lang"] for r in docs.select("lang").distinct().collect())
    normalized = generate_barrier(
        docs.select("doc_id", "lang", F.lower(F.trim("text")).alias("txt"))
    )
    grams = normalized.select(
        "doc_id", "lang", F.explode(_trigrams(F.col("txt"))).alias("g")
    )
    profile_wide = (
        grams.filter(F.col("doc_id") % 5 < 4)
        .groupBy("g")
        .pivot("lang", langs)
        .agg(F.count(F.lit(1)))
    )
    # carry the doc's own lang through the scoring aggregation (it is
    # functionally dependent on doc_id) instead of re-scanning documents
    # for a true-label join afterwards — one less scan, one less join.
    per_doc = (
        grams.filter(F.col("doc_id") % 5 == 4)
        .withColumnRenamed("lang", "true_lang")
        .join(F.broadcast(profile_wide), "g")
        .groupBy("doc_id", "true_lang")
        .agg(*[F.sum(F.coalesce(F.col(l), F.lit(0))).alias(f"s_{l}") for l in langs])
    )
    # argmax with the oracle's tie-break (equal score → first language
    # code): max struct(score, n-1-i) picks max score then min index
    n = len(langs)
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"s_{l}").alias("score"),
                    F.lit(n - 1 - i).alias("inv"),
                )
                for i, l in enumerate(langs)
            ]
        )
    )
    lang_lit = F.array(*[F.lit(l) for l in langs])
    return (
        per_doc.withColumn("_b", best)
        .filter(F.col("_b.score").isNotNull())
        .select(
            "doc_id",
            F.element_at(lang_lit, n - F.col("_b.inv")).alias("pred_lang"),
            "true_lang",
            F.col("_b.score").alias("score"),
            (
                F.element_at(lang_lit, n - F.col("_b.inv")) == F.col("true_lang")
            ).alias("correct"),
        )
    )


@register(
    "q127_shingle_containment",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, {_sql_shingles(3)} AS sh FROM documents
    ),
    sized AS (SELECT doc_id, sh, len(sh) AS n FROM s WHERE len(sh) > 0),
    inv AS (SELECT doc_id, n, unnest(sh) AS g FROM sized),
    inter AS (
        SELECT a.doc_id AS src_id, b.doc_id AS dst_id,
               CAST(count(*) AS BIGINT) AS n_common, a.n AS n_src
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id <> b.doc_id
        GROUP BY a.doc_id, b.doc_id, a.n
    )
    SELECT src_id, dst_id, n_common,
           ROUND(n_common / CAST(n_src AS DOUBLE), 4) AS containment
    FROM inter WHERE n_common * 10 >= n_src * 8
    """,
)
def q127_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment dedup: |A∩B| / |A| ≥ 0.8 over word
    3-shingle sets — catches a short document swallowed by a longer one,
    which symmetric Jaccard (q31) misses. The threshold compare is kept
    in integers (n_common * 10 >= n_src * 8); the ratio is only an
    output column.

    100 TB shape: inverted-index self-join on shingle (same skeleton as
    q31 — candidates share ≥1 shingle, never all-pairs), aggregated once
    per UNDIRECTED pair (id_a < id_b) and exploded into the two
    directions afterwards — halving the heavy pair aggregation versus
    grouping directional keys (measured 6.7s → ~4s at sf0.1). Hot
    shingles are the skew risk; at scale the standard df-cap (drop
    shingles appearing in > X% of docs) bounds the index fan-out."""
    t = prep(spark, sf_dir)
    sized = (
        t["documents"]
        .select("doc_id", word_shingles("text", 3).alias("sh"))
        .withColumn("n", F.size("sh"))
        .filter(F.col("n") > 0)
    )
    # Same inverted-index discipline as operators.dedup.jaccard_pairs:
    # repartition on xxhash64(shingle) so the self-join reuses ONE
    # exchange (shingle+explode evaluated once, not per join side) and
    # shuffles 8-byte keys instead of shingle text. Hash collisions can
    # only inflate n_common at ~n²/2⁶⁵ odds — see jaccard_pairs' note.
    inv = (
        sized.select("doc_id", "n", F.explode("sh").alias("_s"))
        .select("doc_id", "n", F.xxhash64("_s").alias("g"))
        .repartition("g")
    )
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    directed = inter.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src_id"),
                    F.col("id_b").alias("dst_id"),
                    F.col("n_a").alias("n_src"),
                ),
                F.struct(
                    F.col("id_b").alias("src_id"),
                    F.col("id_a").alias("dst_id"),
                    F.col("n_b").alias("n_src"),
                ),
            )
        ).alias("e"),
        "n_common",
    ).select("e.src_id", "e.dst_id", "n_common", "e.n_src")
    return directed.filter(F.col("n_common") * 10 >= F.col("n_src") * 8).select(
        "src_id",
        "dst_id",
        "n_common",
        F.round(F.col("n_common") / F.col("n_src").cast("double"), 4).alias("containment"),
    )


@register(
    "q128_token_histogram",
    oracle=f"""
    WITH n AS (
        SELECT doc_id, len({_SQL_TOKS}) AS n_toks FROM documents
    ),
    b AS (
        SELECT CAST(length(bin(n_toks)) - 1 AS BIGINT) AS bucket
        FROM n WHERE n_toks > 0
    )
    SELECT bucket,
           CAST(2 ** bucket AS BIGINT)           AS lo_tokens,
           CAST(2 ** (bucket + 1) - 1 AS BIGINT) AS hi_tokens,
           CAST(count(*) AS BIGINT)              AS n_docs,
           ROUND(count(*) / CAST((SELECT count(*) FROM b) AS DOUBLE), 4) AS share
    FROM b GROUP BY bucket
    """,
)
def q128_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2 histogram of per-document token counts — the length
    distribution every training-mix design starts from. The bucket is
    floor(log2(n)) computed as length(bin(n)) - 1: pure integer string
    length, immune to the float-log2 boundary error at exact powers of
    two that would put a 64-token doc in different buckets per engine.

    100 TB shape: one narrow projection + a ≤64-key aggregation; the
    total for the share column is a scalar broadcast, not a re-scan."""
    t = prep(spark, sf_dir)
    n = t["documents"].select(F.size(words("text")).alias("n_toks")).filter(F.col("n_toks") > 0)
    b = n.select((F.length(F.bin("n_toks")) - 1).cast("long").alias("bucket"))
    hist = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_docs"))
    total = b.count()  # scalar: one job over the same cached narrow scan
    return hist.select(
        "bucket",
        F.pow(F.lit(2.0), F.col("bucket")).cast("long").alias("lo_tokens"),
        (F.pow(F.lit(2.0), F.col("bucket") + 1) - 1).cast("long").alias("hi_tokens"),
        "n_docs",
        F.round(F.col("n_docs") / F.lit(float(total)), 4).alias("share"),
    )


@register(
    "q129_zipf_curve",
    oracle=f"""
    WITH tok AS (SELECT unnest({_SQL_TOKS}) AS token FROM documents),
    freq AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token),
    ranked AS (
        SELECT token, n,
               row_number() OVER (ORDER BY n DESC, token) AS rank,
               CAST(sum(n) OVER (ORDER BY n DESC, token
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
        FROM freq
    )
    SELECT CAST(rank AS BIGINT) AS rank, token, n,
           ROUND(cum_n / CAST((SELECT count(*) FROM tok) AS DOUBLE), 6) AS cum_share
    FROM ranked WHERE rank <= 100
    """,
)
def q129_zipf_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf curve: top-100 corpus tokens with rank and cumulative share —
    the head-of-vocabulary profile used to size tokenizer vocab and spot
    boilerplate. Ranks tie-break on the token string; the cumulative sum
    is integer, divided once at the end.

    100 TB shape: word-count with map-side partial aggregation, then the
    rank window runs on the tiny distinct-token relation (vocab ≪
    corpus). The global window over vocab is fine because vocab fits one
    executor; corpus rows never enter a window."""
    t = prep(spark, sf_dir)
    tok = t["documents"].select(F.explode(words("text")).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    total = tok.count()
    ranked = freq.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "token",
        "n",
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("cum_n"),
    ).filter(F.col("rank") <= 100)
    return ranked.select(
        "rank", "token", "n", F.round(F.col("cum_n") / F.lit(float(total)), 6).alias("cum_share")
    )


@register(
    "q130_dedup_survivorship",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, {_SQL_FPRINT} AS fp, {_SQL_QUALITY} AS q FROM documents
    ),
    ranked AS (
        SELECT doc_id, fp, q,
               row_number() OVER (PARTITION BY fp ORDER BY q DESC, doc_id) AS rn
        FROM scored
    )
    SELECT fp AS fingerprint,
           CAST(min(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS survivor_id,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped,
           list_sort(list_filter(list(doc_id), d -> d <> min(CASE WHEN rn = 1 THEN doc_id END))) AS dropped_ids
    FROM ranked GROUP BY fp HAVING count(*) > 1
    """,
)
def q130_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship policy for exact-dup groups: within each normalized-
    content fingerprint, keep the highest-quality copy (quality is the
    shared ROUND(…,4) score, so both engines see identical doubles; ties
    break by doc_id) and report the dropped ids. This is the 'which copy
    do we train on' step after q30's detection.

    100 TB shape: one projection computes fp + quality, one hash
    aggregation per fingerprint (window + groupBy share the fp
    partitioning, so Catalyst reuses the exchange); dropped_ids stays
    bounded because duplicate groups are small by construction — a
    pathological mega-group would be capped upstream by q68-style
    curation."""
    t = prep(spark, sf_dir)
    scored = t["documents"].select(
        "doc_id", fingerprint("text").alias("fp"), T.quality_score("text").alias("q")
    )
    rn = F.row_number().over(Window.partitionBy("fp").orderBy(F.col("q").desc(), "doc_id"))
    ranked = scored.withColumn("rn", rn)
    survivor = F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("survivor_id")
    return (
        ranked.groupBy(F.col("fp").alias("fingerprint"))
        .agg(
            survivor,
            (F.count(F.lit(1)) - 1).alias("n_dropped"),
            F.sort_array(F.collect_list(F.when(F.col("rn") > 1, F.col("doc_id")))).alias(
                "dropped_ids"
            ),
        )
        .filter(F.col("n_dropped") > 0)
    )


@register(
    "q134_systematic_weighted_sample",
    oracle="""
    WITH c AS (
        SELECT doc_id, n_chars,
               CAST(sum(n_chars) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM documents
    ),
    s AS (SELECT CAST((SELECT sum(n_chars) FROM documents) // 50 AS BIGINT) AS stride)
    SELECT doc_id, n_chars, cum,
           CAST(cum // stride - (cum - n_chars) // stride AS BIGINT) AS tickets
    FROM c, s
    WHERE cum // stride > (cum - n_chars) // stride
    """,
)
def q134_systematic_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic weighted sampling: walk the doc_id-ordered cumulative
    char count and take every doc whose weight interval crosses a stride
    boundary (stride = total/50) — inclusion probability ∝ n_chars,
    ~50 docs out, zero randomness, pure integer division, identical on
    every engine and rerun. This is the reproducible 'sample tokens
    proportional to length' primitive; q93 is its unweighted cousin.

    100 TB shape: the global running sum is the textbook two-phase
    prefix-sum (operators/prefix.py): range-partition by doc_id, local
    windows in parallel, per-partition offsets + grand total from one
    ordered window over the #partitions-row subtotal relation, broadcast
    back. No single-partition window over the corpus, no scalar collect
    — the stride scalar rides along as the broadcast total column."""
    t = prep(spark, sf_dir)
    c = partitioned_prefix_sum(
        t["documents"].select("doc_id", "n_chars"),
        "doc_id",
        "n_chars",
        out_col="cum",
        total_col="gtotal",
    )
    return (
        c.withColumn("stride", F.expr("gtotal div 50"))
        .withColumn(
            "tickets",
            F.expr("cum div stride") - F.expr("(cum - n_chars) div stride"),
        )
        .filter(F.col("tickets") > 0)
        .select("doc_id", "n_chars", "cum", "tickets")
    )


@register(
    "q135_topk_docs_per_lang",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, n_chars, {_SQL_QUALITY} AS quality FROM documents
    )
    SELECT lang, CAST(rn AS BIGINT) AS rank, doc_id, n_chars, quality
    FROM (
        SELECT *, row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def q135_topk_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 quality documents per language — the per-stratum exemplar
    pick used for curation spot-checks and few-shot pools. Quality is
    the shared rounded score; ties break by doc_id.

    100 TB shape: rank-within-group via window on the lang partitioning;
    at scale the k≪group optimization is a partial top-k per partition
    (Spark's WindowGroupLimit pushes rn <= 3 below the shuffle in 3.5+,
    so each map task ships only its local top 3)."""
    t = prep(spark, sf_dir)
    scored = t["documents"].select(
        "doc_id", "lang", "n_chars", T.quality_score("text").alias("quality")
    )
    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.col("quality").desc(), "doc_id")
    )
    return (
        scored.withColumn("rank", rn.cast("long"))
        .filter(F.col("rank") <= 3)
        .select("lang", "rank", "doc_id", "n_chars", "quality")
    )


@register(
    "q136_embedding_cluster_stats",
    oracle="""
    WITH comp AS (
        SELECT label, vec_id, t.i AS pos, CAST(embedding[t.i] AS DOUBLE) AS val
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    centroid AS (
        SELECT label, pos, avg(val) AS c
        FROM comp GROUP BY label, pos
    ),
    dots AS (
        SELECT comp.label, comp.vec_id,
               sum(comp.val * centroid.c) AS dot,
               sum(comp.val * comp.val) AS m2,
               sum(centroid.c * centroid.c) AS c2
        FROM comp JOIN centroid ON comp.label = centroid.label AND comp.pos = centroid.pos
        GROUP BY comp.label, comp.vec_id
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           ROUND(min(sqrt(c2)), 4)  AS centroid_norm,
           ROUND(avg(dot / (sqrt(m2) * sqrt(c2))), 4) AS avg_cos_to_centroid
    FROM dots GROUP BY label
    """,
)
def q136_embedding_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding cluster health: member count, centroid norm,
    and mean cosine of members to their centroid — the compactness
    report an IVF/KMeans index build (q86/q125) is judged by.

    100 TB shape: posexplode → (label, pos) partial-agg centroids (key
    space = labels × 64, tiny), centroids broadcast back to the member
    pass, per-vector dot/norm reduce, then a labels-sized final agg.
    The corpus is touched exactly twice, both times map-heavy."""
    t = prep(spark, sf_dir)
    comp = t["embeddings"].select(
        "label", "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    centroid = comp.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    dots = (
        comp.join(F.broadcast(centroid), ["label", "pos"])
        .groupBy("label", "vec_id")
        .agg(
            F.sum(F.col("val") * F.col("c")).alias("dot"),
            F.sum(F.col("val") * F.col("val")).alias("m2"),
            F.sum(F.col("c") * F.col("c")).alias("c2"),
        )
    )
    return dots.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.min(F.sqrt("c2")), 4).alias("centroid_norm"),
        F.round(F.avg(F.col("dot") / (F.sqrt("m2") * F.sqrt("c2"))), 4).alias(
            "avg_cos_to_centroid"
        ),
    )


@register(
    "q137_source_report",
    oracle=f"""
    WITH scored AS (
        SELECT source, lang, n_chars, {_SQL_FPRINT} AS fp, {_SQL_QUALITY} AS q
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT)              AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT)  AS n_langs,
           CAST(sum(n_chars) AS BIGINT)          AS total_chars,
           ROUND(1.0 - count(DISTINCT fp) / CAST(count(*) AS DOUBLE), 4) AS dup_rate,
           ROUND(SUM(CAST(ROUND(q * 10000) AS BIGINT)) / (10000.0 * COUNT(*)), 4) AS avg_quality
    FROM scored GROUP BY source
    """,
)
def q137_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus report card: volume, language spread, exact-dup
    rate, mean quality — the table a data-mixing decision reads. The
    mean quality uses the integer-scaled-sum trick (sum of
    round(q*10000) over 10000·n) so the aggregate is order-independent
    across engines; dup_rate divides two exact counts.

    100 TB shape: single groupBy(source) with partial aggregation; the
    two count-distincts are per-group hash sets over low-cardinality
    values (langs, fingerprints-within-source) — if a source's
    fingerprint set outgrew memory, this degrades gracefully to the
    standard two-level distinct aggregate Spark plans automatically."""
    t = prep(spark, sf_dir)
    scored = t["documents"].select(
        "source",
        "lang",
        "n_chars",
        fingerprint("text").alias("fp"),
        T.quality_score("text").alias("q"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(
            F.lit(1.0) - F.countDistinct("fp") / F.count(F.lit(1)).cast("double"), 4
        ).alias("dup_rate"),
        F.round(
            F.sum(F.round(F.col("q") * 10000).cast("long"))
            / (10000.0 * F.count(F.lit(1))),
            4,
        ).alias("avg_quality"),
    )
