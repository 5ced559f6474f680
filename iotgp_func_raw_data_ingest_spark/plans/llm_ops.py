"""LLM-data-pipeline queries in the correctness gate: dedup, similarity
search, text analysis, multimodal columns (BASELINE.json north star).

Every deterministic operator gets a DuckDB oracle — including the
bit-level SimHash (oracle SQL is generated programmatically) and the
hyperplane-LSH ANN (plane literals are seeded and inlined into BOTH
engines). Only genuinely probabilistic-completeness operators
(MinHash-LSH banding) are rows-only checked, with golden pytest coverage
in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import dedup as D
from iotgp_func_raw_data_ingest_spark.operators import multimodal as M
from iotgp_func_raw_data_ingest_spark.operators import similarity as S
from iotgp_func_raw_data_ingest_spark.operators import textstats as T
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register

# Shared DuckDB SQL fragments (token/shingle definitions must match
# operators.dedup.words / word_shingles exactly).
_SQL_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"


def _sql_shingles(k: int) -> str:
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len({_SQL_TOKS}) - {k - 1}, 0)), "
        f"i -> array_to_string(list_slice({_SQL_TOKS}, i, i + {k - 1}), ' ')))"
    )


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


@register(
    "q30_exact_dedup",
    oracle="""
    SELECT min(doc_id) AS keep_id,
           count(*)    AS n_copies,
           md5(text)   AS content_hash
    FROM documents
    GROUP BY text
    """,
)
def q30_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical id + copy count per distinct content."""
    t = prep(spark, sf_dir)
    return D.exact_dedup_groups(t["documents"], "doc_id", "text")


@register(
    "q31_ngram_jaccard_pairs",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, {_sql_shingles(3)} AS sh FROM documents
    ),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM s WHERE len(sh) > 0),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, count(*) AS shared
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, ROUND(shared / (na + nb - shared), 4) AS jaccard
    FROM p
    WHERE ROUND(shared / (na + nb - shared), 4) >= 0.3
    """,
)
def q31_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs via inverted-index join."""
    t = prep(spark, sf_dir)
    return D.jaccard_pairs(t["documents"], "doc_id", "text", k=3, threshold=0.3)


def _minhash_sql(k: int = 3, num_hashes: int = 16, bands: int = 8, threshold: float = 0.3) -> str:
    """DuckDB replay of operators.dedup.minhash_lsh_pairs: signatures are
    (a_i·h + b_i) mod P over the md5-derived 32-bit shingle hash with the
    same seeded constants, so the banding and the candidate set are
    bit-identical — 'approximate' means approximate vs the full Jaccard
    relation, not nondeterministic."""
    rpb = num_hashes // bands
    h32 = "CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)"
    sig_cols = ",\n           ".join(
        f"list_min(list_transform(sh, x -> ({h32} * {D.MINHASH_PARAMS[i][0]}"
        f" + {D.MINHASH_PARAMS[i][1]}) % {D.MINHASH_P})) AS mh{i}"
        for i in range(num_hashes)
    )
    buckets = ",\n            ".join(
        f"'{b}#' || " + " || '#' || ".join(f"mh{b * rpb + r}" for r in range(rpb))
        for b in range(bands)
    )
    return f"""
    WITH s AS (SELECT doc_id, {_sql_shingles(k)} AS sh FROM documents),
    sig AS (
        SELECT doc_id, sh,
           {sig_cols}
        FROM s WHERE len(sh) > 0
    ),
    bk AS (
        SELECT doc_id, unnest([
            {buckets}
        ]) AS bucket FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    j AS (
        SELECT c.id_a, c.id_b,
               len(list_intersect(sa.sh, sb.sh)) AS shared,
               len(sa.sh) AS na, len(sb.sh) AS nb
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.id_a
        JOIN sig sb ON sb.doc_id = c.id_b
    )
    SELECT id_a, id_b, ROUND(shared / (na + nb - shared), 4) AS jaccard
    FROM j WHERE ROUND(shared / (na + nb - shared), 4) >= {threshold}
    """


@register("q32_minhash_lsh_pairs", oracle=_minhash_sql())
def q32_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + 8-band LSH near-dup candidates, exact-Jaccard
    verified. The md5 signatures are deterministic and engine-portable,
    so the oracle replays the exact banding in DuckDB SQL."""
    t = prep(spark, sf_dir)
    return D.minhash_lsh_pairs(
        t["documents"], "doc_id", "text", k=3, num_hashes=16, bands=8, threshold=0.3
    )


def _simhash_sql(max_doc: int | None = None) -> str:
    where = f"WHERE doc_id <= {max_doc}" if max_doc else ""
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {p}) & 1 = 1 THEN 1 ELSE -1 END) AS v{p}"
        for p in range(D.SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN v{p} >= 0 THEN {1 << p}::BIGINT ELSE 0 END" for p in range(D.SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents {where}
    ),
    h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h FROM toks),
    v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
    SELECT doc_id AS id, ({fp}) AS simhash FROM v
    """


@register("q33_simhash_fingerprints", oracle=_simhash_sql())
def q33_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints — bit-exact vs the generated oracle."""
    t = prep(spark, sf_dir)
    return D.simhash(t["documents"], "doc_id", "text")


@register(
    "q34_simhash_neardup_pairs",
    oracle=f"""
    WITH fps AS ({_simhash_sql()})
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fps a JOIN fps b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def q34_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3). Spark uses byte-band
    pigeonhole candidates (exact-complete for ≤ 3 bit flips over 4 bands);
    the oracle brute-forces all pairs — results must be identical.

    SCALE WARNING — do not copy this plan for a web-scale corpus: the
    32-bit fingerprint has only 1024 byte-band buckets, so the candidate
    stream grows O(n²/1024) past ~10⁷ docs (measured 207s at 2M docs vs
    14.8s for the 64-bit variant, STRESS.md). This query is the
    oracle-parity variant; at scale use ``simhash64_pairs``
    (q171/q172's operator — 4×16-bit bands, 262k buckets) or
    MinHash-LSH (q32). See DEPLOYMENT.md §simhash."""
    t = prep(spark, sf_dir)
    return D.simhash_pairs(t["documents"], "doc_id", "text", max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_SQL_STOP = {
    lang: "[" + ", ".join(f"'{w}'" for w in ws) + "]" for lang, ws in T.STOPWORDS.items()
}


def _sql_stop_ratio(lang: str) -> str:
    return (
        f"CASE WHEN len({_SQL_TOKS}) > 0 THEN "
        f"len(list_filter({_SQL_TOKS}, t -> list_contains({_SQL_STOP[lang]}, lower(t)))) "
        f"/ len({_SQL_TOKS}) ELSE 0.0 END"
    )


@register(
    "q35_text_profile",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, text,
               len({_SQL_TOKS}) AS n_ws,
               len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}')) AS n_bpe,
               {_sql_stop_ratio('en')} AS sr_en,
               {_sql_stop_ratio('de')} AS sr_de,
               {_sql_stop_ratio('fr')} AS sr_fr,
               CASE WHEN length(text) > 0
                    THEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / length(text)
                    ELSE 0.0 END AS pr,
               CASE WHEN len({_SQL_TOKS}) > 0
                    THEN list_sum(list_transform({_SQL_TOKS}, t -> length(t))) / CAST(len({_SQL_TOKS}) AS DOUBLE)
                    ELSE 0.0 END AS mwl
        FROM documents
    )
    SELECT doc_id,
           CAST(n_ws AS BIGINT)  AS n_tokens_ws,
           CAST(n_bpe AS BIGINT) AS n_tokens_bpe,
           ROUND(sr_en, 4)       AS stopword_ratio,
           ROUND(pr, 4)          AS punct_ratio,
           ROUND(mwl, 4)         AS mean_word_len,
           ROUND(0.5 * least(n_ws / 50.0, 1.0)
               + 0.3 * (1.0 - least(pr * 5, 1.0))
               + 0.2 * least(sr_en * 5, 1.0), 4) AS quality,
           CASE WHEN greatest(sr_en, sr_de, sr_fr) > 0 THEN
                CASE WHEN sr_de >= sr_en AND sr_de >= sr_fr THEN
                       CASE WHEN sr_en >= sr_de THEN 'en' ELSE 'de' END
                     WHEN sr_en >= sr_fr THEN 'en'
                     ELSE 'fr' END
                ELSE 'und' END AS lang_pred,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM base
    """,
)
def q35_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text-analysis profile: ws/BPE-ish token counts,
    stopword & punctuation ratios, mean word length, quality score,
    heuristic language ID, md5 fingerprint — one projection pass."""
    t = prep(spark, sf_dir)
    return T.text_profile(t["documents"], "doc_id", "text")


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_PLANES = S.random_hyperplanes(n_planes=8, dim=64)


def _sql_vec(expr: str = "embedding") -> str:
    return f"list_transform({expr}, x -> CAST(x AS DOUBLE))"


def _sql_plane(p: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in p) + "]"


def _sql_bucket(vec_expr: str, planes: list[list[float]] | None = None) -> str:
    """DuckDB replay of similarity.hyperplane_bucket over ``planes``
    (default: this module's 8-plane set). Parameterized so every oracle
    that buckets by hyperplane sign shares ONE string builder — the >0
    sign rule must mirror the Spark side in exactly one place."""
    bits = [
        f"CASE WHEN list_dot_product({vec_expr}, {_sql_plane(p)}) > 0 THEN '1' ELSE '0' END"
        for p in (planes if planes is not None else _PLANES)
    ]
    return " || ".join(bits)


@register(
    "q36_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_sql_vec()} AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(e.v, q.qv), 6) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY ROUND(list_cosine_similarity(e.v, q.qv), 6) DESC, e.vec_id
               ) AS rank
        FROM e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
    FROM scored WHERE rank <= 10
    """,
)
def q36_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 per query (queries = vec_id < 5), exact
    baseline for ANN; window group-limit keeps only k rows per query."""
    t = prep(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.select("vec_id", "embedding")
    out = S.brute_force_topk(corpus, queries, k=10)
    return out.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank")
    )


@register(
    "q37_ann_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_sql_vec()} AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_sql_bucket('v')} AS bucket FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket FROM b WHERE vec_id < 20),
    scored AS (
        SELECT q.query_id, b.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(b.v, q.qv), 6) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY ROUND(list_cosine_similarity(b.v, q.qv), 6) DESC, b.vec_id
               ) AS rank
        FROM b JOIN q ON b.bucket = q.qbucket
        WHERE b.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
    FROM scored WHERE rank <= 5
    """,
)
def q37_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN top-5: candidates share the query's 8-bit
    sign-bucket; deterministic seeded planes are inlined in both engines,
    so even this 'approximate' operator is oracle-checked exactly."""
    t = prep(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.select("vec_id", "embedding")
    out = S.ann_topk(corpus, queries, _PLANES, k=5)
    return out.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank")
    )


@register(
    "q38_embedding_neardup",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_sql_vec()} AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_sql_bucket('v')} AS bucket FROM e)
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, c.v), 6) AS cos_sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE ROUND(list_cosine_similarity(a.v, c.v), 6) >= 0.4
    """,
)
def q38_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within LSH buckets (cos ≥ 0.4)."""
    t = prep(spark, sf_dir)
    return S.embedding_neardup_pairs(t["embeddings"], _PLANES, threshold=0.4)


# ---------------------------------------------------------------------------
# Multimodal columns
# ---------------------------------------------------------------------------


@register(
    "q39_multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash
    FROM documents
    """,
)
def q39_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column pattern: opaque binary payload + JVM-computed
    typed metadata struct (byte length, content hash)."""
    t = prep(spark, sf_dir)
    media = M.attach_media_metadata(M.synthesize_media_from_documents(t["documents"]))
    return media.select(
        "media_id",
        "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_hash").alias("content_hash"),
    )


@register(
    "q40_frame_sample",
    oracle="""
    SELECT d.doc_id AS media_id,
           (['image', 'audio', 'video'])[(d.doc_id % 3) + 1] AS kind,
           f.f AS frame_no,
           substr(d.text, f.f * greatest(CAST(floor(length(d.text) / 4) AS INT), 1) + 1, 16) AS frame_text
    FROM documents d
    CROSS JOIN (SELECT CAST(unnest(generate_series(0, 3)) AS INT) AS f) f
    """,
)
def q40_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame-sampling plumbing: 4 evenly spaced 16-byte windows
    per payload, one row per frame (byte slicing stands in for keyframe
    decode; the explode/partition shape is what's being verified)."""
    t = prep(spark, sf_dir)
    frames = M.frame_sample(M.synthesize_media_from_documents(t["documents"]), n_frames=4, frame_bytes=16)
    return frames.select(
        "media_id", "kind", "frame_no", F.col("frame_payload").cast("string").alias("frame_text")
    )


@register(
    "q41_multimodal_features",
    # The stub decoder is deterministic (first 8 sha256 bytes / 255), so it
    # IS SQL-replayable: reconstruct each byte from the hex digest. Features
    # ride as one CSV string — the driver can't hash array cells — and the
    # float32→byte round-trip (round(x*255)) is exact since the float error
    # is ≪ 0.5.
    oracle="""
    WITH h AS (
        SELECT doc_id AS media_id,
               (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS hx
        FROM documents
    )
    SELECT media_id, kind, n_bytes,
           array_to_string(list_transform([0, 1, 2, 3, 4, 5, 6, 7], i ->
               CAST(16 * (strpos('0123456789abcdef', substr(hx, 2*i + 1, 1)) - 1)
                    + (strpos('0123456789abcdef', substr(hx, 2*i + 2, 1)) - 1) AS VARCHAR)),
               ',') AS feature_bytes
    FROM h
    """,
)
def q41_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (decode stubbed
    deterministically — no media libs in this container; the Arrow batch
    plumbing and output schema are the real subject)."""
    t = prep(spark, sf_dir)
    media = M.synthesize_media_from_documents(t["documents"])
    feats = M.extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.expr(
            "concat_ws(',', transform(features,"
            " x -> cast(cast(round(cast(x as double) * 255.0) as int) as string)))"
        ).alias("feature_bytes"),
    )


# ---------------------------------------------------------------------------
# End-to-end corpus curation
# ---------------------------------------------------------------------------


@register(
    "q68_corpus_curation",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source, text,
               len({_SQL_TOKS}) AS n_ws,
               {_sql_stop_ratio('en')} AS sr_en,
               CASE WHEN length(text) > 0
                    THEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / length(text)
                    ELSE 0.0 END AS pr
        FROM documents
    ),
    scored AS (
        SELECT doc_id, source, n_ws,
               ROUND(0.5 * least(n_ws / 50.0, 1.0)
                   + 0.3 * (1.0 - least(pr * 5, 1.0))
                   + 0.2 * least(sr_en * 5, 1.0), 4) AS quality,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM base
    ),
    kept AS (SELECT * FROM scored WHERE quality >= 0.5),
    dedup AS (
        SELECT fp, min(doc_id) AS keep_id, count(*) AS n_copies,
               min(source) AS src, min(n_ws) AS n_ws, min(quality) AS quality
        FROM kept GROUP BY fp
    )
    SELECT src AS source,
           count(*) AS n_unique_docs,
           CAST(SUM(n_copies) AS BIGINT) AS n_docs,
           -- avg over exact integer basis points: float summation order
           -- differs between engines and AVG(round4) can straddle a
           -- round-half boundary (observed 0.7728 vs 0.7727)
           ROUND(SUM(CAST(ROUND(quality * 10000) AS BIGINT)) / (10000.0 * COUNT(*)), 4) AS avg_quality,
           CAST(SUM(n_ws) AS BIGINT) AS total_tokens
    FROM dedup
    GROUP BY src
    """,
)
def q68_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed LLM-corpus curation pipeline in one oracle-checked
    query: quality-score → filter → fingerprint-dedup (canonical = min
    id) → per-source corpus statistics. Each stage is an operator proven
    individually (q35, q30); this proves the composition."""
    t = prep(spark, sf_dir)
    prof = T.text_profile(t["documents"], "doc_id", "text").select(
        "doc_id", "n_tokens_ws", "quality", "fingerprint"
    )
    docs = t["documents"].select("doc_id", "source")
    kept = prof.filter(F.col("quality") >= 0.5).join(docs, "doc_id")
    dedup = kept.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("source").alias("src"),
        F.min("n_tokens_ws").alias("n_ws"),
        F.min("quality").alias("q"),
    )
    return dedup.groupBy(F.col("src").alias("source")).agg(
        F.count(F.lit(1)).alias("n_unique_docs"),
        F.sum("n_copies").alias("n_docs"),
        # integer-basis-point average: order-independent (see oracle note)
        F.round(
            F.sum(F.round(F.col("q") * 10000).cast("long")) / (10000.0 * F.count(F.lit(1))), 4
        ).alias("avg_quality"),
        F.sum("n_ws").alias("total_tokens"),
    )


@register(
    "q69_neardup_clusters",
    # Connected components ARE SQL-checkable via a recursive reachability
    # CTE: reach(u, w) = w reachable from u; cluster_id = least(u, min w).
    # Edge sets are tiny derived metadata so the O(Σ comp²) enumeration is
    # safe at oracle scale (the Spark side stays iterative for 100 TB).
    oracle=f"""
    WITH RECURSIVE s AS (
        SELECT doc_id, {_sql_shingles(3)} AS sh FROM documents
    ),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM s WHERE len(sh) > 0),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, count(*) AS shared
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
        HAVING ROUND(count(*) / (a.n + b.n - count(*)), 4) >= 0.3
    ),
    e AS (SELECT id_a AS u, id_b AS v FROM p UNION ALL SELECT id_b AS u, id_a AS v FROM p),
    reach(u, w) AS (
        SELECT u, v FROM e
        UNION
        SELECT e.u, r.w FROM e JOIN reach r ON r.u = e.v
    )
    SELECT u AS id, least(u, min(w)) AS cluster_id
    FROM reach GROUP BY u
    """,
)
def q69_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over 3-gram-Jaccard near-dup edges: each
    clustered doc labeled with its component's canonical (min) id.
    Spark side is iterative min-label propagation (scale path); the
    oracle replays components with a recursive reachability CTE."""
    t = prep(spark, sf_dir)
    pairs = D.jaccard_pairs(t["documents"], "doc_id", "text", k=3, threshold=0.3)
    return D.cluster_neardups(pairs)


@register(
    "q79_grouped_zscore",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               AVG(value) AS mu,
               stddev_samp(value) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE s.sigma > 0
    """,
)
def q79_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-group z-score normalization computed
    batch-at-a-time in pandas. API-coverage demonstration — the oracle
    shows the pure-SQL window/join form, which is what production code
    should prefer (JVM-side, no Python); applyInPandas is for group-local
    logic SQL can't express (model scoring, per-group fitting)."""
    import pandas as pd

    t = prep(spark, sf_dir)

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sigma = pdf["value"].std(ddof=1)
        if not sigma or sigma != sigma or sigma == 0:
            return pdf.iloc[0:0][["event_id", "event_type"]].assign(zscore=[])
        mu = pdf["value"].mean()
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "zscore": ((pdf["value"] - mu) / sigma).round(4),
            }
        )

    return (
        t["events"]
        .select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(zscore, schema="event_id long, event_type string, zscore double")
    )


@register(
    "q85_fuzzy_blocked_pairs",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def q85_fuzzy_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage fuzzy dedup: same-nation customer-name pairs within
    edit distance 1 (operators/dedup.py blocked_levenshtein_pairs). The
    blocking key (nation) bounds the quadratic to Σ block² — the standard
    at-scale shape for edit-distance matching; levenshtein is a JVM
    built-in so the whole plan stays in whole-stage codegen."""
    t = prep(spark, sf_dir)
    return D.blocked_levenshtein_pairs(
        t["customer"], "c_custkey", "c_name", "c_nationkey", max_dist=1
    )


@register(
    "q86_ivf_ann_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_sql_vec()} AS v FROM embeddings),
    cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
    assign AS (
        SELECT vec_id, v, cid AS cell FROM (
            SELECT e.vec_id, e.v, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC, c.cid
                   ) AS rn
            FROM e CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
    probes AS (
        SELECT query_id, qv, cid AS cell FROM (
            SELECT q.query_id, q.qv, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY ROUND(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.cid
                   ) AS rn
            FROM q CROSS JOIN cents c
        ) WHERE rn <= 4
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(a.v, p.qv), 6) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY p.query_id
                   ORDER BY ROUND(list_cosine_similarity(a.v, p.qv), 6) DESC, a.vec_id
               ) AS rank
        FROM assign a JOIN probes p ON a.cell = p.cell
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
    FROM scored WHERE rank <= 5
    """,
)
def q86_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 (operators/similarity.py ivf_topk): 16 deterministic
    coarse centroids (the first 16 corpus vectors standing in for a KMeans
    fit), nprobe=4. Complements q37's hyperplane LSH as the second ANN
    scale path — candidate lists are cell-local, so at 100 TB a
    cell-partitioned lake turns each query into a pruned scan of 4/16
    partitions."""
    t = prep(spark, sf_dir)
    emb = t["embeddings"]
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = S.ivf_topk(emb.select("vec_id", "embedding"), queries, centroids, nprobe=4, k=5)
    return out.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank")
    )


@register(
    "q93_hash_sample",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)     AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sampled
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
    GROUP BY lang
    """,
)
def q93_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% corpus sample (md5(id) first hex digit ∈
    {0,1}) summarized per language. Hash-based sampling is the
    reproducible-at-scale alternative to rand(): stable across reruns,
    cluster sizes, and engines (same md5 everywhere), trivially
    stratifiable by changing the digit set, and pushes down as a cheap
    scan filter — no shuffle, no seed-state coordination."""
    t = prep(spark, sf_dir)
    keep = F.md5(F.col("doc_id").cast("string")).substr(1, 1).isin("0", "1")
    return (
        t["documents"]
        .filter(keep)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
    )


@register(
    "q94_token_budget_mix",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               SUM(n_chars) OVER (
                   ORDER BY n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_chars
        FROM documents
    )
    SELECT doc_id, lang, n_chars, CAST(cum_chars AS BIGINT) AS cum_chars
    FROM ranked WHERE cum_chars <= 100000
    """,
)
def q94_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted corpus selection: take documents in (length-proxy)
    quality order until a 100k-char training budget is filled — the
    data-mixing primitive behind 'top-quality X tokens' corpus specs.
    The global ordered running sum is exact and fine at driver-table
    scale; at 100 TB the same semantics come from a two-phase plan —
    approx_percentile finds the score cutoff whose prefix fits the
    budget, then a scan filter keeps score ≥ cutoff (no global sort,
    one boundary stratum trimmed exactly)."""
    from pyspark.sql.window import Window

    t = prep(spark, sf_dir)
    w = (
        Window.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t["documents"]
        .select(
            "doc_id", "lang", "n_chars", F.sum("n_chars").over(w).alias("cum_chars")
        )
        .filter(F.col("cum_chars") <= 100000)
    )


@register(
    "q96_bigram_vocab",
    oracle=f"""
    WITH toks AS (SELECT {_SQL_TOKS} AS t FROM documents),
    g AS (
        SELECT unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                      i -> t[i] || ' ' || t[i + 1])) AS gram
        FROM toks
    )
    SELECT gram, CAST(count(*) AS BIGINT) AS cnt
    FROM g GROUP BY gram
    ORDER BY cnt DESC, gram
    LIMIT 50
    """,
)
def q96_bigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 word-bigram frequencies (with multiplicity, so
    NOT word_shingles' distinct sets) — the vocabulary-statistics pass of
    tokenizer training. Bigrams come from zipping two shifted token
    slices (linear, JVM-side); count-then-top-k compiles to partial
    hash agg + TakeOrderedAndProject, so only (gram, partial count) rows
    ever shuffle — the full gram stream never moves."""
    t = prep(spark, sf_dir)
    toks = D.words(F.col("text"))
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m), lambda a, b: F.concat(a, F.lit(" "), b)
    )
    return (
        t["documents"]
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("gram"))
        .limit(50)
    )
