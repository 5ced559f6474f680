"""Round-6 tranche 3b: vector compression and lake-maintenance gates.

- q194: PRODUCT QUANTIZATION with asymmetric-distance top-k
  (operators/similarity.py pq_codebooks / pq_encode / pq_adc_topk).
  PQ is the compression half of billion-scale ANN — IVF (q86/q125)
  prunes the candidate set, PQ shrinks every stored vector to n_sub
  byte codes so the index fits in RAM and serving never touches raw
  floats. All arithmetic is exact int64 e6 fixed-point, so the codes,
  per-query distance tables, and rankings are replayed bit-for-bit by
  the DuckDB oracle (one CTE computes encoding AND distance tables —
  they are the same vector→codeword distance relation).
- q195: COMPACTION INVARIANCE under the hash gate. compact_lake_table
  (sources/lake.py) was pytest-only; here a 24-small-file route is
  compacted to one right-sized file and the gate hashes a per-language
  content fingerprint (row counts, char sums, md5-derived text
  checksums) read back THROUGH the compacted table against the raw
  source — any row lost, duplicated, or mangled by the rewrite-and-swap
  flips the hash, and ``compacted`` asserts the file count actually
  dropped.

Reference parity: the reference (src/function_app.py) has neither
vector search nor lake maintenance; both are beyond-reference surface
(SURVEY §2 training-pipeline mandate).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.operators import similarity as S
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q194_pq_adc_topk",
    oracle="""
    WITH e AS (
        SELECT vec_id,
               list_transform(
                   embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
               ) AS v
        FROM embeddings
    ),
    m4 AS (SELECT m FROM range(4) t(m)),
    esub AS (SELECT vec_id, m, v[m * 16 + 1 : m * 16 + 16] AS sv FROM e, m4),
    cb AS (SELECT vec_id AS code, m, sv AS cvec FROM esub WHERE vec_id < 16),
    dist AS (
        SELECT es.vec_id, es.m, cb.code,
               list_sum(list_transform(
                   range(1, 17),
                   i -> (es.sv[i] - cb.cvec[i]) * (es.sv[i] - cb.cvec[i])
               )) AS d2
        FROM esub es JOIN cb ON cb.m = es.m
    ),
    enc AS (SELECT vec_id, m, MIN(d2 * 64 + code) % 64 AS code FROM dist GROUP BY 1, 2),
    dt AS (SELECT vec_id AS query_id, m, code, d2 FROM dist WHERE vec_id < 5),
    adc AS (
        SELECT dt.query_id, enc.vec_id AS neighbor_id,
               CAST(SUM(dt.d2) AS BIGINT) AS adc_dist
        FROM enc JOIN dt ON dt.m = enc.m AND dt.code = enc.code
        WHERE enc.vec_id != dt.query_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_dist, rank FROM (
        SELECT query_id, neighbor_id, adc_dist,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY adc_dist, neighbor_id
               ) AS INT) AS rank
        FROM adc
    ) WHERE rank <= 5
    """,
)
def q194_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed approximate nearest neighbors: 64-dim embeddings
    split into 4 × 16-dim subspaces, each subspace coded against a
    16-word codebook (seed rows vec_id < 16 — deterministic
    seed-sampled codebooks; a production fit Lloyd-refines them with
    kmeans_refine, the ADC plan is unchanged), then the 5 query vectors
    are answered from CODES ONLY via per-query distance tables.

    Every quantity is exact int64 e6 arithmetic, so the gate pins the
    full chain: a wrong code assignment, a mis-built distance table, or
    an off-by-one subspace slice all shift adc_dist or the ranking.

    100 TB shape: the stored index is (id, sub, code) — n_sub small
    ints per vector (~32× smaller than the floats); codebooks and
    per-query tables broadcast (≤ 64·n_sub fixed rows); the scoring
    scan does n_sub table lookups per vector with NO access to raw
    embeddings; and the groupBy that sums subspace distances is keyed
    on (query, id) with exactly n_sub rows each. Pair with IVF cell
    pruning (q86) to bound the scored set; this query scores the full
    corpus because it is the accuracy audit."""
    t = prep(spark, sf_dir)
    emb = t["embeddings"]
    seeds = emb.filter(F.col("vec_id") < 16)
    cb = S.pq_codebooks(seeds, n_sub=4, sub_dim=16)
    enc = S.pq_encode(emb.select("vec_id", "embedding"), cb, n_sub=4, sub_dim=16)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.pq_adc_topk(enc, cb, queries, k=5, n_sub=4, sub_dim=16)


@register(
    "q195_compaction_invariance",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(('0x' || substr(md5(text), 1, 12))::BIGINT) AS BIGINT) AS fp_sum,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc,
           TRUE AS compacted
    FROM documents
    GROUP BY lang
    """,
)
def q195_compaction_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction under the content-hash gate: the documents
    table is written as a 24-file route (the shape a micro-batching
    ingester leaves behind), compacted through
    ``sources.lake.compact_lake_table`` (temp-dir rewrite + two-rename
    atomic swap), and read back THROUGH the compacted route. The gate
    hashes a per-language fingerprint — row count, char sum, an
    md5-derived 48-bit checksum summed over every document text, and
    the doc_id range — against the raw source table, so a row dropped,
    duplicated, truncated, or corrupted by the rewrite flips the hash;
    ``compacted`` (files_after < files_before, computed from the real
    directory listings the operator returns) gates that the maintenance
    pass actually ran rather than no-opping.

    100 TB shape: compaction is the maintenance operator that keeps a
    streaming-ingested lake readable — per route one distributed read +
    one repartition shuffle sized by the TARGET file count; routes
    compact independently/fleet-parallel; the atomic swap means
    concurrent readers never see a half-rewritten directory. The
    fingerprint pattern here is also the production acceptance check a
    careful pipeline runs after any rewrite."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        compact_lake_table,
        read_lake_table,
    )

    t = prep(spark, sf_dir)
    docs = t["documents"]
    work = tempfile.mkdtemp(prefix="q195_")
    try:
        lake = f"{work}/lake"
        cfg = EngineConfig(output_path=lake)
        route = f"{lake}/curated/corpus/documents"
        docs.repartition(24).write.mode("overwrite").parquet(route)
        before, after = compact_lake_table(
            spark, lake, "curated", "corpus", "documents", cfg,
            target_records_per_file=1_000_000,
        )
        fp = (
            F.conv(F.md5(F.col("text")).substr(1, 12), 16, 10).cast("long")
        )
        out = (
            read_lake_table(spark, lake, "curated", "corpus", "documents")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_chars"),
                F.sum(fp).alias("fp_sum"),
                F.min("doc_id").alias("min_doc"),
                F.max("doc_id").alias("max_doc"),
            )
            .withColumn("compacted", F.lit(after < before))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
