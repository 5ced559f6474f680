"""Round-5 tranche, part 3: gate coverage for the 64-bit SimHash scale
variant added after the 2M-doc stress run (see BENCH_NOTES_r04.md) —
fingerprints bit-exact against a generated oracle, and the Hamming ≤ 3
pair set against a brute-force all-pairs replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import dedup as D
from iotgp_func_raw_data_ingest_spark.plans.llm_ops import _SQL_TOKS
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


def _simhash64_sql() -> str:
    """DuckDB replay of operators.dedup.simhash64: two independent
    32-bit token hashes (md5 hex 1-8 and 9-16) vote two fingerprint
    halves. Generated from the same constants as the Spark side."""
    votes = ", ".join(
        f"sum(CASE WHEN ({h} >> {p}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{h}_{p}"
        for h in ("h1", "h2")
        for p in range(32)
    )
    fp = {
        h: " + ".join(
            f"CASE WHEN v_{h}_{p} >= 0 THEN {1 << p}::BIGINT ELSE 0 END"
            for p in range(32)
        )
        for h in ("h1", "h2")
    }
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ),
    h AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h1,
               CAST('0x' || substr(md5(tok), 9, 8) AS BIGINT) AS h2
        FROM toks
    ),
    v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
    SELECT doc_id AS id, ({fp['h2']}) AS sim_hi, ({fp['h1']}) AS sim_lo FROM v
    """


@register("q171_simhash64_fingerprints", oracle=_simhash64_sql())
def q171_simhash64_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints (two 32-bit halves) — bit-exact vs
    the generated oracle. This is the at-scale fingerprint: the 32-bit
    variant's byte bands give only 1024 candidate buckets (O(n²/1024)
    candidate stream, measured super-linear at 2M docs in
    tools/stress_smoke.py); 16-bit bands over 64 bits give 262k.

    100 TB shape: identical to q33 — one explode + one 64-column
    integer-vote aggregate, fully JVM."""
    t = prep(spark, sf_dir)
    return D.simhash64(t["documents"], "doc_id", "text")


@register(
    "q172_simhash64_pairs",
    oracle=f"""
    WITH fps AS ({_simhash64_sql()})
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.sim_hi, b.sim_hi))
                + bit_count(xor(a.sim_lo, b.sim_lo)) AS INT) AS hamming
    FROM fps a JOIN fps b ON a.id < b.id
    WHERE bit_count(xor(a.sim_hi, b.sim_hi))
          + bit_count(xor(a.sim_lo, b.sim_lo)) <= 3
    """,
)
def q172_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs (Hamming ≤ 3). Spark uses the
    4×16-bit band pigeonhole (exact-complete for ≤ 3 flips); the oracle
    brute-forces all pairs — results must be identical. A finer cut
    than q34's 32-bit ≤ 3: fewer, closer pairs.

    100 TB shape: same inverted-index band join as q34 but with 262k
    buckets instead of 1024 — the candidate stream stays near-linear in
    the corpus far beyond the 32-bit variant's ~10⁷-doc wall (measured:
    14.8s vs 207s at 2M docs)."""
    t = prep(spark, sf_dir)
    return D.simhash64_pairs(t["documents"], "doc_id", "text", max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )
