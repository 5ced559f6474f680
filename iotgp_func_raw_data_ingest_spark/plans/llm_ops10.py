"""Round-6 tranche: incremental near-dup dedup against a persisted
signature ledger — the daily "dedup the new batch against all history
without re-pairing history" workload (q183).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import dedup as D
from iotgp_func_raw_data_ingest_spark.plans.llm_ops import _sql_shingles
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


def _incdedup_sql(
    k: int = 3, num_hashes: int = 16, bands: int = 8, est_threshold: float = 0.5
) -> str:
    """DuckDB replay of operators.dedup.dedup_against_ledger over a
    parity split of the documents table (even doc_id = the ledger /
    history, odd = the new increment): identical seeded minhash
    arithmetic, band-collision candidates restricted to new×old, and
    the signature-agreement estimator (matching minhash fraction) as
    the verify — bit-identical to the Spark plan."""
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
    agree = " + ".join(
        f"CASE WHEN sn.mh{i} = so.mh{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    return f"""
    WITH s AS (SELECT doc_id, {_sql_shingles(k)} AS sh FROM documents),
    sig AS (
        SELECT doc_id,
           {sig_cols}
        FROM s WHERE len(sh) > 0
    ),
    bk AS (
        SELECT doc_id, unnest([
            {buckets}
        ]) AS bucket FROM sig
    ),
    cand AS (
        SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
        FROM bk n JOIN bk o ON n.bucket = o.bucket
        WHERE n.doc_id % 2 = 1 AND o.doc_id % 2 = 0
    ),
    v AS (
        SELECT c.new_id, c.old_id,
               ROUND(({agree}) / {num_hashes}.0, 4) AS est
        FROM cand c
        JOIN sig sn ON sn.doc_id = c.new_id
        JOIN sig so ON so.doc_id = c.old_id
    )
    SELECT new_id AS id,
           CAST(COUNT(DISTINCT old_id) AS BIGINT) AS n_dup_sources,
           MAX(est) AS best_est
    FROM v WHERE est >= {est_threshold}
    GROUP BY new_id
    """


@register("q183_incremental_dedup_ledger", oracle=_incdedup_sql())
def q183_incremental_dedup_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup against a PERSISTED minhash-signature ledger
    (``operators.dedup.dedup_against_ledger``): the even-doc_id half of
    the corpus plays the role of all previously ingested history — its
    signatures are written to parquet and read back (the ledger
    round-trip a daily pipeline does) — and the odd half is the new
    increment, flagged if it band-collides with AND signature-verifies
    against any ledger doc.

    100 TB shape: the candidate join is increment-buckets × ledger-
    buckets — never ledger × ledger — so the per-day cost is set by the
    increment and the collision rate, independent of history size; the
    ledger row is 8 longs + id (fixed width, ~100 B/doc), and the verify
    needs only the two signature rows, never text or shingles. See the
    operator docstring and DEPLOYMENT.md for the bucket-range-partitioned
    ledger layout that prunes the daily semi-join."""
    import shutil
    import tempfile

    t = prep(spark, sf_dir)
    docs = t["documents"]
    inc = D.minhash_signatures(
        docs.filter(F.col("doc_id") % 2 == 1), "doc_id", "text"
    ).drop("shingles")
    ledger_sigs = D.minhash_signatures(
        docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text"
    ).drop("shingles")
    work = tempfile.mkdtemp(prefix="q183_")
    try:
        # the ledger is a persisted artifact, not a plan: write + read
        # back so the gate covers the parquet round-trip of the
        # fixed-width signature schema
        ledger_sigs.write.mode("overwrite").parquet(f"{work}/ledger")
        ledger = spark.read.parquet(f"{work}/ledger")
        out = D.dedup_against_ledger(inc, ledger).select(
            "id",
            F.col("n_dup_sources").cast("long").alias("n_dup_sources"),
            "best_est",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
