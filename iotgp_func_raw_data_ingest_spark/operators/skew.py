"""Skew-handling utilities for hot keys at 100 TB.

AQE's skew-join splitting (enabled in session.py) covers most cases at
runtime; these helpers are for the two shapes AQE can't fix:

- **salted aggregation**: a groupBy where one key holds a large fraction
  of all rows (e.g. the ingest DESTINATION_FALLBACK route 'assorted').
  Two-phase: aggregate on (key, salt) first — spreading the hot key over
  ``n_salts`` reducers — then re-aggregate on key. Works for any
  associative aggregate; exposed here for sum/count/min/max.
- **salted join**: replicate the small side ``n_salts`` times and salt
  the large side's key, turning one hot partition into n. Only needed
  when the small side is too big to broadcast but the large side is
  skewed.

Salt is derived from a stable hash of a unique column (not rand()) so
results are deterministic and reties/retries are safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _salt(unique_col: Column, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(unique_col), F.lit(n_salts)).cast("int")


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregate: returns key_cols + sum_<v>, cnt.

    Phase 1 groups on (keys, salt) — partial results, ≤ n_salts rows per
    key; phase 2 merges. Total shuffle volume barely grows (phase-2 input
    is tiny) while the hot key's work spreads across n_salts tasks.
    """
    salted = df.withColumn("_salt", _salt(F.col(unique_col), n_salts))
    p1 = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(value_col).alias("_s"),
        F.count(F.lit(1)).alias("_c"),
    )
    return p1.groupBy(*key_cols).agg(
        F.sum("_s").alias(f"sum_{value_col}"),
        F.sum("_c").alias("cnt"),
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key_large: str,
    key_small: str,
    unique_large: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner join where `large` is skewed on the key and `small` is too
    big to broadcast: salt the large side, replicate the small side
    n_salts times, join on (key, salt)."""
    l_salted = large.withColumn("_salt", _salt(F.col(unique_large), n_salts))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    s_replicated = small.select("*", salts)
    return l_salted.join(
        s_replicated,
        (F.col(key_large) == F.col(key_small)) & (l_salted["_salt"] == s_replicated["_salt"]),
    ).drop("_salt")

# ---------------------------------------------------------------------------
# Heavy-hitter audit
# ---------------------------------------------------------------------------
#
# Before choosing between AQE skew split, salting, or broadcast, you need
# to KNOW the key distribution. heavy_hitters is the planning query that
# feeds the choice (q155 exposes it on lineitem's supplier key).


def heavy_hitters(df: DataFrame, key_col: str, k: int = 20) -> DataFrame:
    """Top-k keys by row count with their share of all rows and their
    skew factor (count / mean-count-per-key).

    Output columns: ``key`` (audited value, cast to string so the audit
    is key-type agnostic), ``n_rows``, ``share`` (of total rows, 4dp),
    ``skew`` (ratio to the mean key, 4dp), ``rank``.

    The final rank runs over the aggregated (key-cardinality-sized)
    relation; Spark's InferWindowGroupLimit rewrites the
    ``row_number() <= k`` predicate into a per-partition top-k +
    merge (WindowGroupLimit in the plan), so even a billion-key audit
    never funnels all keys through one task.
    """
    counts = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    # total rows + key cardinality fold in via a broadcast single-row agg,
    # so the corpus is scanned once (same shape as q148's totals fold).
    totals = counts.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("n_rows").desc(), F.col("key"))
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 4).alias("share"),
            # n_rows casts to double FIRST: a long product overflows int64
            # exactly at the web-scale corpora this audit targets (1e12-row
            # hot key × 1e8 keys), while the result only feeds a 4dp round
            # — double precision is ample, and below 2^53 the product is
            # exact, so test-SF oracle hashes are unchanged.
            F.round(
                F.col("n_rows").cast("double") * F.col("_nkeys") / F.col("_total"), 4
            ).alias("skew"),
            rk.cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )
