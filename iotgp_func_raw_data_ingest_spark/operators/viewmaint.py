"""Warehouse-maintenance operators: incremental join-view deltas,
table diff/reconciliation, and SCD Type-2 dimension builds.

The reference engine appends raw rows and stops
(``/root/reference/src/function_app.py:230-260``); everything
downstream of an append-only lake — keeping derived JOIN views fresh
without recomputing them, reconciling two generations of a table, and
turning change streams into validity-interval dimensions — is the
maintenance surface this module provides, as pure DataFrame algebra.

Scale notes (100 TB):

- ``incremental_join_delta`` is the classical bilinear view-maintenance
  identity ΔQ = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB: per batch the big
  relation is touched only by the (small) delta sides' joins, so the
  per-batch cost is delta-sized, not view-sized — the join twin of the
  mergeable-aggregate rollups in sources/maintenance.py. Co-partition
  A and the view on the join key (bucketing) and every term is a
  co-located join.
- ``diff_tables`` is one full outer join on the key plus a fingerprint
  comparison — the audit pass after backfills/migrations. The
  fingerprint (md5 over canonicalized columns) is computed map-side,
  so only (key, 16-byte hash) pairs shuffle, never row payloads.
- ``scd2_from_events`` is two window passes over (key, ts): change
  detection via lag, validity intervals via lead over the change rows
  — shuffle keyed by the dimension key, state never materializes
  beyond the partition sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def incremental_join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: Column,
) -> DataFrame:
    """Rows ADDED to the join view A⋈B when A grows by ``a_delta`` and
    B by ``b_delta`` (insert-only deltas): ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB.

    Dropping any term loses pairs; double-counting one duplicates them —
    both flip the q211 gate. ``on`` is evaluated against the columns of
    the respective pair, so the frames must expose distinct column names
    (the usual fact⋈dim shape)."""
    return (
        a_delta.join(b_old, on)
        .unionByName(a_old.join(b_delta, on))
        .unionByName(a_delta.join(b_delta, on))
    )


def diff_tables(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level reconciliation of two table generations.

    Returns one row per key present in either side with ``status`` ∈
    {'added', 'removed', 'changed', 'unchanged'}.  Non-key columns are
    fingerprinted with md5 over an injective length-prefixed string
    encoding, so only (key, hash) pairs shuffle through the full outer
    join."""

    def fp(df: DataFrame) -> DataFrame:
        # length-prefix each column so the encoding is injective: no
        # column-boundary shift ('1'+'2c' vs '12'+'c') and no null
        # sentinel collision can make two different rows encode equally
        parts = []
        for c in compare_cols:
            s = F.col(c).cast("string")
            parts.append(
                F.coalesce(
                    F.concat(F.length(s).cast("string"), F.lit(":"), s),
                    F.lit("null"),
                )
            )
        return df.select(
            *key_cols, F.md5(F.concat_ws("|", *parts)).alias("_fp")
        )

    o = fp(old).withColumnRenamed("_fp", "_fp_old")
    n = fp(new).withColumnRenamed("_fp", "_fp_new")
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*key_cols, status.alias("status"))


def scd2_from_events(
    df: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
    tiebreak: str,
    end_sentinel: str = "9999-12-31 23:59:59.999999",
) -> DataFrame:
    """Build a Type-2 slowly-changing dimension from an event stream.

    Per ``key`` in (``ts_col``, ``tiebreak``) order, a new version
    starts whenever ``attr`` differs (null-safely: NULL-to-NULL is NOT
    a change) from the previous event's value;
    each version carries [effective_from, effective_to) with the open
    interval closed by the NEXT version's start (sentinel on the
    current version).  The tiebreak column must make the order total —
    equal timestamps with different attrs would otherwise make version
    boundaries nondeterministic."""
    order = [F.col(ts_col).asc(), F.col(tiebreak).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    # null-safe change detection: IS-DISTINCT-FROM semantics, so a run
    # of NULL attrs is one version.  The first row per key must start a
    # version explicitly: lag() is NULL there, and when attr is ALSO
    # NULL, NULL.eqNullSafe(NULL) is TRUE — without the row_number term
    # a key opening with NULL attrs would emit no version until its
    # first non-NULL change.
    marked = df.select(key, ts_col, tiebreak, attr).withColumn(
        "_is_start",
        (F.row_number().over(w) == 1)
        | ~F.lag(attr).over(w).eqNullSafe(F.col(attr)),
    )
    starts = marked.filter("_is_start")
    return starts.select(
        key,
        F.row_number().over(w).alias("version"),
        F.col(attr),
        F.col(ts_col).alias("effective_from"),
        F.coalesce(
            F.lead(ts_col).over(w),
            F.to_timestamp(F.lit(end_sentinel)),
        ).alias("effective_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )
