"""As-of join: for each left row, the most recent right row at or before
its timestamp, per key — the time-series join Spark lacks as a built-in.

Spark-first implementation (no range explosion, no per-key loops): tag
and union both sides, sort within each key partition by (time, side),
and carry the latest right-side attributes forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.
One shuffle on the key — the same cost as a regular join — versus a
naive non-equi join's quadratic blowup.

Right-side ties on (key, time) are resolved before the union by keeping
the row with the greatest tiebreak column, making the result
deterministic (DuckDB's native ASOF JOIN leaves ties unspecified).

At 100 TB: both sides shuffle once on the key; within-partition sort is
the only extra cost, and skewed keys are handled by AQE. If the right
side is small, broadcast + max_by-per-bucket is cheaper — Catalyst can't
pick that automatically here, so callers choose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    time_left: str,
    time_right: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left rows + the latest right row with time_right <= time_left.

    ``right_cols`` are the right-side attributes to attach (null when no
    right row precedes the left row). ``tiebreak`` (default: first of
    right_cols) deterministically picks among right rows sharing
    (key, time): greatest wins.
    """
    tiebreak = tiebreak or right_cols[0]

    # deterministic: one right row per (key, time)
    r_dedup = (
        right.groupBy(
            F.col(key_right).alias("_key"), F.col(time_right).alias("_t")
        ).agg(
            F.max_by(F.struct(*right_cols), F.col(tiebreak)).alias("_r")
        )
    )
    r_tagged = r_dedup.select(
        "_key",
        "_t",
        F.lit(1).alias("_side"),
        F.col("_r"),
        *[F.lit(None).cast(f.dataType).alias(f"_l_{f.name}") for f in left.schema.fields],
    )
    l_tagged = left.select(
        F.col(key_left).alias("_key"),
        F.col(time_left).alias("_t"),
        F.lit(2).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r"),
        *[F.col(f.name).alias(f"_l_{f.name}") for f in left.schema.fields],
    )
    # right rows sort before left rows at equal time (_side 1 < 2), so a
    # right row AT the left row's timestamp is visible to it (<= semantics)
    w = (
        W.partitionBy("_key")
        .orderBy("_t", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).withColumn(
        "_matched", F.last("_r", ignorenulls=True).over(w)
    )
    out_left = [F.col(f"_l_{f.name}").alias(f.name) for f in left.schema.fields]
    out_right = [F.col(f"_matched.{c}").alias(c) for c in right_cols]
    return carried.filter(F.col("_side") == 2).select(*out_left, *out_right)
