"""Distributed two-phase prefix sum (running total in a global order).

``Window.orderBy(col)`` with no partitioning is the textbook Spark
scale-killer: every row funnels through one task. The classical fix is
the two-phase scan — compute local running sums in parallel, then add
each partition's starting offset:

1. range-partition by the order column (partitions hold contiguous,
   sorted key ranges);
2. local cumulative sum per partition, in parallel, via a window
   partitioned by ``spark_partition_id()``;
3. reduce each partition to its subtotal (#partitions rows), take the
   running sum of THAT tiny relation to get per-partition offsets
   (the only single-partition window — over #partitions rows, not the
   data), and broadcast it back;
4. cum = local_cum + offset, map-side.

Exactness does not depend on where the range boundaries fall: any
contiguous split of a sorted sequence yields the same prefix sums.
The order column must be a unique key (ties would make the running sum
order-dependent) — same contract as a deterministic ORDER BY tiebreak.

Used by q134 (systematic weighted sampling) and q158 (token packing);
any "walk the corpus in key order accumulating X" op gets the same
shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def partitioned_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str | Column,
    out_col: str = "cum",
    total_col: str | None = None,
    num_partitions: int = 32,
) -> DataFrame:
    """All columns of ``df`` plus ``out_col`` = running sum of
    ``value_col`` in ``order_col`` order. With ``total_col`` set, also
    attaches the grand total to every row (broadcast, no extra pass —
    it falls out of the same subtotal window).

    ``order_col`` must be globally unique. ``num_partitions`` sizes the
    scan parallelism; the subtotal relation (and the broadcast) is one
    row per partition.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    ranged = df.repartitionByRange(num_partitions, order_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    lw = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_lcum", F.sum(value).over(lw))
    subs = ranged.groupBy("_pid").agg(F.sum(value).alias("_sub"))
    ow = Window.orderBy("_pid")
    off_cols = [
        F.col("_pid"),
        (
            F.sum("_sub").over(
                ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("_sub")
        ).alias("_off"),
    ]
    if total_col is not None:
        off_cols.append(
            F.sum("_sub")
            .over(ow.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .alias(total_col)
        )
    offs = subs.select(*off_cols)
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, F.col("_lcum") + F.col("_off"))
        .drop("_pid", "_lcum", "_off")
    )
