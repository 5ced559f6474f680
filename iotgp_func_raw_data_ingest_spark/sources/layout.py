"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping at scale.

Parquet scans prune files and row groups via min/max statistics. A sort
on ONE column gives perfect pruning on that column and none on any
other; a 100 TB fact table queried by several dimensions (user AND
time AND value band) needs its rows clustered so that every clustered
column has tight min/max per file. Z-ordering does that by interleaving
the bits of fixed-point ranks of each column into a single sort key —
files then cover small hyper-rectangles of the key space instead of
thin slices, and a predicate on ANY clustered column skips most files.

Spark-first: the rank normalization is a broadcast of a single-row
min/max aggregate, the bit interleave is a pure JVM column expression
(no UDFs), and the physical placement is repartitionByRange +
sortWithinPartitions on the derived key — the same machinery a plain
sorted write uses, so this composes with every writer in
``sources/lake.py`` (compaction accepts ``zorder_cols`` to re-cluster
while it rewrites).

The reference has no layout control at all (it uploads row-group-per-
batch blobs, src/function_app.py:389-414); this module is part of the
net-new scale layer.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bits per clustered column; total interleaved bits = bits * n_cols must
# stay within a signed 64-bit key
DEFAULT_BITS = 12


def _fixed_point(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale a numeric column to an integer rank in [0, 2^bits)."""
    span = (cmax.cast("double") - cmin.cast("double"))
    unit = (col.cast("double") - cmin.cast("double")) / F.when(span == 0, 1.0).otherwise(span)
    scaled = F.floor(unit * ((1 << bits) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), scaled))


def _interleave(ranks: list[Column], bits: int) -> Column:
    """Morton-interleave the rank columns: output bit (i*n + j) is bit i
    of rank j. Pure shift/and/or arithmetic — whole-stage codegen keeps
    it JVM-side."""
    n = len(ranks)
    parts = []
    for i in range(bits):
        for j, r in enumerate(ranks):
            parts.append(
                F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS, key_col: str = "_zkey"
) -> DataFrame:
    """Attach the Z-order key for ``cols`` as ``key_col``.

    Numeric/timestamp columns are min/max-normalized to ``bits``-bit
    fixed-point ranks (one single-row aggregate, broadcast back — the
    corpus is scanned once extra for stats, the standard cost of any
    range-based placement); string/binary columns fall back to a hashed
    rank, which still co-locates equal values (equality pruning) but
    has no range locality — documented limitation, same as every
    hash-bucketed layout.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 60:
        raise ValueError(
            f"bits*len(cols) = {bits * len(cols)} exceeds the 64-bit key budget"
        )
    numeric = [
        c
        for c in cols
        if df.schema[c].dataType.typeName()
        not in ("string", "binary", "boolean")
    ]
    stats_exprs = []
    for c in numeric:
        v = F.col(c).cast("double")
        stats_exprs += [
            F.min(v).alias(f"_min_{c}"),
            F.max(v).alias(f"_max_{c}"),
        ]
    out = df
    if stats_exprs:
        stats = df.agg(*stats_exprs)
        out = df.crossJoin(F.broadcast(stats))
    ranks = []
    for c in cols:
        if c in numeric:
            ranks.append(
                _fixed_point(
                    F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits
                )
            )
        else:
            ranks.append(
                F.pmod(F.xxhash64(F.col(c)), F.lit(1 << bits)).cast("long")
            )
    keyed = out.withColumn(key_col, _interleave(ranks, bits))
    return keyed.drop(*[f"_min_{c}" for c in numeric], *[f"_max_{c}" for c in numeric])


def zorder(
    df: DataFrame,
    cols: list[str],
    n_partitions: int,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Return ``df`` physically clustered by the Z-order of ``cols``:
    range-partitioned into ``n_partitions`` output partitions by the
    interleaved key and sorted by it within each partition, so a
    subsequent write produces one tight hyper-rectangle of min/max
    stats per file. The key column is dropped — it is placement-only.

    Scale shape: one extra stats pass (single-row agg), one range
    shuffle (samples the key to build balanced bounds — skew-safe by
    construction), and an in-partition sort that spills gracefully.
    """
    keyed = with_zorder_key(df, cols, bits)
    return (
        keyed.repartitionByRange(n_partitions, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
