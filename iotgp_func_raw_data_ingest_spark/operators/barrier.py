"""Generate-barrier: force one evaluation of expensive projected columns.

Catalyst's CollapseProject inlines a projected expression into every
downstream use — ``select(expensive(x).alias("e"))`` followed by
``select(size("e"), explode("e"))`` evaluates ``expensive(x)`` twice (and
HOF chains like word_shingles are interpreted, so twice is twice the
CPU). ``explode(array(struct(...)))`` is a Generate node, which Catalyst
does not collapse projections across, so columns materialize exactly
once. Same idiom as the envelope parse (operators/ingest.py) and the
minhash shingle hash (operators/dedup.py).

Note: the barrier also blocks predicate/column pushdown across it —
apply filters and narrow the projection BEFORE the barrier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def generate_barrier(df: DataFrame) -> DataFrame:
    """Materialize every column of ``df`` exactly once (schema unchanged)."""
    cols = df.columns
    return df.select(F.explode(F.array(F.struct(*cols))).alias("_b")).select(
        *[F.col(f"_b.{c}").alias(c) for c in cols]
    )
