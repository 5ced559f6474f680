"""Mergeable-sketch set algebra: Theta-sketch distinct overlap between
corpus snapshots.

Why Theta and not HLL: the rollup machinery already carries HLL for
plain approx-distinct (sources/maintenance.py), but HLL sketches only
UNION — they cannot answer "how many ids are in BOTH snapshots" or "how
many left". Apache DataSketches Theta sketches (Spark 4.1 built-ins:
``theta_sketch_agg`` / ``theta_union`` / ``theta_intersection`` /
``theta_difference``) close exactly that gap: each side of a comparison
is compressed to a fixed-size sketch once, and union / intersection /
difference cardinalities are then derived sketch-to-sketch without ever
materializing or re-scanning the id sets.

100 TB shape: cross-snapshot audience overlap (retained / churned / new
users between periods, shared documents between two corpus snapshots)
over raw data is a COUNT(DISTINCT) on a join of two full scans — at
scale, two shuffles of every id. With sketches it is one map-side-
partial groupBy per snapshot producing K-bounded binaries (default
lgK=12 → ≤ 4096 retained hashes, exact below that, ~3% relative error
above), and the set algebra runs on rows of a few KB. Snapshots can be
persisted and compared pairwise later without touching raw data again.

Determinism: DataSketches Theta uses a fixed default seed and keeps the
numerically smallest k hashes — insertion- and merge-order insensitive,
so estimates are stable across runs and partitionings (the property the
driver's hash gate needs). Below the nominal k the sketch retains every
hash and the estimate is EXACT.

Reference parity: the reference engine has no sketch library at all
(src/function_app.py is an ingest function); this module is part of the
beyond-reference training-data analytics surface, sibling to the HLL
rollup (sources/maintenance.py) and the minhash ledger (operators/
dedup.py dedup_against_ledger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def theta_distinct(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    sketch_col: str = "theta",
) -> DataFrame:
    """Compress each group's distinct ``id_col`` set to one Theta sketch.

    One groupBy with map-side partial aggregation — the only pass over
    the data a later overlap analysis will ever need. The output is
    small (groups × ~KB) and persistable: write it with the lake
    machinery and compare against a future snapshot without re-scanning
    today's raw rows."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(F.col(id_col)).alias(sketch_col)
    )


def theta_overlap(
    snap_a: DataFrame,
    snap_b: DataFrame,
    group_cols: list[str],
    sketch_col: str = "theta",
) -> DataFrame:
    """Per-group distinct set algebra between two sketch snapshots
    (outputs of :func:`theta_distinct` with the same ``group_cols``).

    Returns one row per group present in BOTH snapshots with estimated
    cardinalities: ``union_est``, ``overlap_est`` (A ∩ B), ``only_a_est``
    (A \\ B), ``only_b_est`` (B \\ A) — the retained / churned / new
    decomposition. Sketch-to-sketch arithmetic on an inner join of two
    tiny relations; no raw data touched."""
    a = snap_a.select(*group_cols, F.col(sketch_col).alias("_ta"))
    b = snap_b.select(*group_cols, F.col(sketch_col).alias("_tb"))
    joined = a.join(b, group_cols)
    return joined.select(
        *group_cols,
        F.theta_sketch_estimate(F.theta_union("_ta", "_tb")).alias("union_est"),
        F.theta_sketch_estimate(F.theta_intersection("_ta", "_tb")).alias(
            "overlap_est"
        ),
        F.theta_sketch_estimate(F.theta_difference("_ta", "_tb")).alias(
            "only_a_est"
        ),
        F.theta_sketch_estimate(F.theta_difference("_tb", "_ta")).alias(
            "only_b_est"
        ),
    )
