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


def kll_value_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 2048,
    sketch_col: str = "kll",
) -> DataFrame:
    """Compress each group's value DISTRIBUTION to one KLL double
    sketch — the persistable snapshot side of quantile/drift analytics.
    Exact while a group holds < k items; ~1% rank error beyond."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            sketch_col
        )
    )


def quantile_drift_psi(
    snap_a: DataFrame,
    snap_b: DataFrame,
    group_cols: list[str],
    n_buckets: int = 10,
    sketch_col: str = "kll",
    p_floor: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two value-distribution
    snapshots (outputs of :func:`kll_value_sketch` with the same
    ``group_cols``) — the drift monitor a feature/corpus pipeline runs
    between refreshes. PSI = Σᵢ (paᵢ − pbᵢ)·ln(paᵢ/pbᵢ) over
    ``n_buckets`` equi-probable buckets whose edges come from snapshot
    A's own quantiles (the standard baseline-defined binning; edges are
    A's disc quantiles at rank ceil(i/n·count)). Common reading: <0.1
    stable, 0.1–0.25 drifting, >0.25 shifted.

    Everything derives from the two sketches — bucket edges via
    ``kll_sketch_get_quantile``, per-bucket masses via consecutive
    ``kll_sketch_get_rank`` differences (rank is INCLUSIVE: fraction of
    items ≤ v) — so comparing snapshots never rescans raw rows; in
    exact mode (< k items per group-side) the masses are exact
    rationals. Probabilities are floored at ``p_floor`` before the log
    (standard PSI practice for empty buckets). Output: group_cols +
    ``psi`` (raw double; round at the caller for cross-engine gates).

    100 TB shape: each snapshot is one map-side-partial groupBy into
    fixed-width sketches, persisted once; every later drift comparison
    is arithmetic over rows of a few KB — the same
    compress-once-compare-forever contract as theta_overlap."""
    a = snap_a.select(*group_cols, F.col(sketch_col).alias("_ka"))
    b = snap_b.select(*group_cols, F.col(sketch_col).alias("_kb"))
    # materialize the tiny (groups × 2 sketches) relation ONCE: it is
    # consumed by the edge collect below AND by every per-group plan —
    # unpersisted, each consumer would re-run both sketch aggregations
    # over the raw snapshots (the Catalyst common-subtree re-execution
    # q188's edge list documents)
    j = a.join(b, group_cols).localCheckpoint(eager=True)
    # Spark constraint: kll_sketch_get_rank's VALUE argument must be
    # foldable, so per-group edges cannot ride as columns. Two bounded
    # steps instead: (1) evaluate each group's edges from its A-sketch
    # (quantile FRACTIONS are literals — allowed) and collect the tiny
    # (groups × n_buckets-1) relation; (2) re-inline the edges as
    # literals in one per-group plan each, unioned. Group cardinality
    # must therefore be bounded (dims/segments, not ids) — the same
    # bounded-domain collect contract as the language-domain queries.
    edge_rows = j.select(
        *group_cols,
        *[
            F.kll_sketch_get_quantile_double("_ka", F.lit(i / n_buckets)).alias(
                f"_e{i}"
            )
            for i in range(1, n_buckets)
        ],
    ).collect()

    def _psi_plan(row):
        cond = None
        for c in group_cols:
            eq = F.col(c).eqNullSafe(F.lit(row[c]))
            cond = eq if cond is None else (cond & eq)
        cra, crb = [F.lit(0.0)], [F.lit(0.0)]
        for i in range(1, n_buckets):
            edge = F.lit(float(row[f"_e{i}"]))
            cra.append(F.kll_sketch_get_rank_double("_ka", edge))
            crb.append(F.kll_sketch_get_rank_double("_kb", edge))
        cra.append(F.lit(1.0))
        crb.append(F.lit(1.0))
        psi = None
        for i in range(1, n_buckets + 1):
            pa = F.greatest(cra[i] - cra[i - 1], F.lit(p_floor))
            pb = F.greatest(crb[i] - crb[i - 1], F.lit(p_floor))
            term = (pa - pb) * F.log(pa / pb)
            psi = term if psi is None else psi + term
        return j.filter(cond).select(*group_cols, psi.alias("psi"))

    plans = [_psi_plan(r) for r in edge_rows]
    if not plans:
        return j.select(*group_cols, F.lit(0.0).alias("psi")).limit(0)
    out = plans[0]
    for p in plans[1:]:
        out = out.unionByName(p)
    return out


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
