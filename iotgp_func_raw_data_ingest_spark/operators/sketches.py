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

from pyspark.sql import Column, DataFrame
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


def _md5_pos(key: Column, salt: str, sep: str, modulus: int) -> Column:
    """Deterministic hash position in [0, modulus): the first 48 bits of
    md5(salt ⊕ sep ⊕ key) as an integer, reduced mod ``modulus``. md5 is
    the one hash both Spark and DuckDB compute identically over UTF-8
    strings (the q93 convention), so every sketch built on these
    positions is bit-replayable by the correctness oracle."""
    hx = F.md5(F.concat_ws(sep, F.lit(salt), key.cast("string"))).substr(1, 12)
    return (F.conv(hx, 16, 10).cast("long") % modulus).alias("pos")


def cms_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch of ``key_col`` frequencies as a RELATION:
    one row per non-empty cell, schema (d, pos, cnt), at most
    depth × width rows regardless of input size.

    Each input row increments one cell per hash row d (position =
    md5-derived, :func:`_md5_pos`), so the whole sketch is a single
    groupBy with map-side partial aggregation — the shuffle is bounded
    by the FIXED cell count, never by the data. Cells are sums, so two
    sketches built over disjoint row sets merge by unioning the
    relations and re-summing per cell: the same re-mergeable-partial
    contract as the HLL/KLL rollups, which is what lets a continuous
    pipeline maintain "approximate counts of everything" forever
    without rescanning history.

    Estimates (:func:`cms_lookup`) NEVER undercount (every cell holds
    the true count plus non-negative collision mass) and overcount by
    ≤ e·N/width with probability 1−e^−depth — the classic CM guarantee.

    Reference parity: the reference has no sketch machinery
    (src/function_app.py); this is beyond-reference analytics surface,
    sibling to theta_distinct above.
    """
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                _md5_pos(key, str(d), ":", width).alias("pos"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_lookup(
    cms: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    est_col: str = "cms_est",
) -> DataFrame:
    """Point-query a :func:`cms_table` sketch for each key in
    ``probes``: estimate = min over the key's ``depth`` cells.

    The sketch relation is broadcast (≤ depth × width fixed-width rows
    — a few KB), so probing any number of keys is a map-side join plus
    a depth-row-per-key min: no shuffle proportional to the corpus.
    Cells a probe key hashes to that no build row touched read as 0
    (the true count of an unseen key)."""
    key = F.col(key_col)
    pcells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                _md5_pos(key, str(d), ":", width).alias("pos"),
            )
            for d in range(depth)
        ]
    )
    probed = probes.select(key, F.explode(pcells).alias("c")).select(
        key_col, F.col("c.d").alias("d"), F.col("c.pos").alias("pos")
    )
    joined = probed.join(F.broadcast(cms), ["d", "pos"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(est_col)
    )


def bloom_bits(
    df: DataFrame,
    key_col: str,
    n_hashes: int = 2,
    n_bits: int = 1024,
) -> DataFrame:
    """Bloom filter over the distinct keys of ``df`` as a RELATION of
    set bit positions: schema (pos), at most ``n_bits`` rows.

    Each key sets ``n_hashes`` md5-derived positions in one shared
    ``n_bits`` space (:func:`_md5_pos`). Built with one map-side-partial
    distinct whose output is bounded by the fixed bit-space size — the
    filter for a billion-key build side is still ≤ n_bits rows. Unioning
    two filters (bit-OR) is just union + distinct: mergeable like every
    sketch here.

    This is the semi-join-reduction primitive: broadcast the bits to
    the probe side and drop rows that cannot match BEFORE the real join
    shuffles them (what Spark's runtime row-level filtering does inside
    the engine; expressed here as first-class relational algebra the
    oracle can replay). No false negatives, ever; false-positive rate
    ≈ (1 − e^(−kn/m))^k, tuned by n_bits/n_hashes."""
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[_md5_pos(key, str(j), "#", n_bits) for j in range(n_hashes)])
    ).alias("pos")
    return df.select(pos).distinct()


def bloom_probe(
    bits: DataFrame,
    probes: DataFrame,
    key_col: str,
    n_hashes: int = 2,
    n_bits: int = 1024,
    hit_col: str = "bloom_hit",
) -> DataFrame:
    """Test each key in ``probes`` against a :func:`bloom_bits` filter:
    hit ⇔ ALL of the key's positions are set. Bits broadcast; per key
    the check is ``n_hashes`` map-side lookups and a tiny grouped
    all-match — the probe side never shuffles on data volume."""
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[_md5_pos(key, str(j), "#", n_bits) for j in range(n_hashes)])
    ).alias("pos")
    probed = probes.select(key, pos)
    joined = probed.join(
        F.broadcast(bits.withColumn("_set", F.lit(1))), ["pos"], "left"
    )
    return joined.groupBy(key_col).agg(
        (F.sum(F.coalesce(F.col("_set"), F.lit(0))) == F.lit(n_hashes)).alias(hit_col)
    )


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
