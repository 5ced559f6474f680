"""Round-6 sketch tranche: the two DataSketches families the rollup
machinery did not carry yet, each gated end-to-end.

- q184: re-mergeable QUANTILE rollup (DataSketches KLL, Spark 4.1
  ``kll_sketch_agg_double`` / ``kll_merge_agg_double``). Quantiles are
  the canonical non-mergeable aggregate — p50 of partials is not p50 of
  the union — so a continuous aggregate that answers "daily p95 latency"
  without rescanning history NEEDS a sketch partial. Follows q180's HLL
  pattern: increments refreshed through sources/maintenance.py
  incremental_rollup, exact values + error-band booleans under the gate.
- q185: Theta-sketch distinct set algebra (operators/sketches.py) —
  retained / churned / new audience decomposition between two snapshots
  from sketch intersection & difference, which HLL cannot express.
- q186: the persisted ANN index LIFECYCLE — build on one half of the
  corpus, ``append_ann_index`` the other half (the daily-delta serving
  pattern), then ``ann_lookup`` against the grown index. The oracle is
  the full-corpus LSH bucket join: the hash matches ONLY if appended
  vectors are bucketed by the index's own planes and are searchable —
  a broken append (missing rows, re-drawn planes, wrong bucket dirs)
  flips neighbors. Sibling to q183's dedup-ledger lifecycle gate.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.operators import sketches as SK
from iotgp_func_raw_data_ingest_spark.operators import similarity as S
from iotgp_func_raw_data_ingest_spark.plans.llm_ops import _sql_bucket, _sql_vec
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register
from iotgp_func_raw_data_ingest_spark.plans.streaming_queries import (
    _few_shuffle_partitions,
)

# 4 planes -> 16 buckets: bucket count sized to the corpus (the
# embeddings table is small at every test SF; a 256-bucket layout puts
# single-digit rows in each partition directory and the 2x256 directory
# commits dominate the query - measured 10s -> ~3s). At cluster scale
# pick n_planes ≈ log2(corpus / target_rows_per_bucket).
_IDX_PLANES = S.random_hyperplanes(n_planes=4, dim=64)


def _sql_idx_bucket(vec_expr: str) -> str:
    return _sql_bucket(vec_expr, _IDX_PLANES)


@register(
    "q184_quantile_rollup_accuracy",
    oracle="""
    SELECT date_trunc('day', ts) AS bucket_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS count_v,
           list_sort(list(value))[CAST(ceil(0.50 * COUNT(*)) AS BIGINT)] AS p50_exact,
           list_sort(list(value))[CAST(ceil(0.95 * COUNT(*)) AS BIGINT)] AS p95_exact,
           TRUE AS ok_p50,
           TRUE AS ok_p95
    FROM events
    GROUP BY 1, 2
    """,
)
def q184_quantile_rollup_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile rollup under the gate, q180's error-band pattern:
    events split into 3 deterministic increments (event_id % 3), each
    refreshed into a persisted daily (event_type) rollup whose
    ``approx_quantile_v`` column is a DataSketches KLL double sketch
    (sources/maintenance.py). Read-time p50/p95 estimates are then
    rank-banded against exact percentiles of the raw data.

    Gated columns carry three independent failure detectors: ``count_v``
    from the rollup vs the oracle's COUNT(*) (a replayed or dropped
    increment shifts it — KLL merge is NOT idempotent, so the
    batch-marker replay guard is what q184 leans on and exercises),
    exact p50/p95 (rank-based DISC quantiles — the value at rank
    ceil(q·n), an actual stored double, because interpolated
    percentiles land on .xx5 half-rounding boundaries the two engines
    round apart), and the band booleans, which flip if the merged
    sketch mis-ranks. Determinism:
    with k=2048 the sketch is EXACT below 2048 items per bucket (every
    test SF qualifies), so the estimate is a specific data value whose
    rank sits within ±1/n of the target — comfortably inside the
    [q40, q60] / [q88, max] bands for the n≥10 buckets the bands apply
    to (below that the band degrades to [min, max]: a 2-row bucket has
    no meaningful p95).

    100 TB shape: "daily p95 per dimension, refreshed forever" — per
    batch one groupBy over new rows producing 16 KB fixed-width
    sketches, an upsert carried on buckets × dims, history never
    rescanned; the sketch replaces the full value multiset an exact
    incremental quantile would have to keep."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import read_lake_table
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        incremental_rollup,
        rollup_quantile_estimate,
    )

    t = prep(spark, sf_dir)
    events = t["events"]
    work = tempfile.mkdtemp(prefix="q184_")
    try:
        with _few_shuffle_partitions(spark):
            cfg = EngineConfig(output_path=f"{work}/lake")
            for part in range(3):
                incremental_rollup(
                    spark, f"{work}/lake", "rollups", "events", "daily_value_q",
                    events.filter(F.col("event_id") % 3 == part),
                    "ts", "day", ["event_type"], "value", cfg,
                    aggs=("count", "approx_quantile"), batch_id=part,
                )
            rolled = rollup_quantile_estimate(
                read_lake_table(
                    spark, f"{work}/lake", "rollups", "events", "daily_value_q"
                ),
                {"p50_est": 0.5, "p95_est": 0.95},
            ).select(
                "bucket_start",
                "event_type",
                F.col("count_v").cast("long").alias("count_v"),
                "p50_est",
                "p95_est",
            )
            bands = events.groupBy(
                F.date_trunc("day", F.col("ts")).alias("bucket_start"),
                "event_type",
            ).agg(
                # rank-based DISC quantiles (value at rank ceil(q*n), 1-based)
                # — an actual stored double, bit-exact across engines; the
                # interpolated `percentile`/`quantile_cont` pair rounds
                # differently when the midpoint lands on a .xx5 boundary
                F.element_at(
                    F.sort_array(F.collect_list("value")),
                    F.ceil(F.count(F.lit(1)) * 0.50).cast("int"),
                ).alias("p50_exact"),
                F.element_at(
                    F.sort_array(F.collect_list("value")),
                    F.ceil(F.count(F.lit(1)) * 0.95).cast("int"),
                ).alias("p95_exact"),
                F.expr("percentile(value, 0.40)").alias("lo50"),
                F.expr("percentile(value, 0.60)").alias("hi50"),
                F.expr("percentile(value, 0.88)").alias("lo95"),
                F.min("value").alias("vmin"),
                F.max("value").alias("vmax"),
                F.count(F.lit(1)).alias("n"),
            )
            big = F.col("n") >= 10
            out = bands.join(rolled, ["bucket_start", "event_type"]).select(
                "bucket_start",
                "event_type",
                "count_v",
                "p50_exact",
                "p95_exact",
                F.when(big, F.col("p50_est").between(F.col("lo50"), F.col("hi50")))
                .otherwise(F.col("p50_est").between(F.col("vmin"), F.col("vmax")))
                .alias("ok_p50"),
                F.when(big, F.col("p95_est").between(F.col("lo95"), F.col("vmax")))
                .otherwise(F.col("p95_est").between(F.col("vmin"), F.col("vmax")))
                .alias("ok_p95"),
            )
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q185_snapshot_overlap_theta",
    oracle="""
    WITH a AS (
        SELECT DISTINCT event_type, user_id FROM events WHERE event_id % 2 = 0
    ),
    b AS (
        SELECT DISTINCT event_type, user_id FROM events WHERE event_id % 2 = 1
    ),
    na AS (SELECT event_type, COUNT(*) AS n_a FROM a GROUP BY 1),
    nb AS (SELECT event_type, COUNT(*) AS n_b FROM b GROUP BY 1),
    ov AS (
        SELECT a.event_type, COUNT(*) AS n_ov
        FROM a JOIN b USING (event_type, user_id)
        GROUP BY 1
    )
    SELECT na.event_type,
           CAST(n_a AS BIGINT) AS n_a_exact,
           CAST(n_b AS BIGINT) AS n_b_exact,
           CAST(COALESCE(n_ov, 0) AS BIGINT) AS overlap_exact,
           CAST(n_a - COALESCE(n_ov, 0) AS BIGINT) AS only_a_exact,
           CAST(n_b - COALESCE(n_ov, 0) AS BIGINT) AS only_b_exact,
           TRUE AS ok_overlap,
           TRUE AS ok_only_a,
           TRUE AS ok_only_b,
           TRUE AS ok_union
    FROM na
    JOIN nb USING (event_type)
    LEFT JOIN ov USING (event_type)
    """,
)
def q185_snapshot_overlap_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch audience decomposition between two snapshots (even
    vs odd event_id — a deterministic stand-in for "last period / this
    period"): per event_type, the retained (A∩B), churned (A\\B) and new
    (B\\A) distinct-user counts estimated purely sketch-to-sketch
    (operators/sketches.py theta_overlap) and banded against the exact
    set algebra. HLL cannot express the intersection/difference half of
    this — that asymmetry is why the engine carries both families.

    Determinism: default Theta nominal k = 4096 retains EVERY hash below
    that — at gate cardinalities (≤150 distinct users) the estimates are
    exact integers and the ±5% bands (floored at 1) cannot flip; at
    scale the same plan degrades gracefully to ~3% error estimates.

    100 TB shape: each snapshot compresses to groups × KB once (one
    map-side-partial groupBy over its own rows); the overlap is a join
    of two tiny sketch relations. The raw-data alternative — a distinct
    join between two full scans per comparison — shuffles every id for
    every pair of snapshots compared."""
    t = prep(spark, sf_dir)
    events = t["events"]
    snap_a = events.filter(F.col("event_id") % 2 == 0)
    snap_b = events.filter(F.col("event_id") % 2 == 1)

    est = SK.theta_overlap(
        SK.theta_distinct(snap_a, ["event_type"], "user_id"),
        SK.theta_distinct(snap_b, ["event_type"], "user_id"),
        ["event_type"],
    )

    da = snap_a.select("event_type", "user_id").distinct()
    db = snap_b.select("event_type", "user_id").distinct()
    na = da.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_a_exact"))
    nb = db.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_b_exact"))
    ov = (
        da.join(db, ["event_type", "user_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("overlap_exact"))
    )
    exact = (
        na.join(nb, "event_type")
        .join(ov, "event_type", "left")
        .na.fill({"overlap_exact": 0})
        .select(
            "event_type",
            "n_a_exact",
            "n_b_exact",
            "overlap_exact",
            (F.col("n_a_exact") - F.col("overlap_exact")).alias("only_a_exact"),
            (F.col("n_b_exact") - F.col("overlap_exact")).alias("only_b_exact"),
        )
    )

    def _ok(est_col: str, exact_col: str):
        return (
            F.abs(F.col(est_col).cast("double") - F.col(exact_col))
            <= F.greatest(F.lit(1.0), F.col(exact_col) * 0.05)
        )

    return exact.join(est, "event_type").select(
        "event_type",
        "n_a_exact",
        "n_b_exact",
        "overlap_exact",
        "only_a_exact",
        "only_b_exact",
        _ok("overlap_est", "overlap_exact").alias("ok_overlap"),
        _ok("only_a_est", "only_a_exact").alias("ok_only_a"),
        _ok("only_b_est", "only_b_exact").alias("ok_only_b"),
        (
            F.abs(
                F.col("union_est").cast("double")
                - (F.col("n_a_exact") + F.col("n_b_exact") - F.col("overlap_exact"))
            )
            <= F.greatest(
                F.lit(1.0),
                (F.col("n_a_exact") + F.col("n_b_exact") - F.col("overlap_exact"))
                * 0.05,
            )
        ).alias("ok_union"),
    )


@register(
    "q186_ann_index_lifecycle",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_sql_vec()} AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_sql_idx_bucket('v')} AS bucket FROM e),
    q AS (
        SELECT vec_id AS query_id, v AS qv, bucket AS qbucket
        FROM b WHERE vec_id < 20
    ),
    scored AS (
        SELECT q.query_id, b.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(b.v, q.qv), 6) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY ROUND(list_cosine_similarity(b.v, q.qv), 6) DESC,
                            b.vec_id
               ) AS rank
        FROM b JOIN q ON b.bucket = q.qbucket
        WHERE b.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank,
           neighbor_id % 2 = 1 AS via_append
    FROM scored WHERE rank <= 5
    """,
)
def q186_ann_index_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted ANN index lifecycle under the gate: build the bucketed
    index from EVEN vec_ids (sources/ann_index.write_ann_index), append
    the ODD half as a delta (append_ann_index — the daily-serving
    pattern: rare rebuilds, cheap appends into existing bucket
    directories), then ann_lookup top-5 for queries vec_id < 20 against
    the grown index. The oracle replays the seeded planes over the FULL
    corpus (q37's pattern), so the hash matches only if the appended
    vectors were bucketed with the index's own sidecar planes AND are
    reachable by lookup's partition-pruned scan; ``via_append`` marks
    neighbors that only exist because the append worked — at sf0.01,
    roughly half of all result rows.

    100 TB shape: the lookup scans only probed bucket directories
    (PartitionFilters pruning, verified in ann_index.py docstring), the
    append touches only the delta's buckets, and neither ever rewrites
    the standing index."""
    from iotgp_func_raw_data_ingest_spark.sources.ann_index import (
        ann_lookup,
        append_ann_index,
        write_ann_index,
    )

    t = prep(spark, sf_dir)
    emb = t["embeddings"]
    work = tempfile.mkdtemp(prefix="q186_")
    try:
        with _few_shuffle_partitions(spark):
            idx = f"{work}/annidx"
            write_ann_index(
                emb.filter(F.col("vec_id") % 2 == 0), idx, _IDX_PLANES
            )
            append_ann_index(emb.filter(F.col("vec_id") % 2 == 1), idx)
            queries = emb.filter(F.col("vec_id") < 20).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
            res = ann_lookup(
                spark, idx, queries, k=5, probes=0, exclude_self=True
            ).select(
                "query_id",
                "neighbor_id",
                "cos_sim",
                F.col("rank").cast("int").alias("rank"),
                (F.col("neighbor_id") % 2 == 1).alias("via_append"),
            )
            return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q191_distribution_drift_psi",
    oracle="""
    WITH a AS (
        SELECT event_type, value FROM events WHERE event_id % 2 = 0
    ),
    b AS (
        SELECT event_type, value FROM events WHERE event_id % 2 = 1
    ),
    edges AS (
        -- g.i / 10.0 (not g.i * 0.1): the division is the same IEEE
        -- double the Spark side passes as the KLL quantile fraction;
        -- i*0.1 rounds ABOVE i/10 for i in {3,6,7} and shifts the edge
        -- index by one whenever i*n/10 lands on an integer
        SELECT event_type, g.i,
               list_sort(list(value))[CAST(ceil(g.i / 10.0 * COUNT(*)) AS BIGINT)] AS e
        FROM a, (SELECT unnest(generate_series(1, 9)) AS i) g
        GROUP BY event_type, g.i
    ),
    ra AS (
        SELECT ed.event_type, ed.i,
               SUM(CASE WHEN a.value <= ed.e THEN 1 ELSE 0 END) * 1.0
                   / COUNT(*) AS r
        FROM edges ed JOIN a ON a.event_type = ed.event_type
        GROUP BY ed.event_type, ed.i
    ),
    rb AS (
        SELECT ed.event_type, ed.i,
               SUM(CASE WHEN b.value <= ed.e THEN 1 ELSE 0 END) * 1.0
                   / COUNT(*) AS r
        FROM edges ed JOIN b ON b.event_type = ed.event_type
        GROUP BY ed.event_type, ed.i
    ),
    cr AS (
        SELECT event_type, i, ra.r AS cra, rb.r AS crb
        FROM ra JOIN rb USING (event_type, i)
        UNION ALL
        SELECT DISTINCT event_type, 10, 1.0, 1.0 FROM a
    ),
    term AS (
        SELECT event_type,
               greatest(cra - COALESCE(lag(cra) OVER w, 0), 1e-6) AS pa,
               greatest(crb - COALESCE(lag(crb) OVER w, 0), 1e-6) AS pb
        FROM cr
        WINDOW w AS (PARTITION BY event_type ORDER BY i)
    )
    SELECT t.event_type,
           CAST(na.n AS BIGINT) AS n_a,
           CAST(nb.n AS BIGINT) AS n_b,
           ROUND(SUM((pa - pb) * ln(pa / pb)), 6) AS psi
    FROM term t
    JOIN (SELECT event_type, COUNT(*) AS n FROM a GROUP BY 1) na
      ON na.event_type = t.event_type
    JOIN (SELECT event_type, COUNT(*) AS n FROM b GROUP BY 1) nb
      ON nb.event_type = t.event_type
    GROUP BY t.event_type, na.n, nb.n
    """,
)
def q191_distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor between two snapshots
    (even vs odd event_id) of each event_type's value distribution,
    computed ENTIRELY from two KLL sketches per group
    (operators/sketches.quantile_drift_psi): bucket edges are snapshot
    A's own deciles, per-bucket masses are consecutive inclusive-rank
    differences, probabilities floored at 1e-6 before the log. The
    oracle replays the identical arithmetic from raw rows (disc decile
    edges at rank ceil(i/10·n), count(≤edge)/n cumulative ranks), which
    matches because at gate cardinality (~1000 values per group-side,
    k=16384) the sketches are in exact mode — the q180/q184 exactness
    convention. ``n_a``/``n_b`` come from the sketches' own item counts
    (kll_sketch_get_n), so a lost or double-fed row flips the gate even
    if psi happens to survive.

    100 TB shape: each snapshot compresses once into fixed-width
    sketches (map-side partial groupBy); every later drift comparison
    is closed-form arithmetic over KB-sized rows — no re-scan, no join
    of raw snapshots. The same persisted sketch serves q184-style
    quantile serving and this drift audit."""
    from iotgp_func_raw_data_ingest_spark.operators.sketches import (
        kll_value_sketch,
        quantile_drift_psi,
    )

    t = prep(spark, sf_dir)
    events = t["events"]
    # sketch each snapshot ONCE (groups × KB rows); psi and the count
    # columns below both consume these without re-aggregating raw rows
    ska = kll_value_sketch(
        events.filter(F.col("event_id") % 2 == 0), ["event_type"], "value", k=16384
    ).localCheckpoint(eager=True)
    skb = kll_value_sketch(
        events.filter(F.col("event_id") % 2 == 1), ["event_type"], "value", k=16384
    ).localCheckpoint(eager=True)
    psi = quantile_drift_psi(ska, skb, ["event_type"], n_buckets=10)
    counts = ska.join(
        skb.select("event_type", F.col("kll").alias("_kb")), "event_type"
    ).select(
        "event_type",
        F.expr("kll_sketch_get_n_double(kll)").cast("long").alias("n_a"),
        F.expr("kll_sketch_get_n_double(_kb)").cast("long").alias("n_b"),
    )
    return counts.join(psi, "event_type").select(
        "event_type", "n_a", "n_b", F.round("psi", 6).alias("psi")
    )
