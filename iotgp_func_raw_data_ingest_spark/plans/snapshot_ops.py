"""Round-10 tranche: generation-pointer snapshots over the lake
(``sources/snapshots.py``).

- q232: **time travel** — the reproducible-training-data primitive: a
  route is snapshot-enabled (generation 1), a keyed delete rewrites the
  affected files (generation 2), a compaction rewrites the whole layout
  (generation 3) — and a read pinned to generation 1 must still return
  the ORIGINAL rows byte-for-byte, resolved through the ``_retired/``
  area both rewrites moved the replaced files into. The latest read
  must see the delete and survive the compaction unchanged. The oracle
  states both worlds declaratively (full table vs. key-filtered); the
  gate catches a retired file silently deleted (gen-1 read raises or
  shrinks), a generation manifest that captured a torn file set (counts
  or sums drift), or a compaction that failed to salvage the history
  (gen-1 read gone).
- q234: **incremental view maintenance** — a keyed count+sum view
  (``sources/ivm.py``) follows the route through a pruned MERGE and a
  keyed delete via the change feed alone (initial build → two
  incremental refreshes → noop), with DECIMAL sums so retractions are
  exact, and must equal the oracle's from-scratch aggregate of the
  declaratively reconstructed final state. A missed retraction, a
  double-applied feed, or a group that failed to drop at zero flips a
  count or sum.
- q233: **change data feed** — the incremental-consumption primitive:
  a snapshot-enabled route takes one pruned MERGE (updates + deletes +
  re-keyed inserts), and ``read_changes_between(1, 2)`` must emit
  EXACTLY the net row-level changes — update pre/post images, deleted
  rows, inserted rows — with every carried row (rewritten-but-unchanged
  ballast in the affected files) cancelled by the multiset diff. The
  oracle reconstructs all four change classes declaratively from the
  base table; a carried row leaking into the feed, a lost insert, or a
  mis-classified update flips a count or sum.

Scale story (measured in tools/stress_smoke.py's snapshot tier):
publish/resolve are driver-side metadata ops over one JSON of
O(files-per-route) names — cost independent of data bytes; a snapshot
read lists NOTHING (no recursive object-store LIST at 100 TB, the
manifest IS the file list). Time travel holds until
``prune_generations`` vacuums, exactly like any lakehouse retention
contract.

Reference parity: engine-added (SURVEY §2.6) — the reference has no
reader-consistency or versioning story at all (its blob uploads are
independent non-atomic puts, src/function_app.py:389-414).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q232_snapshot_time_travel",
    oracle="""
    SELECT 'g1_pre_delete' AS snapshot,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(ROUND(c_acctbal, 2)), 2) AS sum_bal
    FROM customer
    UNION ALL
    SELECT 'latest' AS snapshot,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(ROUND(c_acctbal, 2)), 2) AS sum_bal
    FROM customer
    WHERE c_custkey % 97 <> 0
    """,
)
def q232_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-enabled lake lifecycle: enable (gen 1) → keyed delete of
    ``k % 97 = 0`` (gen 2, staged replace publishes + retires) →
    compaction (gen 3, whole-route swap salvages the history) → read
    generation 1 AND the latest generation via
    ``snapshots.read_route_snapshot`` and aggregate each under a label.
    The builder additionally asserts the generation ledger itself:
    exactly [1, 2, 3] with kinds [enable, delete, compact], a non-empty
    ``_retired/`` area, and gen-2 row count == gen-3 row count
    (compaction must not change content). Eager lake lifecycle per the
    plans/__init__ convention; result pinned with localCheckpoint
    before the temp route is removed."""
    from iotgp_func_raw_data_ingest_spark.config import EngineConfig
    from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
    from iotgp_func_raw_data_ingest_spark.sources.lake import compact_lake_table
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        delete_keys_from_table,
    )

    t = prep(spark, sf_dir)
    cust = t["customer"].select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    work = tempfile.mkdtemp(prefix="q232_")
    try:
        lake = f"{work}/lake"
        cfg = EngineConfig(output_path=lake)
        route = f"{lake}/curated/crm/customers"
        cust.repartitionByRange(8, "k").write.parquet(route)

        assert snap.enable_snapshots(spark, route) == 1
        doomed = cust.filter(F.col("k") % 97 == 0).select("k")
        delete_keys_from_table(spark, route, "k", doomed)
        compact_lake_table(
            spark, lake, "curated", "crm", "customers", cfg
        )

        gens = snap.list_generations(spark, route)
        if gens != [1, 2, 3]:
            raise AssertionError(f"q232: generation ledger is {gens}, not [1,2,3]")
        kinds = [snap.read_generation(spark, route, g)["kind"] for g in gens]
        if kinds != ["enable", "delete", "compact"]:
            raise AssertionError(f"q232: generation kinds are {kinds}")
        g2_n = snap.read_route_snapshot(spark, route, generation=2).count()
        g3_n = snap.read_route_snapshot(spark, route, generation=3).count()
        if g2_n != g3_n:
            raise AssertionError(
                f"q232: compaction changed row count ({g2_n} -> {g3_n})"
            )
        retired = snap.resolve_snapshot(spark, route, 1)["paths"]
        if not any(snap.RETIRED_DIR in p for p in retired):
            raise AssertionError(
                "q232: generation 1 resolves entirely to live files — "
                "the rewrites retired nothing, time travel untested"
            )

        def agg(df: DataFrame, label: str) -> DataFrame:
            return df.agg(
                F.lit(label).alias("snapshot"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.round(F.sum("bal"), 2).alias("sum_bal"),
            ).select("snapshot", "n", "sum_bal")

        out = agg(
            snap.read_route_snapshot(spark, route, generation=1),
            "g1_pre_delete",
        ).unionByName(agg(snap.read_route_snapshot(spark, route), "latest"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q233_generation_change_feed",
    oracle="""
    WITH base AS (
      SELECT c_custkey AS k, ROUND(c_acctbal, 2) AS bal FROM customer
    ),
    upd AS (SELECT k, bal FROM base WHERE k % 50 = 0 AND k % 97 <> 0),
    del AS (SELECT k, bal FROM base WHERE k % 97 = 0),
    ins AS (SELECT -(k + 1) AS k, ROUND(bal + 7.5, 2) AS bal
            FROM base WHERE k % 61 = 0)
    SELECT 'update_preimage' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           ROUND(SUM(bal), 2) AS sum_bal
    FROM upd
    UNION ALL
    SELECT 'update_postimage', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT), ROUND(SUM(ROUND(bal + 1000, 2)), 2)
    FROM upd
    UNION ALL
    SELECT 'delete', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT), ROUND(SUM(bal), 2)
    FROM del
    UNION ALL
    SELECT 'insert', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT), ROUND(SUM(bal), 2)
    FROM ins
    """,
)
def q233_generation_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed lifecycle: snapshot-enable a range-clustered
    customer route (gen 1), apply ONE pruned MERGE carrying all three
    CDC shapes — op 'u' adds 1000 to bal for ``k % 50 = 0`` (and not a
    delete key), op 'd' removes ``k % 97 = 0``, op 'i' inserts re-keyed
    ``-(k+1)`` rows for ``k % 61 = 0`` — publishing generation 2, then read
    ``snapshots.read_changes_between(1, 2, key_cols=['k'])`` and
    aggregate per change class. The builder asserts the ledger is
    exactly [enable, merge] and ``rows_carried > 0`` (so the feed's
    carried-row cancellation is genuinely exercised — the affected
    files were mostly ballast). Modular key conditions keep every
    change class non-empty at every SF with no collected constants on
    the oracle side. Eager lake lifecycle per the plans/__init__
    convention; result pinned with localCheckpoint before the temp
    route is removed.

    100 TB shape: the feed reads ONLY the files generations 1 and 2
    disagree on (``diff_generations`` is two small JSONs, no listing),
    and the exceptAll shuffle carries delta bytes, not route bytes —
    an incremental consumer pays ∝ what changed. Scattered ``k % 50``
    keys deliberately touch many files here (feed correctness under
    wide rewrites); the touched-files economics witness is q229."""
    from iotgp_func_raw_data_ingest_spark.config import EngineConfig
    from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        merge_lake_table_pruned,
    )

    t = prep(spark, sf_dir)
    cust = t["customer"].select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    work = tempfile.mkdtemp(prefix="q233_")
    try:
        lake = f"{work}/lake"
        cfg = EngineConfig(output_path=lake)
        route = f"{lake}/curated/crm/customers"
        cust.repartitionByRange(8, "k").write.parquet(route)
        assert snap.enable_snapshots(spark, route) == 1

        updates = cust.filter(
            (F.col("k") % 50 == 0) & (F.col("k") % 97 != 0)
        ).withColumn("op", F.lit("u"))
        deletes = cust.filter(F.col("k") % 97 == 0).withColumn(
            "op", F.lit("d")
        )
        # re-key as -(k+1): strictly negative, so never a target match —
        # a bare -k would collide at k = 0 (custkeys start at 0)
        inserts = cust.filter(F.col("k") % 61 == 0).select(
            (-(F.col("k") + 1)).alias("k"),
            F.col("seg"),
            F.round(F.col("bal") + 7.5, 2).alias("bal"),
            F.lit("i").alias("op"),
        )
        report = merge_lake_table_pruned(
            spark, lake, "curated", "crm", "customers",
            updates.unionByName(deletes).unionByName(inserts), ["k"], cfg,
            matched_update={"bal": "ROUND(t.bal + 1000, 2)"},
            matched_update_condition="s.op = 'u'",
            matched_delete_condition="s.op = 'd'",
        )
        if report["rows_carried"] <= 0:
            raise AssertionError(
                "q233: no carried rows — cancellation untested"
            )
        gens = snap.list_generations(spark, route)
        kinds = [snap.read_generation(spark, route, g)["kind"] for g in gens]
        if kinds != ["enable", "merge"]:
            raise AssertionError(f"q233: generation kinds are {kinds}")

        feed = snap.read_changes_between(spark, route, 1, 2, key_cols=["k"])
        out = feed.groupBy(
            F.col("_change_type").alias("change_type")
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.sum("bal"), 2).alias("sum_bal"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q234_ivm_refresh",
    oracle="""
    WITH base AS (
      SELECT c_custkey AS k, c_mktsegment AS seg,
             CAST(ROUND(c_acctbal, 2) AS DECIMAL(12,2)) AS bal
      FROM customer
    ),
    merged AS (
      SELECT k, seg,
             CASE WHEN k % 50 = 0 AND k % 97 <> 0
                  THEN CAST(bal + 1000 AS DECIMAL(12,2)) ELSE bal END AS bal
      FROM base WHERE k % 97 <> 0
      UNION ALL
      SELECT -(k + 1) AS k, seg, CAST(bal + 7.5 AS DECIMAL(12,2)) AS bal
      FROM base WHERE k % 61 = 0
    ),
    final AS (SELECT * FROM merged WHERE k % 3 <> 0)
    SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(bal) AS DOUBLE) AS sum_bal
    FROM final GROUP BY seg
    """,
)
def q234_ivm_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-view-maintenance lifecycle: a seg → (count, exact
    DECIMAL sum) view of a snapshot-enabled customer route is built once
    (initial, generation 1), then maintained through q233's pruned
    MERGE (updates + deletes + re-keyed inserts → generation 2) and a
    keyed delete of ``k % 3 = 0`` (generation 3) purely from the change
    feed — never re-scanning the route — and a fourth refresh must
    no-op. The result is the maintained view itself (sums cast to
    double at the edge, q75's exact-arithmetic rule); the oracle
    reconstructs the final table state declaratively and aggregates
    from scratch, so the gate catches a missed retraction, a
    double-applied delta, or a zero-count group that failed to drop.
    Eager lake lifecycle per the plans/__init__ convention.

    100 TB shape: each refresh reads the delta files (feed) + the view
    (groups-sized) + two JSON manifests; the one full scan is the
    pinned initial build. Retraction-capable count/sum is exactly the
    self-maintainable aggregate class — the append-only rollup
    (q177/q180) covers min/max/HLL/KLL, which no feed can subtract."""
    from iotgp_func_raw_data_ingest_spark.config import EngineConfig
    from iotgp_func_raw_data_ingest_spark.sources import ivm
    from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        merge_lake_table_pruned,
    )
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        delete_keys_from_table,
    )

    t = prep(spark, sf_dir)
    cust = t["customer"].select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.round("c_acctbal", 2).cast("decimal(12,2)").alias("bal"),
    )
    work = tempfile.mkdtemp(prefix="q234_")
    try:
        lake = f"{work}/lake"
        cfg = EngineConfig(output_path=lake)
        route = f"{lake}/curated/crm/customers"
        view = f"{work}/view"
        cust.repartitionByRange(8, "k").write.parquet(route)
        assert snap.enable_snapshots(spark, route) == 1

        r0 = ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
        if r0["mode"] != "initial":
            raise AssertionError(f"q234: first refresh was {r0['mode']}")

        updates = cust.filter(
            (F.col("k") % 50 == 0) & (F.col("k") % 97 != 0)
        ).withColumn("op", F.lit("u"))
        deletes = cust.filter(F.col("k") % 97 == 0).withColumn(
            "op", F.lit("d")
        )
        inserts = cust.filter(F.col("k") % 61 == 0).select(
            (-(F.col("k") + 1)).alias("k"),
            F.col("seg"),
            (F.col("bal") + F.lit(7.5)).cast("decimal(12,2)").alias("bal"),
            F.lit("i").alias("op"),
        )
        merge_lake_table_pruned(
            spark, lake, "curated", "crm", "customers",
            updates.unionByName(deletes).unionByName(inserts), ["k"], cfg,
            matched_update={"bal": "CAST(t.bal + 1000 AS DECIMAL(12,2))"},
            matched_update_condition="s.op = 'u'",
            matched_delete_condition="s.op = 'd'",
        )
        r1 = ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])

        doomed = (
            spark.read.parquet(route)
            .filter(F.col("k") % 3 == 0)
            .select("k")
        )
        delete_keys_from_table(spark, route, "k", doomed)
        r2 = ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
        r3 = ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["bal"])
        modes = (r1["mode"], r2["mode"], r3["mode"])
        if modes != ("incremental", "incremental", "noop"):
            raise AssertionError(f"q234: refresh modes were {modes}")
        if not (r1["groups_delta"] and r2["groups_delta"]):
            raise AssertionError("q234: an incremental refresh touched 0 groups")

        out = ivm.read_view(spark, view).select(
            "seg",
            F.col("n_rows"),
            F.col("sum_bal").cast("double").alias("sum_bal"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
