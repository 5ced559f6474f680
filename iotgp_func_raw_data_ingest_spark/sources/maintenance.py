"""Lake lifecycle maintenance beyond compaction: incremental rollup
refresh and retention enforcement.

Both operators exist because at 100 TB "recompute from scratch" stops
being a plan:

- ``incremental_rollup`` maintains a time-bucketed aggregate table from
  append increments WITHOUT rescanning history — the hypertable
  continuous-aggregate pattern. Only re-mergeable aggregates are
  supported (sum/count/min/max; avg = sum/count at read time; and
  approx_distinct — DataSketches HLL sketches merged by register-max
  union, estimated only at read time via ``rollup_distinct_estimate``;
  and approx_quantile — DataSketches KLL double sketches merged by
  ``kll_merge_agg_double``, estimated via ``rollup_quantile_estimate``),
  because those are exactly the aggregates whose partials combine
  associatively across refreshes.
- ``expire_lake_partitions`` drops partition directories older than a
  cutoff — retention is a directory delete on the partition key, never
  a row-level scan.

Spark-first: the increment aggregation is a plain groupBy (partial agg
map-side), the merge is the lake's crash-safe upsert machinery, and
retention leans on the partition layout that ``write_lake_generic``
already produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    _check_format,
    _hadoop_fs,
    _with_route_lease,
    read_lake_table,
    upsert_lake_table,
)

# aggregate -> (column builder, merge builder); merge re-aggregates the
# SAME function over partials except count (partials merge by sum),
# approx_distinct (partials are Apache DataSketches HLL binaries, merged
# by register-max union — insertion- and merge-order insensitive, so any
# increment batching converges to the identical sketch) and
# approx_quantile (DataSketches KLL double sketches, merged by
# kll_merge_agg_double — quantiles, unlike sum/min/max, have NO exact
# re-mergeable partial at all, so a sketch is the only way a rollup can
# answer p50/p95 without rescanning history)
MERGEABLE_AGGS = ("sum", "count", "min", "max", "approx_distinct", "approx_quantile")

# KLL accuracy knob: the sketch stores up to ~3k items and is EXACT while
# a group's total item count stays under k; beyond that the documented
# rank error is ~1.33%·(200/k)^0.9 — at 2048 well under 1% with ~99%
# confidence. 2048 doubles ≈ 16 KB per (bucket, dims) row: fixed-width
# state regardless of how many rows ever merged in.
KLL_K = 2048


def aggregate_increment(
    increment: DataFrame,
    ts_col: str,
    bucket: str,
    dims: list[str],
    value_col: str,
    aggs: tuple[str, ...] = ("sum", "count", "min", "max"),
) -> DataFrame:
    """Aggregate one append increment to (bucket_start, dims) partials.

    ``bucket`` is any ``date_trunc`` unit (hour/day/week/...). Output
    columns: ``bucket_start`` + dims + ``<agg>_v`` per agg — a partial
    row per (bucket, dims) that ``merge_rollup`` can combine with the
    persisted rollup."""
    for a in aggs:
        if a not in MERGEABLE_AGGS:
            raise ValueError(f"aggregate {a!r} is not re-mergeable; use {MERGEABLE_AGGS}")
    exprs = []
    for a in aggs:
        if a == "count":
            col = F.count(F.lit(1))
        elif a == "approx_distinct":
            # binary HLL sketch, not an estimate: the stored rollup stays
            # re-mergeable forever (estimate at read time via
            # rollup_distinct_estimate). The sketch hashes INT/BIGINT/
            # STRING/BINARY only, so values canonicalize through a string
            # cast — fine for the id-typed columns distinct-counting
            # targets, and deterministic for everything else.
            col = F.hll_sketch_agg(F.col(value_col).cast("string"))
        elif a == "approx_quantile":
            # binary KLL sketch over the double-cast value; estimate at
            # read time via rollup_quantile_estimate. Nulls are skipped
            # by the agg (a rollup quantile over "values present").
            col = F.kll_sketch_agg_double(
                F.col(value_col).cast("double"), F.lit(KLL_K)
            )
        else:
            col = getattr(F, a)(value_col)
        exprs.append(col.alias(f"{a}_v"))
    return (
        increment.groupBy(
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start"), *dims
        ).agg(*exprs)
    )


def merge_rollup_frames(
    existing: DataFrame, partial: DataFrame, dims: list[str], aggs: tuple[str, ...]
) -> DataFrame:
    """Combine a persisted rollup with a new partial on (bucket, dims):
    sums/counts add, mins/maxes re-min/max. Buckets touched by neither
    side pass through unchanged (full outer union + re-agg)."""
    keys = ["bucket_start", *dims]
    unioned = existing.unionByName(partial, allowMissingColumns=True)
    exprs = []
    for a in aggs:
        if a in ("sum", "count"):
            col = F.sum(f"{a}_v")
        elif a == "approx_distinct":
            col = F.hll_union_agg(f"{a}_v")
        elif a == "approx_quantile":
            col = F.kll_merge_agg_double(f"{a}_v")
        else:
            col = getattr(F, a)(f"{a}_v")
        exprs.append(col.alias(f"{a}_v"))
    return unioned.groupBy(*keys).agg(*exprs)


def rollup_distinct_estimate(rollup: DataFrame) -> DataFrame:
    """Read-time view of a rollup that carries an ``approx_distinct_v``
    HLL sketch column: replace the binary with its cardinality estimate
    (long). Kept separate from the stored table so the lake keeps the
    re-mergeable sketch; estimates are derived, never persisted."""
    return rollup.withColumn(
        "approx_distinct_v", F.hll_sketch_estimate("approx_distinct_v")
    )


def rollup_quantile_estimate(
    rollup: DataFrame, quantiles: dict[str, float]
) -> DataFrame:
    """Read-time view of a rollup carrying an ``approx_quantile_v`` KLL
    sketch: derive one named estimate column per requested fraction
    (``{"p50": 0.5, "p95": 0.95}`` → columns p50, p95) and drop the
    binary. Like rollup_distinct_estimate, estimates are derived at read
    time only — the persisted table keeps the re-mergeable sketch."""
    out = rollup
    for name, frac in quantiles.items():
        out = out.withColumn(
            name,
            F.kll_sketch_get_quantile_double("approx_quantile_v", F.lit(frac)),
        )
    return out.drop("approx_quantile_v")


def incremental_rollup(
    spark: SparkSession,
    lake_path: str,
    folder: str,
    source_db: str,
    table: str,
    increment: DataFrame,
    ts_col: str,
    bucket: str,
    dims: list[str],
    value_col: str,
    cfg: EngineConfig,
    aggs: tuple[str, ...] = ("sum", "count", "min", "max"),
    batch_id: int | None = None,
) -> tuple[int, int]:
    """Refresh a persisted rollup route from one append increment.

    The increment is aggregated to partials (one groupBy over the NEW
    data only), the affected buckets are re-merged with the persisted
    rollup, and the result lands via the crash-safe upsert swap. History
    is never rescanned: the carried side of the upsert's anti-join is
    the rollup (buckets × dims — small), not the raw events. Returns
    (rows_before, rows_after) of the rollup table.

    Invariant (pinned by test): N increments refreshed one at a time
    equal a single full recompute over their union — associativity of
    the re-mergeable aggregate set.

    Replay idempotence: pass ``batch_id`` (e.g. the foreachBatch id).
    The id rides in the route's ``_meta.json``, which the upsert seals
    into the swap — data and marker become visible atomically, so a
    replay of an already-applied batch is detected and SKIPPED even if
    the caller's own commit marker was lost to a crash. Unlike an
    append sink (where replay means duplicate rows), a replayed merge
    would silently double-count partials — hence the in-directory
    marker rather than only a checkpoint-side ledger.
    """
    path = f"{lake_path.rstrip('/')}/{folder}/{source_db}/{table}"
    _, hpath, fs = _hadoop_fs(spark, path)
    if batch_id is not None and fs.exists(hpath):
        from iotgp_func_raw_data_ingest_spark.sources.lake import read_route_meta

        meta = read_route_meta(spark, path)
        if meta is not None and meta.get("last_rollup_batch") == batch_id:
            n = meta.get("row_count", -1)
            return n, n  # already applied — replay after a crash
    partial = aggregate_increment(increment, ts_col, bucket, dims, value_col, aggs)
    if fs.exists(hpath):
        existing = read_lake_table(spark, lake_path, folder, source_db, table)
        merged = merge_rollup_frames(existing, partial, dims, aggs)
    else:
        merged = partial
    # every output row's key is its upsert key, so the upsert's anti-join
    # replaces exactly the touched buckets
    extra = {"last_rollup_batch": batch_id} if batch_id is not None else None
    return upsert_lake_table(
        spark,
        lake_path,
        folder,
        source_db,
        table,
        merged,
        ["bucket_start", *dims],
        cfg,
        meta_extra=extra,
    )


@_with_route_lease("expire-partitions", route_param="table_path")
def expire_lake_partitions(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    cutoff: str,
    fmt: str = "parquet",
    dry_run: bool = False,
) -> list[str]:
    """Retention enforcement on a partitioned table: drop every
    ``<partition_col>=<value>`` directory whose value sorts strictly
    below ``cutoff`` (works for ISO dates and zero-padded numeric
    partition values — the layouts the lake writes). Returns the dropped
    (or, with ``dry_run``, would-drop) partition values.

    Scale: a directory listing + per-partition recursive delete — O(no.
    of expired partitions), independent of row count; this is the whole
    point of partitioning by the retention key. Readers racing a delete
    see standard Spark behavior for vanished input files; run retention
    in the same maintenance window as compaction.
    """
    _check_format(fmt)
    _, hpath, fs = _hadoop_fs(spark, table_path)
    if not fs.exists(hpath):
        return []
    prefix = f"{partition_col}="
    dropped: list[str] = []
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith(prefix)):
            continue
        value = name[len(prefix):]
        if value < cutoff:
            dropped.append(value)
            if not dry_run:
                fs.delete(status.getPath(), True)
    return sorted(dropped)


def validate_lake(spark: SparkSession, lake_path: str, fmt: str = "parquet") -> list[dict]:
    """Lake health audit: walk every ``folder/source_db/table`` route and
    report, per route — actual row count vs the sidecar's ``row_count``,
    stranded swap directories (``.compact-old`` / ``.compact-tmp`` left
    by a crash; the next maintenance op heals them, but their presence
    means one crashed), and missing sidecars. The post-ingest invariant
    sweep an operator runs before publishing a lake snapshot (the
    downstream analog of q170's field-completeness audit).

    Returns one dict per route:
    ``{route, n_rows, meta_rows, rows_match, has_meta, stranded,
    snapshot}``. ``snapshot`` is None for routes without a generation
    ledger; otherwise a sub-audit of the snapshot layer:
    ``latest_generation``, ``generations`` (committed count),
    ``missing_files`` (referenced by the latest generation but neither
    live nor retired — a vacuum or operator deleted live history; the
    latest snapshot read RAISES), ``unpublished_files`` (live part
    files absent from the latest manifest — a writer appended without
    publishing, so snapshot readers silently MISS those rows; publish a
    delta-add or re-enable during a quiet moment), and
    ``orphan_retired`` (retired files no committed generation
    references — pure vacuum candidates, ``prune_generations`` clears
    them). ``snapshot_ok`` is the rolled-up boolean.

    Scale: listing is O(routes); each route's count is a metadata-only
    parquet job (footer row counts — no data scan). Routes audit
    independently, so a fleet-wide sweep parallelizes trivially.
    """
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        _check_format,
        _hadoop_fs,
        read_route_meta,
    )

    _check_format(fmt)
    jvm, root, fs = _hadoop_fs(spark, lake_path)
    if not fs.exists(root):
        return []
    reports: list[dict] = []

    def _dirs(p):
        return [
            s.getPath() for s in fs.listStatus(p)
            if s.isDirectory() and not s.getPath().getName().startswith("_")
        ]

    for folder_p in _dirs(root):
        for db_p in _dirs(folder_p):
            for table_p in _dirs(db_p):
                name = table_p.getName()
                if name.endswith(".compact-old") or name.endswith(".compact-tmp"):
                    continue  # reported against their base route below
                route = f"{folder_p.getName()}/{db_p.getName()}/{name}"
                dest = f"{lake_path.rstrip('/')}/{route}"
                stranded = [
                    suffix
                    for suffix in (".compact-old", ".compact-tmp")
                    if fs.exists(jvm.org.apache.hadoop.fs.Path(dest + suffix))
                ]
                # a crashed write_lake_typed leaves its dot-prefixed
                # staging dir inside the route (invisible to readers,
                # but the batch it staged never landed); a crashed
                # keyed delete / pruned merge leaves a .delete-stage- /
                # .merge-stage- dir (READY ones are completed by the
                # next maintenance writer via heal_staged_replaces —
                # their presence here means one crashed)
                for s in fs.listStatus(table_p):
                    sname = s.getPath().getName()
                    if not (
                        s.isDirectory()
                        and sname.startswith(
                            (".stage-", ".merge-stage-", ".delete-stage-")
                        )
                    ):
                        continue
                    # staged-replace stages carry a _lease naming their
                    # writer (lake.write_stage_lease) — surface it so an
                    # operator inspecting a stranded stage can tell
                    # whose it was and how old it is
                    lease_p = jvm.org.apache.hadoop.fs.Path(
                        f"{dest}/{sname}/_lease"
                    )
                    if fs.exists(lease_p):
                        import json as _json

                        stream = fs.open(lease_p)
                        try:
                            raw = bytes(
                                jvm.org.apache.commons.io.IOUtils.toByteArray(
                                    stream
                                )
                            )
                        finally:
                            stream.close()
                        try:
                            lease = _json.loads(raw.decode("utf-8"))
                            sname += (
                                f" (lease: {lease.get('kind')}/"
                                f"{str(lease.get('writer'))[:8]} "
                                f"{lease.get('created_utc')})"
                            )
                        except ValueError:
                            sname += " (lease: unreadable)"
                    stranded.append(sname)
                # a hard crash mid sidecar-swap leaves _meta.json.new;
                # the batch it belongs to is fully on disk (the .new
                # name only lands after every data file), so completing
                # the swap is always safe — heal it here, report it
                new_meta = jvm.org.apache.hadoop.fs.Path(
                    f"{dest}/_meta.json.new"
                )
                if fs.exists(new_meta):
                    meta_p = jvm.org.apache.hadoop.fs.Path(
                        f"{dest}/_meta.json"
                    )
                    if fs.exists(meta_p):
                        fs.delete(meta_p, False)
                    fs.rename(new_meta, meta_p)
                    stranded.append("_meta.json.new (healed)")
                r = spark.read
                if fmt == "parquet":
                    r = r.option("mergeSchema", "true")
                if fmt == "csv":
                    r = r.option("header", "true")
                try:
                    n_rows = r.format(fmt).load(dest).count()
                except Exception:
                    n_rows = -1
                meta = read_route_meta(spark, dest)
                meta_rows = (meta or {}).get("row_count")
                reports.append(
                    {
                        "route": route,
                        "n_rows": n_rows,
                        "meta_rows": meta_rows,
                        "rows_match": meta_rows is None or meta_rows == n_rows,
                        "has_meta": meta is not None,
                        "stranded": stranded,
                        "snapshot": _audit_snapshot(spark, jvm, fs, dest),
                    }
                )
    return reports


def _audit_snapshot(spark: SparkSession, jvm, fs, dest: str) -> dict | None:
    """Generation-ledger sub-audit for one route (None when snapshots
    were never enabled). Driver-side metadata only: the manifests are
    small JSONs and the file checks are existence probes — no data
    scan, so a fleet-wide sweep stays cheap at any route size."""
    from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap

    jfs_path = jvm.org.apache.hadoop.fs.Path
    gens = snap.list_generations(spark, dest)
    if not gens:
        return None
    latest = snap.read_generation(spark, dest, gens[-1])
    latest_files = set(latest["files"])
    missing = []
    for name in sorted(latest_files):
        if not (
            fs.exists(jfs_path(f"{dest}/{name}"))
            or fs.exists(jfs_path(f"{dest}/{snap.RETIRED_DIR}/{name}"))
        ):
            missing.append(name)
    live = {
        st.getPath().getName()
        for st in fs.listStatus(jfs_path(dest))
        if st.getPath().getName().startswith("part-")
    }
    unpublished = sorted(live - latest_files)
    referenced: set[str] = set()
    for g in gens:
        referenced.update(snap.read_generation(spark, dest, g)["files"])
    orphan_retired = []
    retired_p = jfs_path(f"{dest}/{snap.RETIRED_DIR}")
    if fs.exists(retired_p):
        orphan_retired = sorted(
            st.getPath().getName()
            for st in fs.listStatus(retired_p)
            if st.getPath().getName() not in referenced
        )
    return {
        "latest_generation": gens[-1],
        "generations": len(gens),
        "missing_files": missing,
        "unpublished_files": unpublished,
        "orphan_retired": orphan_retired,
        "snapshot_ok": not missing and not unpublished,
    }


def _finish_keyed_delete(
    spark: SparkSession,
    table_path: str,
    stage_name: str,
    manifest: tuple[list[str], list[str]] | None = None,
) -> int:
    """Complete a READY keyed-delete stage — delegates to the shared
    staged-replace commit step (``lake._finish_staged_replace``, also
    the commit of the file-pruned merge): remove every original file
    named in the stage manifest that still exists, move the staged
    survivor files into the table, drop the stage. Idempotent — safe to
    re-run after a crash at any point past the ready marker. Returns the
    number of staged files moved in. ``manifest`` (affected, staged) is
    the in-line commit's copy of the just-sealed manifest — passed
    through so the happy path skips the manifest re-read + stage
    re-list (see lake._finish_staged_replace)."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import _finish_staged_replace

    return _finish_staged_replace(spark, table_path, stage_name, manifest=manifest)


@_with_route_lease("keyed-delete", route_param="table_path")
def delete_keys_from_table(
    spark: SparkSession,
    table_path: str,
    key_col: str,
    keys: DataFrame,
    fmt: str = "parquet",
) -> dict:
    """Keyed (right-to-be-forgotten) delete that rewrites ONLY the files
    containing matching keys — untouched files are never read twice nor
    rewritten, which is the property that makes targeted deletes viable
    on a 100 TB table (a full filter-and-rewrite pass costs a table scan
    plus a table write regardless of how few rows die).

    Protocol (crash-safe, mirrors the lake's stage conventions):

    1. PLAN — one scan with ``input_file_name()`` semi-joined to the
       broadcast key set finds the affected files (parquet footer
       min/max stats prune row groups engine-side, so cold files cost
       footer reads). The file list is route-cardinality bounded.
    2. STAGE — survivors of ONLY the affected files are written to a
       dot-prefixed stage dir inside the table (invisible to readers),
       with a ``_manifest.json`` naming the originals, then a ``_ready``
       marker — nothing live has changed yet; a crash here strands an
       ignorable stage that the next invocation clears.
    3. COMMIT — rename the staged survivor files in, delete the
       originals, drop the stage (``_finish_keyed_delete``, idempotent).
       A reader racing the commit transiently sees survivor rows
       DUPLICATED from an affected file (move-first — original and
       replacement both live for an instant), never missing; the doomed
       keys are fully gone the moment the commit completes, which is
       when a forget request is satisfied either way. A crash mid-commit
       is healed by the next invocation re-running the finish step off
       the manifest.

    Returns ``{files_total, files_rewritten, rows_deleted, rows_kept}``.
    """
    import uuid as _uuid

    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        _check_format,
        _hadoop_fs,
    )

    _check_format(fmt)
    jvm, hpath, fs = _hadoop_fs(spark, table_path)

    # heal crashed commits (ready stages, OURS OR the pruned merge's) /
    # clear aborted stage writes — cross-kind: planning against a READY
    # stage's doomed originals would double-apply once the other
    # writer's healer ran (see lake.heal_staged_replaces) — and take
    # the part-file census off the SAME listing (one round-trip)
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        _heal_and_count_parts,
    )

    _, files_total = _heal_and_count_parts(spark, table_path)
    # Pin the (broadcast-small-by-contract) key set once: it feeds TWO
    # broadcast builds (the PLAN semi-join and the survivor anti-join),
    # which previously re-executed the caller's key plan per build.
    # NULL keys are dropped up front — they can never equal-join either
    # way, so they only inflated the broadcast. The pinned set also
    # yields the min/max probe for the same footer-prunable range
    # pre-filter the pruned merge's PLAN uses: files whose key range
    # misses the doomed range are skipped on parquet footer stats
    # before the semi-join runs (guide §6 — pushdown must reach the
    # scan; at 100 TB the PLAN pass is the delete's only table-wide
    # scan, and the range filter is what bounds it).
    keyed = (
        keys.select(key_col)
        .filter(F.col(key_col).isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    bounds = keyed.agg(
        F.min(key_col).alias("_lo"), F.max(key_col).alias("_hi")
    ).first()
    if bounds["_lo"] is None:  # no non-null keys — nothing can match
        return {
            "files_total": files_total, "files_rewritten": 0,
            "rows_deleted": 0, "rows_kept": 0,
        }
    df = spark.read.format(fmt).load(table_path)
    tagged = df.filter(
        F.col(key_col).between(F.lit(bounds["_lo"]), F.lit(bounds["_hi"]))
    ).withColumn("_file", F.input_file_name())
    affected = sorted(
        r["_file"]
        for r in tagged.join(F.broadcast(keyed), key_col, "left_semi")
        .select("_file").distinct().collect()
    )
    if not affected:
        return {
            "files_total": files_total, "files_rewritten": 0,
            "rows_deleted": 0, "rows_kept": 0,
        }

    # both accounting counts ride the staging write itself (q207's
    # Observation pattern) — the affected files are read exactly once
    from pyspark.sql import Observation

    obs_in = Observation("delete_in")
    obs_out = Observation("delete_out")
    survivors = (
        spark.read.format(fmt).load(affected)
        .observe(obs_in, F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(keyed), key_col, "left_anti")
        .observe(obs_out, F.count(F.lit(1)).alias("n"))
    )

    from iotgp_func_raw_data_ingest_spark.sources.lake import write_stage_lease

    stage_name = f".delete-stage-{_uuid.uuid4().hex}"
    stage = f"{table_path}/{stage_name}"
    # lease first (single-writer contract diagnostics + healing grace
    # anchor), then APPEND-mode staging write so the lease survives
    write_stage_lease(spark, stage, "delete")
    survivors.repartition(max(1, len(affected))).write.mode("append").format(
        fmt
    ).save(stage)
    n_before = int(obs_in.get["n"])
    rows_kept = int(obs_out.get["n"])
    # manifest names the doomed originals and the staged survivors
    # (basenames — the table dir is flat for part files), then the
    # ready marker seals the stage
    from iotgp_func_raw_data_ingest_spark.sources.lake import _seal_stage

    affected_names = [a.rsplit("/", 1)[-1] for a in affected]
    staged_names = _seal_stage(spark, stage, affected_names)

    _finish_keyed_delete(
        spark, table_path, stage_name, manifest=(affected_names, staged_names)
    )
    return {
        "files_total": files_total,
        "files_rewritten": len(affected),
        "rows_deleted": n_before - rows_kept,
        "rows_kept": rows_kept,
    }


@_with_route_lease("expire-tombstones", route_param="table_path")
def expire_tombstones(
    spark: SparkSession,
    table_path: str,
    horizon_seq,
    fmt: str = "parquet",
) -> dict:
    """Retention for soft-deleted CDC rows: hard-delete tombstone rows
    (``_deleted = true``, written by ``start_cdc_merge_stream(
    retain_tombstones=True)``) whose persisted ``_seq`` is at or below
    ``horizon_seq``, rewriting ONLY the files that hold one — the same
    file-pruned staged-replace protocol as the keyed delete, so cost ∝
    tombstone-bearing files, never route size.

    The horizon is a SAFETY promise, not a clock: expiring a tombstone
    re-opens the stale-change resurrection window for exactly that key
    at seqs ≤ its tombstone's, so pass the largest seq the operator
    KNOWS can no longer arrive (the CDC source's retention horizon
    mapped to seq — e.g. the log LSN the topic has already truncated
    past). Live rows are never touched, whatever their ``_seq``;
    tombstones above the horizon are kept verbatim.

    PLAN scans only the marker + seq columns (+ the virtual file name):
    parquet footer stats on the boolean ``_deleted`` skip all-live
    files before any row is read. STAGE rewrites survivors of the
    affected files; COMMIT is the shared crash-healed staged replace
    (snapshot-enabled routes publish a generation + retire originals,
    like every other rewrite). Returns ``{files_total, files_rewritten,
    tombstones_removed, rows_kept}``.

    Reference parity: engine-added (SURVEY §2.6); the reference has no
    delete story at all (append-only, src/function_app.py:389-414)."""
    import uuid as _uuid

    from pyspark.sql import Observation

    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        _check_format,
        _hadoop_fs,
        _heal_and_count_parts,
        _seal_stage,
        write_stage_lease,
    )

    _check_format(fmt)
    jvm, hpath, fs = _hadoop_fs(spark, table_path)
    # heal + part-file census off one listing (see lake helper)
    _, files_total = _heal_and_count_parts(spark, table_path)
    r = spark.read
    if fmt == "parquet":
        r = r.option("mergeSchema", "true")
    if fmt == "csv":
        r = r.option("header", "true")
    df = r.format(fmt).load(table_path)
    zero = {
        "files_total": files_total, "files_rewritten": 0,
        "tombstones_removed": 0, "rows_kept": 0,
    }
    if "_deleted" not in df.columns or "_seq" not in df.columns:
        return zero  # never ran in tombstone mode — nothing to expire
    # PLAN predicate: the bare conjunction — a NULL ``_deleted``
    # (pre-evolution row) yields NULL, which a filter drops, exactly the
    # doomed-set semantics — and unlike a coalesce() form it pushes
    # EqualTo(_deleted,true) + the _seq range into the parquet scan, so
    # footer stats skip all-live files before any row is read
    # (explain-verified: PushedFilters carries both).
    doomed_plan = (F.col("_deleted") == F.lit(True)) & (
        F.col("_seq") <= F.lit(horizon_seq)
    )
    # survivors complement: here NULL ``_deleted`` must SURVIVE, so the
    # negation needs the coalesce (three-valued ~NULL would drop it).
    # The seq comparison is coalesced too: an externally written
    # tombstone with NULL ``_seq`` has no horizon to compare against —
    # treat it as above-horizon (never doomed) rather than letting the
    # bare NULL comparison silently hard-delete it whenever its file is
    # rewritten for another doomed row. (The PLAN predicate above stays
    # bare: a NULL-seq tombstone never selects a file, which is exactly
    # right — it is not doomed.)
    doomed = F.coalesce(F.col("_deleted"), F.lit(False)) & F.coalesce(
        F.col("_seq") <= F.lit(horizon_seq), F.lit(False)
    )
    affected = sorted(
        row["_file"]
        for row in df.select("_deleted", "_seq")
        .withColumn("_file", F.input_file_name())
        .filter(doomed_plan)
        .select("_file")
        .distinct()
        .collect()
    )
    if not affected:
        return zero

    obs_in = Observation("expire_in")
    obs_out = Observation("expire_out")
    ra = spark.read
    if fmt == "parquet":
        ra = ra.option("mergeSchema", "true")
    if fmt == "csv":
        ra = ra.option("header", "true")
    survivors = (
        ra.format(fmt).load(affected)
        .observe(obs_in, F.count(F.lit(1)).alias("n"))
        .filter(~doomed)
        .observe(obs_out, F.count(F.lit(1)).alias("n"))
    )

    stage_name = f".delete-stage-{_uuid.uuid4().hex}"
    stage = f"{table_path}/{stage_name}"
    write_stage_lease(spark, stage, "expire-tombstones")
    survivors.repartition(max(1, len(affected))).write.mode("append").format(
        fmt
    ).save(stage)
    n_before = int(obs_in.get["n"])
    rows_kept = int(obs_out.get["n"])
    affected_names = [a.rsplit("/", 1)[-1] for a in affected]
    staged_names = _seal_stage(spark, stage, affected_names)
    _finish_keyed_delete(
        spark, table_path, stage_name, manifest=(affected_names, staged_names)
    )
    return {
        "files_total": files_total,
        "files_rewritten": len(affected),
        "tombstones_removed": n_before - rows_kept,
        "rows_kept": rows_kept,
    }
