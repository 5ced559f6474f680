"""Streaming ingest + event-time operators.

The reference is an at-least-once, per-event Azure Function with offsets
managed by the Functions host (src/function_app.py:302-310; SURVEY.md
§2.5 E3). The Spark-native equivalent is Structured Streaming:

- ``start_ingest_stream``: readStream → the SAME batch transform
  (operators.ingest.ingest_pipeline) applied per micro-batch via
  ``foreachBatch`` → typed lake write. foreachBatch is at-least-once by
  contract (a retried batch re-runs the sink), so the sink keeps a
  committed-batch ledger under the checkpoint dir and skips batch ids it
  has fully written. Residual duplicate window: a crash after the last
  route's file commit but before the ledger marker lands replays that
  batch — effectively-once, degrading to at-least-once in that narrow
  window (the reference is at-least-once everywhere,
  src/function_app.py:302-310).
- Event-time windowed aggregations with watermarks — capabilities the
  reference lacks entirely (SURVEY.md §2.6) but a streaming engine needs:
  tumbling/sliding/session windows over the `events` stream, late data
  bounded by the watermark.

Scale: state for windowed aggs is keyed by (window, key) and pruned at
the watermark; foreachBatch writes reuse the batch sink, so the streaming
path adds no new shuffle beyond the batch plan's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.operators.ingest import ingest_pipeline
from iotgp_func_raw_data_ingest_spark.sources.lake import write_lake_typed


def _hadoop_path(spark, path: str):
    """(Path, FileSystem) for `path` via the session's Hadoop conf — works
    for any checkpoint filesystem (local, HDFS, object stores)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p, p.getFileSystem(spark._jsc.hadoopConfiguration())


def batch_committed(spark, checkpoint_dir: str, batch_id: int) -> bool:
    p, fs = _hadoop_path(spark, f"{checkpoint_dir.rstrip('/')}/_committed_batches/{batch_id}")
    return fs.exists(p)


def mark_batch_committed(spark, checkpoint_dir: str, batch_id: int) -> None:
    p, fs = _hadoop_path(spark, f"{checkpoint_dir.rstrip('/')}/_committed_batches/{batch_id}")
    fs.create(p, True).close()


def start_ingest_stream(
    bodies_stream: DataFrame,
    cfg: EngineConfig,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Stream of ``body`` rows → routed typed parquet lake.

    One foreachBatch per micro-batch = one reference trigger invocation;
    grouping/chunking semantics are identical to the batch sink. Batch
    replays (foreachBatch is at-least-once) are made idempotent by a
    committed-batch ledger: a replayed batch id whose marker exists is
    skipped instead of re-appended.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_committed(spark, checkpoint_dir, batch_id):
            return  # replay of a fully-written batch
        routed = ingest_pipeline(batch_df, destination_fallback=cfg.destination_fallback)
        write_lake_typed(routed, cfg)
        mark_batch_committed(spark, checkpoint_dir, batch_id)

    writer = bodies_stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) event-time window counts
    with late data bounded by ``watermark``. Works on static DataFrames
    too (watermark is a no-op in batch)."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: activity bursts per user separated by ``gap``."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col(key_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_stream_conversion_join(
    clicks: DataFrame,
    purchases: DataFrame,
    key_col: str = "user_id",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: purchases attributed to a prior click by
    the same user within ``within``. Both sides watermarked so join state
    is pruned once the time bound passes — bounded state at any volume
    (the canonical funnel/attribution shape the reference cannot express).
    """
    c = clicks.select(
        F.col(key_col).alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col(key_col).alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def start_upsert_stream(
    updates_stream: DataFrame,
    lake_path: str,
    folder: str,
    source_db: str,
    table: str,
    key_cols: list[str],
    cfg: EngineConfig,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """CDC-style streaming merge: each micro-batch of correction/update
    rows is upserted by key into one lake route (last-write-wins,
    ``sources.lake.upsert_lake_table``) instead of appended — the
    streaming shape for sources that re-send corrected records.

    Idempotence: the same committed-batch ledger as the ingest stream —
    a replayed batch id is skipped, so at-least-once foreachBatch
    becomes effectively-once outside the crash-between-commit-and-marker
    window. Across batches the merge is last-write-wins; within one
    batch duplicate keys are collapsed to a single row first
    (dropDuplicates on the key — pre-aggregate upstream if a specific
    row must win an intra-batch tie).

    Scale: per-batch cost is the upsert's anti-join + carried-row
    rewrite — appropriate for fix-up feeds (small batches against one
    route), NOT for the firehose path, which appends (start_ingest_stream)
    and reconciles via a periodic batch upsert instead.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from iotgp_func_raw_data_ingest_spark.sources.lake import upsert_lake_table

        spark = batch_df.sparkSession
        if batch_committed(spark, checkpoint_dir, batch_id):
            return
        batch = batch_df.dropDuplicates(key_cols)
        upsert_lake_table(
            spark, lake_path, folder, source_db, table, batch, key_cols, cfg
        )
        mark_batch_committed(spark, checkpoint_dir, batch_id)

    writer = updates_stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_cdc_merge_stream(
    changes_stream: DataFrame,
    lake_path: str,
    folder: str,
    source_db: str,
    table: str,
    key_cols: list[str],
    seq_col: str,
    cfg: EngineConfig,
    checkpoint_dir: str,
    op_col: str = "op",
    delete_op: str = "d",
    set_cols: list[str] | None = None,
    persist_seq: bool = False,
    retain_tombstones: bool = False,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Tombstone-aware CDC apply: each micro-batch of change rows
    (Debezium-style — an ``op_col`` marking deletes, a monotone
    ``seq_col`` ordering changes, the remaining columns carrying the
    row's NEW values) is applied to one lake route via the file-pruned
    three-clause merge (``sources.lake.merge_lake_table_pruned``):

    - latest change per key within the batch wins (row_number over
      ``seq_col`` descending — CDC feeds legitimately carry several
      changes for one key per batch; ``start_upsert_stream``'s
      arbitrary-winner dropDuplicates is wrong for them);
    - ``op = delete_op``  → WHEN MATCHED THEN DELETE; for an ABSENT key
      the tombstone no-ops via the insert clause's condition
      (``WHEN NOT MATCHED AND s.op <> delete_op THEN INSERT``) instead
      of inserting the tombstone row;
    - any other op (create/update/snapshot-read) → upsert: WHEN MATCHED
      THEN UPDATE SET col = s.col for every data column, WHEN NOT
      MATCHED THEN INSERT.

    The op/seq columns never land in the target: inserts take the
    TARGET schema (source-only columns are dropped) and the update SET
    map covers only data columns — ``set_cols`` if given, else every
    source column that is not a key / op / seq column (which must then
    all exist in the target; pass ``set_cols`` explicitly when the feed
    carries extra metadata columns).

    Idempotence: the committed-batch ledger (as in the ingest/upsert
    streams) makes at-least-once foreachBatch effectively-once outside
    the crash-between-commit-and-marker window. Cross-batch ordering is
    the stream's arrival order — correct for a CDC log replayed in
    offset order, where ``seq_col`` is monotone with arrival.

    ``persist_seq=True`` removes that arrival-order requirement for
    rows the target HOLDS: the route keeps an engine-managed ``_seq``
    column (schema-evolved in on the first apply; pre-existing rows read
    as NULL = older-than-everything), and the matched clauses are
    guarded with ``s._seq > t._seq`` — a stale update or stale tombstone
    arriving in a later batch than a newer change for the same key is
    carried (no-op) instead of clobbering the newer row. Deterministic
    intra-batch collapse still runs first. Inserts record the arriving
    seq. LIMITATION (inherent to physical deletes): once a key's row is
    DELETED, its ``_seq`` is gone — a stale non-delete change for that
    key arriving in a later batch is indistinguishable from a first
    insert and resurrects the row (likewise a tombstone arriving before
    its key's insert no-ops, then the insert lands). ``_seq`` is
    reserved: a feed carrying its own ``_seq`` column is rejected.

    ``retain_tombstones=True`` (requires ``persist_seq``) CLOSES that
    window by never physically deleting: a winning delete becomes a
    soft-delete UPDATE — the row is kept with an engine-managed
    ``_deleted = true`` marker, its ``_seq`` advanced to the delete's,
    and its data columns nulled (a tombstone is key + markers, nothing
    else) — and a delete for an ABSENT key INSERTS that tombstone row
    instead of no-opping. Because the key's ``_seq`` now survives its
    death, a stale change arriving AFTER the tombstone (any seq below
    it, across any batch split) is carried, and a genuinely newer
    change resurrects the row legitimately (``_deleted`` flips back to
    false). There is no delete clause at all in this mode: the whole
    apply is one guarded update + one unconditional insert, so every
    path rides the same ``s._seq > t._seq`` comparison. Read contract:
    the route now contains tombstone rows — read it through
    ``sources.lake.read_cdc_table`` (filters ``_deleted``, also correct
    on pre-evolution files where the marker reads NULL) instead of a
    raw scan. Storage: tombstones accumulate until
    ``sources.maintenance.expire_tombstones`` hard-deletes those at or
    below a seq horizon — the operator's promise that no staler change
    can still arrive (a CDC topic's retention horizon, mapped to seq).
    Expiring below that promise re-opens exactly the window this mode
    closes, for exactly the expired keys. ``_deleted`` is reserved like
    ``_seq``.

    Scale: per batch, cost ∝ TOUCHED files (the pruned merge's PLAN/
    STAGE/COMMIT protocol), not route size — a small CDC batch against
    a 100 TB route stays a bounded maintenance action; the intra-batch
    collapse is one window function over the (small) batch.

    Reference parity: engine-added (SURVEY §2.6); the reference's only
    write is append-style (src/function_app.py:239-264).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    # op_col/delete_op are spliced into merge clause expressions — keep
    # them out of SQL-injection territory at construction time (the
    # backslash is Spark's string-escape char: unrejected it would
    # corrupt the clause literal and fail only at batch time)
    if "'" in delete_op or "\\" in delete_op:
        raise ValueError(
            "delete_op must not contain a single quote or backslash"
        )
    if not op_col.isidentifier():
        raise ValueError(f"op_col must be a plain identifier, got {op_col!r}")
    if set_cols is not None and not set_cols:
        raise ValueError(
            "set_cols=[] would update nothing on match — pass None to "
            "derive the SET map from the feed schema, or name the columns"
        )
    if retain_tombstones and not persist_seq:
        raise ValueError(
            "retain_tombstones requires persist_seq=True — a tombstone "
            "without a persisted seq cannot reject the stale changes it "
            "exists to reject"
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        from iotgp_func_raw_data_ingest_spark.sources.lake import (
            merge_lake_table_pruned,
        )

        spark = batch_df.sparkSession
        if batch_committed(spark, checkpoint_dir, batch_id):
            return
        missing = [c for c in (*key_cols, op_col, seq_col) if c not in batch_df.columns]
        if missing:
            raise ValueError(f"CDC stream is missing columns: {missing}")
        if persist_seq and "_seq" in batch_df.columns:
            raise ValueError(
                "persist_seq reserves the _seq column; the feed must not "
                "carry one"
            )
        if retain_tombstones and "_deleted" in batch_df.columns:
            raise ValueError(
                "retain_tombstones reserves the _deleted column; the feed "
                "must not carry one"
            )
        # deterministic collapse: latest change per key by seq, with a
        # content-hash tiebreaker — duplicate seq values for one key
        # would otherwise pick a partition-layout-dependent winner
        # (identical duplicate rows tie to the same content, so the
        # winner is unchanged either way)
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(seq_col).desc(),
            F.xxhash64(*[F.col(c) for c in batch_df.columns]).desc(),
        )
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # an explicit empty set_cols is rejected at construction; None
        # (the default) derives the map from the feed schema
        data_cols = (
            list(set_cols)
            if set_cols is not None
            else [
                c
                for c in batch_df.columns
                if c not in key_cols and c not in (op_col, seq_col)
            ]
        )
        bad_names = [c for c in data_cols if "`" in c]
        if bad_names:
            raise ValueError(
                f"CDC data columns must not contain backticks: {bad_names}"
            )
        stale_guard = ""
        evolve: bool | list[str] = False
        if persist_seq:
            latest = latest.withColumn("_seq", F.col(seq_col))
            data_cols = [*data_cols, "_seq"]
            # NULL t._seq = pre-persist_seq row (or schema-evolved
            # carry) — older than any arriving change by definition
            stale_guard = " AND (t._seq IS NULL OR s._seq > t._seq)"
            evolve = ["_seq"]
        if retain_tombstones:
            # soft delete: a winning delete is just another guarded
            # UPDATE, to the tombstone representation (data columns
            # nulled in the SOURCE so the matched-update SET map and
            # the unmatched INSERT write the identical tombstone row) —
            # no delete clause exists in this mode, so every path rides
            # the one s._seq > t._seq comparison
            is_del = F.col(op_col) == F.lit(delete_op)
            for c in data_cols:
                if c == "_seq":
                    continue
                latest = latest.withColumn(
                    c, F.when(is_del, F.lit(None)).otherwise(F.col(c))
                )
            latest = latest.withColumn("_deleted", is_del)
            data_cols = [*data_cols, "_deleted"]
            merge_lake_table_pruned(
                spark, lake_path, folder, source_db, table, latest,
                key_cols, cfg,
                matched_update={c: f"s.`{c}`" for c in data_cols},
                matched_update_condition=stale_guard.removeprefix(" AND "),
                matched_delete_condition=None,
                not_matched_condition=None,
                evolve_schema=["_seq", "_deleted"],
            )
            mark_batch_committed(spark, checkpoint_dir, batch_id)
            return
        merge_lake_table_pruned(
            spark, lake_path, folder, source_db, table, latest, key_cols, cfg,
            # backtick-quote: feed schemas carry legal-but-non-identifier
            # names ('first name', 'bal-ance') that would otherwise parse
            # as expressions inside the SET map
            matched_update={c: f"s.`{c}`" for c in data_cols},
            matched_update_condition=(
                stale_guard.removeprefix(" AND ") if stale_guard else None
            ),
            matched_delete_condition=(
                f"s.{op_col} = '{delete_op}'{stale_guard}"
            ),
            not_matched_condition=f"s.{op_col} <> '{delete_op}'",
            evolve_schema=evolve,
        )
        mark_batch_committed(spark, checkpoint_dir, batch_id)

    writer = changes_stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# generation kinds whose manifest replaces EVERY file (published by
# lake._refresh_generation_after_rewrite): a change-feed diff against
# one reads the whole route, so the follower isolates each in its own
# singleton span. "enable" is also a full listing but is always a
# span's base (generation 1), never its interior.
WHOLE_ROUTE_REWRITE_KINDS = frozenset({"compact", "upsert", "merge_full"})


def _ledger_stream(spark, route: str, start_generation: int) -> DataFrame:
    from iotgp_func_raw_data_ingest_spark.sources.pydatasource import (
        register_python_datasources,
    )

    register_python_datasources(spark)
    return (
        spark.readStream.format("generation_ledger_stream")
        .option("route", route)
        .option("start_generation", str(start_generation))
        .load()
    )


def _feed_span_bounds(gens: list[tuple[int, str]]) -> list[tuple[int, int]]:
    """Split a ledger batch's generation span at whole-route-rewrite
    generations (see ``start_changes_stream``'s contract): returns the
    ordered (from, to] sub-spans whose feeds, applied in order, compose
    to the batch's one compressed feed. ``gens`` is the batch's sorted
    (generation, kind) rows; an empty batch yields no spans."""
    if not gens:
        return []
    base = max(gens[0][0] - 1, 1)
    to = gens[-1][0]
    bounds: list[tuple[int, int]] = []
    cur = base
    for g, kind in gens:
        if g <= cur:
            continue
        if kind in WHOLE_ROUTE_REWRITE_KINDS:
            if g - 1 > cur:
                bounds.append((cur, g - 1))
            bounds.append((g - 1, g))
            cur = g
    if to > cur:
        bounds.append((cur, to))
    return bounds


def start_changes_stream(
    spark,
    route: str,
    sink,
    checkpoint_dir: str,
    key_cols: list[str] | None = None,
    fmt: str = "parquet",
    start_generation: int = 0,
    live_only: bool = False,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Follow a snapshot-enabled route's generation ledger CONTINUOUSLY,
    pushing each newly committed generation's row-level change feed
    through ``sink(feed_df, from_generation, to_generation)`` — the
    always-on form of ``snapshots.read_changes_between`` (its one-shot
    batch shape), so downstream consumers react to commits instead of
    polling with cron.

    Mechanics: the ``generation_ledger_stream`` Python data source emits
    one row per committed generation, with the OFFSET equal to the
    generation number — Spark's own offset log therefore checkpoints
    the applied-generation watermark, and a restarted stream resumes
    from exactly the last generation a committed batch consumed. Inside
    ``foreachBatch``, the batch's generation span collapses to ONE
    compressed feed (``read_changes_between(first-1, last)`` — net
    changes, carried ballast cancelled), computed from only the files
    the span's manifests disagree on.

    Semantics the caller must know:

    - ``start_generation=N`` emits changes committed AFTER generation N
      (default 0 = the full retained history; a route's first
      generation contributes no feed rows — its content is the enable
      snapshot, not a change).
    - ``sink`` runs at-least-once (foreachBatch contract); the
      committed-batch ledger makes it effectively-once outside the
      crash-between-sink-and-marker window — same guarantee as every
      other stream here. Make the sink idempotent per (from, to) span
      if that residual window matters.
    - A span crossing a PRUNED generation fails loudly with the remedy
      (keep ``prune_generations`` retention above the stream's restart
      lag), mirroring the IVM refusal — never a silently torn feed.
    - ``live_only=True`` follows the LIVE-TABLE feed of a
      tombstone-retaining CDC route (``read_changes_between``'s option:
      soft deletes classify as logical deletes, resurrections as
      inserts, expiry spans net to zero); default off = the physical
      feed, where tombstone rows are ordinary data.
    - A batch whose span crosses a WHOLE-ROUTE-REWRITE generation
      (compaction / upsert / full merge — every file replaced, so a
      diff against it reads the whole route) is SPLIT at each such
      generation: the rewrite generation becomes its own singleton
      span and only IT pays the full-route diff, while the delta-sized
      runs between rewrites keep their net compression. The sink then
      receives several (from, to] calls for one batch — same contract,
      and applying the sub-feeds in order composes to the one
      compressed feed. (This makes DEPLOYMENT.md's drain-before-
      compaction advice mechanical instead of operational: a follower
      sleeping through a compaction no longer pays the full read for
      the UNRELATED deltas around it.)

    Scale: the ledger rows are manifest summaries (driver-side
    metadata); each batch's real work is the change feed's
    delta-sized multiset diff — cost ∝ what the span's generations
    disagree on, never route size (the one exception, a rewrite
    generation's own span, is isolated by the split above).

    Reference parity: engine-added (SURVEY §2.6) — the reference has no
    versioning, so nothing to follow (src/function_app.py:389-414)."""
    from iotgp_func_raw_data_ingest_spark.sources.snapshots import (
        read_changes_between,
        snapshots_enabled,
    )

    if not snapshots_enabled(spark, route):
        raise ValueError(
            f"{route} has no generation ledger — the changes stream "
            "follows commits, so there is nothing to follow; call "
            "snapshots.enable_snapshots(route) first"
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        bspark = batch_df.sparkSession
        if batch_committed(bspark, checkpoint_dir, batch_id):
            return
        gens = sorted(
            (r["generation"], r["kind"])
            for r in batch_df.select("generation", "kind").collect()
        )
        # split the batch's span at whole-route-rewrite generations so
        # only the rewrite span pays the full-route diff (the ledger
        # rows carry each manifest's kind — no extra I/O)
        for frm, t_ in _feed_span_bounds(gens):
            feed = read_changes_between(
                bspark, route, frm, t_, fmt=fmt, key_cols=key_cols,
                live_only=live_only,
            )
            sink(feed, frm, t_)
        mark_batch_committed(bspark, checkpoint_dir, batch_id)

    writer = _ledger_stream(spark, route, start_generation).writeStream.foreachBatch(
        _sink
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_ivm_refresh_stream(
    spark,
    route: str,
    view_path: str,
    group_cols: list[str],
    sum_cols: list[str] | tuple[str, ...] = (),
    checkpoint_dir: str | None = None,
    fmt: str = "parquet",
    start_generation: int | None = None,
    live_only: bool = False,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Event-driven incremental view maintenance: refresh the
    count+sum view (``sources.ivm.refresh_view_from_changes``) whenever
    the route commits a generation, instead of on a cron — the ledger
    stream is the commit signal, the refresh itself stays the exact
    feed-based delta apply.

    Idempotence needs NO batch ledger here: the refresh is already
    exactly-once by construction (the view's applied-generation
    watermark travels inside the view directory and moves in the same
    atomic swap as the data) — a replayed batch finds the view current
    and no-ops. The refresh always catches up to the LATEST committed
    generation, which may be beyond the batch's own span; that is
    correct (exactness is per-state, not per-span) and makes
    back-to-back commits coalesce into one refresh.

    ``start_generation`` positions the LEDGER stream only (emit commit
    events strictly above it), never the refresh — which always applies
    from the view's own watermark to latest. Default: the view's
    applied generation if the view exists, else one below the oldest
    RETAINED generation — never a pruned one, so the stream starts
    cleanly on a mature route whose early ledger history
    ``prune_generations`` already dropped (a hardcoded 0 would fail the
    first ``partitions()`` enumeration against gen 1's missing
    manifest, even though the refresh needs none of that history).

    ``live_only`` is passed through to the refresh (soft-delete marker
    flips count as logical insert/delete — see
    ``ivm.refresh_view_from_changes``); it is part of the view's spec,
    so all refreshes of one view must agree on it.

    ``checkpoint_dir`` defaults to ``<view_path>.ckpt`` — the stream's
    position matters only for how often an already-current refresh
    no-ops, never for correctness."""
    from iotgp_func_raw_data_ingest_spark.sources.ivm import (
        read_view_meta,
        refresh_view_from_changes,
    )
    from iotgp_func_raw_data_ingest_spark.sources.snapshots import (
        list_generations,
    )

    gens = list_generations(spark, route)
    if not gens:
        raise ValueError(
            f"{route} has no generation ledger — IVM follows commits; "
            "call snapshots.enable_snapshots(route) first"
        )
    if start_generation is None:
        start_generation = gens[0] - 1
        meta = read_view_meta(spark, view_path)
        if meta is not None:
            start_generation = max(
                start_generation, int(meta["applied_generation"])
            )
    ckpt = checkpoint_dir or f"{view_path.rstrip('/')}.ckpt"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.select("generation").head(1):
            refresh_view_from_changes(
                batch_df.sparkSession, route, view_path,
                list(group_cols), list(sum_cols), fmt=fmt,
                live_only=live_only,
            )

    writer = _ledger_stream(spark, route, start_generation).writeStream.foreachBatch(
        _sink
    ).option("checkpointLocation", ckpt)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_changes_and_ivm_stream(
    spark,
    route: str,
    sink,
    checkpoint_dir: str,
    view_path: str,
    group_cols: list[str],
    sum_cols: list[str] | tuple[str, ...] = (),
    key_cols: list[str] | None = None,
    fmt: str = "parquet",
    start_generation: int = 0,
    live_only: bool = False,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Feed export + event-driven IVM from ONE ledger lifecycle: the
    fan-out form of running ``start_changes_stream`` and
    ``start_ivm_refresh_stream`` side by side. Both consumers are
    commit-driven followers of the SAME generation ledger, so two
    concurrent streams pay Spark's per-stream Python-DataSource planner
    lifecycle twice (measured ~2.5 s of process spawn per availableNow
    start/stop — the dominant cost of a drain at small batch sizes) to
    read the same handful of manifest-summary rows. Here one stream
    reads the ledger once and its foreachBatch fans out to both
    consumers, run concurrently (guide §2.6 — independent sinks:
    the feed export writes the caller's sink, the IVM refresh swaps the
    view directory).

    Semantics are unchanged from the two-stream form:

    - the offset-equals-generation checkpoint design is preserved — the
      shared stream's offset log IS the applied-generation watermark,
      exactly as each separate stream's was;
    - the feed export keeps the committed-batch ledger (effectively-once
      outside the crash-between-sink-and-marker window) and the
      whole-route-rewrite span split (``_feed_span_bounds``);
    - the IVM refresh needs no batch ledger (exactly-once via the view's
      own watermark, which moves in the view's atomic swap) and always
      catches up to the LATEST committed generation — a replayed or
      coalesced batch finds the view current and no-ops;
    - ``live_only`` applies to both consumers (they follow the same
      logical table; a mixed-mode pair would be two different tables —
      run two streams for that).

    A production deployment with MANY followers of one route generalizes
    the same way: one ledger lifecycle, fan out in foreachBatch."""
    from concurrent.futures import ThreadPoolExecutor

    from iotgp_func_raw_data_ingest_spark.sources.ivm import (
        refresh_view_from_changes,
    )
    from iotgp_func_raw_data_ingest_spark.sources.snapshots import (
        read_changes_between,
        snapshots_enabled,
    )

    if not snapshots_enabled(spark, route):
        raise ValueError(
            f"{route} has no generation ledger — the changes stream "
            "follows commits, so there is nothing to follow; call "
            "snapshots.enable_snapshots(route) first"
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        bspark = batch_df.sparkSession
        gens = sorted(
            (r["generation"], r["kind"])
            for r in batch_df.select("generation", "kind").collect()
        )

        def _feed() -> None:
            if batch_committed(bspark, checkpoint_dir, batch_id):
                return
            for frm, t_ in _feed_span_bounds(gens):
                feed = read_changes_between(
                    bspark, route, frm, t_, fmt=fmt, key_cols=key_cols,
                    live_only=live_only,
                )
                sink(feed, frm, t_)
            mark_batch_committed(bspark, checkpoint_dir, batch_id)

        def _ivm() -> None:
            if gens:
                refresh_view_from_changes(
                    bspark, route, view_path, list(group_cols),
                    list(sum_cols), fmt=fmt, live_only=live_only,
                )

        # overlap the two consumers: independent outputs, and Spark's
        # scheduler happily runs their jobs concurrently (guide §2.6)
        with ThreadPoolExecutor(max_workers=2) as pool:
            futures = [pool.submit(_feed), pool.submit(_ivm)]
            for f in futures:
                f.result()

    writer = _ledger_stream(spark, route, start_generation).writeStream.foreachBatch(
        _sink
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_rollup_stream(
    events_stream: DataFrame,
    lake_path: str,
    folder: str,
    source_db: str,
    table: str,
    ts_col: str,
    bucket: str,
    dims: list[str],
    value_col: str,
    cfg: EngineConfig,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    aggs: tuple[str, ...] = ("sum", "count", "min", "max"),
) -> StreamingQuery:
    """Continuous aggregate: each micro-batch refreshes a persisted
    time-bucketed rollup via ``sources.maintenance.incremental_rollup``
    — the hypertable continuous-aggregate shape, kept exact for
    re-mergeable aggregates (sum/count/min/max) without ever rescanning
    history. Unlike a watermarked streaming agg, the persisted rollup
    has no late-data horizon: an event arriving a week late still lands
    in its (old) bucket because the merge is keyed, not windowed —
    retention of old buckets is a separate ``expire_lake_partitions``
    policy, not a state-store constraint.

    Idempotence: the committed-batch ledger (as in the ingest and
    upsert streams). A replayed batch id is skipped so its partials are
    never double-merged.

    Scale: per batch, one groupBy over the NEW rows plus an upsert
    whose carried side is the rollup itself (buckets × dims) — batch
    cost is independent of history size.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
            incremental_rollup,
        )

        spark = batch_df.sparkSession
        if batch_committed(spark, checkpoint_dir, batch_id):
            return
        # batch_id rides into the rollup's _meta.json through the swap,
        # so even a crash between the merge and this ledger marker cannot
        # double-merge on replay (incremental_rollup skips applied ids)
        incremental_rollup(
            spark, lake_path, folder, source_db, table,
            batch_df, ts_col, bucket, dims, value_col, cfg,
            aggs=aggs, batch_id=batch_id,
        )
        mark_batch_committed(spark, checkpoint_dir, batch_id)

    writer = events_stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Dimension enrichment of a stream: stream-static join against a
    (small, broadcast) batch relation — the lookup-table pattern every
    ingest pipeline needs (device registry, customer segment, route
    metadata). Stateless: each micro-batch joins against the CURRENT
    dim snapshot, so no watermark and no state store are involved, and
    the dim can be swapped between batches for slowly-changing lookups.

    At scale the dim side stays broadcast as long as it fits the
    broadcast threshold; a huge dim instead becomes a pre-bucketed
    co-located join — either way the streaming side never shuffles on
    volume for the join itself."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), on, how)


def stream_dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    delay: str,
) -> DataFrame:
    """Exactly-once-per-key stream using Spark's native
    ``dropDuplicatesWithinWatermark``: keeps the FIRST arrival of each
    key and drops re-deliveries that arrive within ``delay`` of the
    watermark — the at-least-once → effectively-once repair stage for
    sources that re-send (Event Hubs/Kafka redeliveries, producer
    retries).

    vs. the applyInPandasWithState dedup (streaming/stateful.py): this
    one is all-JVM and needs no custom state schema, but its contract
    is explicitly WINDOWED — state for a key is dropped once the
    watermark passes its expiry, so a duplicate older than ``delay`` is
    re-admitted as new. That bounded-state trade is exactly what makes
    it viable on unbounded key spaces at 100 TB: state size tracks the
    delay window's key arrival rate, not stream history. Choose the
    delay to cover the source's real re-delivery horizon."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)
