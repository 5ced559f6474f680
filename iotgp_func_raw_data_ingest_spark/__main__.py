"""Operational CLI: ``python -m iotgp_func_raw_data_ingest_spark <cmd>``.

The reference ships as a deployed Azure Function with no local surface;
this engine is a library first, but operators need command-line entry
points for the everyday verbs. All commands build the scale-configured
session from ``session.get_spark`` (AQE, Arrow, UTC) and respect
``SPARK_GRAFT_CPUS``.

Commands:

- ``list [prefix]``            — registered queries (name per line)
- ``run <query> [--sf-dir D]`` — execute one query, print rows (capped)
- ``explain <query>``          — formatted physical plan (the
                                 .explain('formatted') loop the build
                                 process itself uses)
- ``ingest <in_dir> <lake>``   — batch-ingest JSON-line envelope files
                                 into a typed lake
- ``stream-ingest <in_dir> <lake> <checkpoint> [--once]
                  [--trigger-seconds N]``
                               — the deployed verb: continuously ingest
                                 envelope files dropped into a directory
                                 (checkpointed, effectively-once via the
                                 committed-batch ledger — a narrow
                                 at-least-once window if a crash lands
                                 between a route's file commit and its
                                 ledger marker); ``--once``
                                 drains available files and exits
- ``compact <lake> <folder> <db> <table> [--zorder c1,c2]``
                               — small-files compaction, optional
                                 Z-order re-cluster
- ``validate <lake>``          — health audit: sidecar row counts,
                                 stranded swap dirs, generation-ledger
                                 consistency, per route
- ``expire <table_path> <partition_col> <cutoff>``
                               — retention: drop partitions below cutoff
- ``snapshot-enable <route>``  — turn on generation pointers (consistent
                                 reads, time travel, change feed)
- ``snapshot-log <route>``     — the generation ledger (one line per
                                 committed generation)
- ``snapshot-prune <route> [--keep N] [--no-vacuum]``
                               — retention for the ledger + retired files
- ``changes <route> <from_gen> [to_gen] [--key-cols a,b] [--limit N]``
                               — print the change data feed between two
                                 generations
- ``ivm-refresh <route> <view> --group-cols a,b [--sum-cols x,y]``
                               — create / incrementally refresh an exact
                                 count+sum view from the change feed
- ``expire-tombstones <table_path> <horizon_seq>``
                               — hard-delete soft-deleted CDC rows at or
                                 below a seq horizon (retain_tombstones
                                 retention)
- ``changes-stream <route> <outdir> --checkpoint DIR [--key-cols a,b]
  [--start-generation N]``    — drain the generation ledger ONCE,
                                 appending each new span's change feed
                                 (tagged from_gen/to_gen) to outdir;
                                 cron it for incremental export, the
                                 checkpoint carries the watermark
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="iotgp_func_raw_data_ingest_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("prefix", nargs="?", default="")

    p_run = sub.add_parser("run", help="run one registered query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)

    p_exp = sub.add_parser("explain", help="print the formatted plan")
    p_exp.add_argument("query")
    p_exp.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    p_ing = sub.add_parser("ingest", help="ingest JSON-line envelope files")
    p_ing.add_argument("in_dir")
    p_ing.add_argument("lake")

    p_sing = sub.add_parser(
        "stream-ingest",
        help="continuously ingest envelope files dropped into a directory",
    )
    p_sing.add_argument("in_dir")
    p_sing.add_argument("lake")
    p_sing.add_argument("checkpoint")
    p_sing.add_argument(
        "--trigger-seconds", type=int, default=10,
        help="micro-batch cadence for daemon mode (default 10)",
    )
    p_sing.add_argument(
        "--once", action="store_true",
        help="drain what's available now (availableNow) and exit — the "
             "backfill / catch-up verb",
    )

    p_cmp = sub.add_parser("compact", help="compact one route directory")
    for a in ("lake", "folder", "source_db", "table"):
        p_cmp.add_argument(a)
    p_cmp.add_argument("--zorder", default="")
    p_cmp.add_argument("--target-records", type=int, default=None)

    p_val = sub.add_parser("validate", help="lake health audit per route")
    p_val.add_argument("lake")

    p_expire = sub.add_parser("expire", help="drop partitions below cutoff")
    p_expire.add_argument("table_path")
    p_expire.add_argument("partition_col")
    p_expire.add_argument("cutoff")
    p_expire.add_argument("--dry-run", action="store_true")

    p_sen = sub.add_parser("snapshot-enable", help="turn on generation pointers")
    p_sen.add_argument("route")

    p_slog = sub.add_parser("snapshot-log", help="print the generation ledger")
    p_slog.add_argument("route")

    p_spr = sub.add_parser("snapshot-prune", help="ledger + retired retention")
    p_spr.add_argument("route")
    p_spr.add_argument("--keep", type=int, default=10)
    p_spr.add_argument("--no-vacuum", action="store_true")
    p_spr.add_argument(
        "--vacuum-grace", type=float, default=None,
        help="seconds _retired/ must be quiet before vacuuming (default: "
        "the stage-heal grace); 0 forces the vacuum on a quiesced route",
    )

    p_chg = sub.add_parser("changes", help="change feed between generations")
    p_chg.add_argument("route")
    p_chg.add_argument("from_gen", type=int)
    p_chg.add_argument("to_gen", type=int, nargs="?", default=None)
    p_chg.add_argument("--key-cols", default="")
    p_chg.add_argument("--limit", type=int, default=20)
    p_chg.add_argument(
        "--live-only", action="store_true",
        help="live-table feed of a tombstone-retaining CDC route "
        "(soft deletes as logical deletes; expiry spans empty)",
    )

    p_ivm = sub.add_parser("ivm-refresh", help="refresh a count+sum view")
    p_ivm.add_argument("route")
    p_ivm.add_argument("view")
    p_ivm.add_argument("--group-cols", required=True)
    p_ivm.add_argument("--sum-cols", default="")
    p_ivm.add_argument(
        "--live-only", action="store_true",
        help="maintain the live-table aggregate of a tombstone-retaining "
        "CDC route (part of the view's spec — fixed at creation)",
    )

    p_exp_tomb = sub.add_parser(
        "expire-tombstones",
        help="hard-delete soft-deleted CDC rows at/below a seq horizon",
    )
    p_exp_tomb.add_argument("table_path")
    p_exp_tomb.add_argument("horizon_seq", type=int)

    p_cstr = sub.add_parser(
        "changes-stream",
        help="drain the generation ledger once into a feed export dir",
    )
    p_cstr.add_argument("route")
    p_cstr.add_argument("outdir")
    p_cstr.add_argument(
        "--checkpoint", required=True,
        help="stream checkpoint dir — carries the generation watermark "
        "across invocations (cron the command for continuous export)",
    )
    p_cstr.add_argument("--key-cols", default="")
    p_cstr.add_argument("--start-generation", type=int, default=0)
    p_cstr.add_argument(
        "--live-only", action="store_true",
        help="export the live-table feed of a tombstone-retaining CDC "
        "route (soft deletes as logical deletes; expiry spans empty)",
    )

    args = p.parse_args(argv)

    from iotgp_func_raw_data_ingest_spark.plans import QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            if name.startswith(args.prefix):
                print(name)
        return 0

    from iotgp_func_raw_data_ingest_spark.config import EngineConfig
    from iotgp_func_raw_data_ingest_spark.session import get_spark

    cfg = EngineConfig()
    spark = get_spark("iotgp-cli", config=cfg)

    if args.cmd in ("run", "explain"):
        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        df = QUERIES[args.query](spark, args.sf_dir)
        if args.cmd == "explain":
            print(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "ingest":
        from iotgp_func_raw_data_ingest_spark.operators.ingest import ingest_pipeline
        from iotgp_func_raw_data_ingest_spark.sources.envelopes import (
            envelopes_from_text,
        )
        from iotgp_func_raw_data_ingest_spark.sources.lake import write_lake_typed

        routed = ingest_pipeline(
            envelopes_from_text(spark, args.in_dir),
            destination_fallback=cfg.destination_fallback,
        )
        written = write_lake_typed(
            routed, EngineConfig(output_path=args.lake)
        )
        print("\n".join(written) or "(no routes)")
        return 0

    if args.cmd == "stream-ingest":
        from iotgp_func_raw_data_ingest_spark.sources.envelopes import (
            envelopes_stream_from_text,
        )
        from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
            start_ingest_stream,
        )

        stream = envelopes_stream_from_text(spark, args.in_dir)
        q = start_ingest_stream(
            stream,
            EngineConfig(output_path=args.lake),
            args.checkpoint,
            trigger_seconds=None if args.once else args.trigger_seconds,
        )
        # --once = availableNow: drain and terminate (backfill/catch-up);
        # otherwise a processing-time trigger runs until killed — the
        # deployed-daemon mode. Effectively-once across restarts rides on
        # the checkpoint + committed-batch ledger (streaming/pipeline.py);
        # a crash between a route's file commit and the ledger marker
        # re-appends that route on restart (narrow at-least-once window).
        q.awaitTermination()
        return 0

    if args.cmd == "compact":
        from iotgp_func_raw_data_ingest_spark.sources.lake import compact_lake_table

        before, after = compact_lake_table(
            spark,
            args.lake,
            args.folder,
            args.source_db,
            args.table,
            cfg,
            target_records_per_file=args.target_records,
            zorder_cols=[c for c in args.zorder.split(",") if c] or None,
        )
        print(f"files: {before} -> {after}")
        return 0

    if args.cmd == "validate":
        from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
            validate_lake,
        )

        bad = 0
        for r in validate_lake(spark, args.lake):
            flags = []
            if not r["rows_match"]:
                flags.append("ROWS-MISMATCH")
            if r["stranded"]:
                flags.append(f"STRANDED{r['stranded']}")
            s = r.get("snapshot")
            if s and not s["snapshot_ok"]:
                detail = []
                if s["missing_files"]:
                    detail.append(f"missing={s['missing_files']}")
                if s["unpublished_files"]:
                    detail.append(f"unpublished={s['unpublished_files']}")
                flags.append(f"SNAPSHOT-BROKEN({' '.join(detail)})")
            if flags:
                bad += 1
            print(f"{r['route']}: rows={r['n_rows']} meta={r['meta_rows']} "
                  f"{' '.join(flags) or 'ok'}")
        print(f"{bad} route(s) need attention")
        return 1 if bad else 0

    if args.cmd == "expire":
        from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
            expire_lake_partitions,
        )

        dropped = expire_lake_partitions(
            spark, args.table_path, args.partition_col, args.cutoff,
            dry_run=args.dry_run,
        )
        verb = "would drop" if args.dry_run else "dropped"
        print(f"{verb}: {dropped or 'nothing'}")
        return 0

    if args.cmd == "snapshot-enable":
        from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap

        g = snap.enable_snapshots(spark, args.route)
        print(f"snapshots enabled; latest generation: {g}")
        return 0

    if args.cmd == "snapshot-log":
        from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap

        gens = snap.list_generations(spark, args.route)
        if not gens:
            print("no generation ledger (snapshot-enable first)")
            return 1
        for g in gens:
            m = snap.read_generation(spark, args.route, g)
            rows = m.get("row_count")
            print(
                f"gen {g}: kind={m['kind']} files={len(m['files'])}"
                + (f" rows={rows}" if rows is not None else "")
                + f" writer={str(m.get('writer'))[:8]}"
            )
        return 0

    if args.cmd == "snapshot-prune":
        from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap

        out = snap.prune_generations(
            spark, args.route, keep_last=args.keep,
            vacuum=not args.no_vacuum,
            vacuum_grace_seconds=args.vacuum_grace,
        )
        tail = (
            "vacuum deferred (fresh retirements inside the grace window)"
            if out["vacuum_deferred"]
            else f"vacuumed files: {len(out['vacuumed_files'])}"
        )
        print(
            f"pruned generations: {out['pruned_generations'] or 'none'}; "
            f"{tail}"
        )
        return 0

    if args.cmd == "changes":
        from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap

        keys = [c for c in args.key_cols.split(",") if c] or None
        feed = snap.read_changes_between(
            spark, args.route, args.from_gen, args.to_gen, key_cols=keys,
            live_only=args.live_only,
        )
        feed.show(args.limit, truncate=False)
        return 0

    if args.cmd == "ivm-refresh":
        from iotgp_func_raw_data_ingest_spark.sources import ivm

        report = ivm.refresh_view_from_changes(
            spark, args.route, args.view,
            [c for c in args.group_cols.split(",") if c],
            [c for c in args.sum_cols.split(",") if c],
            live_only=args.live_only,
        )
        if report["mode"] == "initial":
            # applied_from/groups_delta are None on an initial build —
            # print the one fact that matters instead of "None -> 1"
            print(f"initial build at generation {report['applied_to']}")
        else:
            print(
                f"{report['mode']}: applied {report['applied_from']} -> "
                f"{report['applied_to']}; "
                f"groups touched: {report['groups_delta']}"
            )
        return 0

    if args.cmd == "expire-tombstones":
        from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
            expire_tombstones,
        )

        rep = expire_tombstones(spark, args.table_path, args.horizon_seq)
        print(
            f"removed {rep['tombstones_removed']} tombstone(s) across "
            f"{rep['files_rewritten']}/{rep['files_total']} file(s); "
            f"{rep['rows_kept']} row(s) carried"
        )
        return 0

    if args.cmd == "changes-stream":
        from pyspark.sql import functions as F

        from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
            start_changes_stream,
        )

        keys = [c for c in args.key_cols.split(",") if c] or None
        spans = []

        # idempotent-per-span export: each span lands under its own
        # partition directory with OVERWRITE, so a crash in the
        # sink-to-marker window (pipeline.py's documented at-least-once
        # residual) replays as a file-level rewrite of the same span —
        # never duplicate rows. Consumers read the whole outdir; Spark
        # partition discovery yields from_gen/to_gen as columns.
        def _sink(feed, frm, to):
            span_dir = f"{args.outdir}/from_gen={frm}/to_gen={to}"
            spans.append((frm, to, span_dir))
            feed.write.mode("overwrite").parquet(span_dir)

        q = start_changes_stream(
            spark, args.route, _sink, args.checkpoint,
            key_cols=keys, start_generation=args.start_generation,
            live_only=args.live_only,
        )
        q.awaitTermination()
        if spans:
            # count off each span's OWN written directory (tiny,
            # delta-sized) — counts cover exactly this span's current
            # files, so a replayed or reused outdir cannot inflate them
            for frm, to, span_dir in spans:
                n = spark.read.parquet(span_dir).count()
                print(f"exported span ({frm}, {to}]: {n} change row(s)")
        else:
            print("ledger quiet — nothing new to export")
        return 0

    return 2  # unreachable


if __name__ == "__main__":
    raise SystemExit(main())
