"""Incremental view maintenance (IVM) over the change data feed.

Keeps a keyed aggregate view (``group_cols`` → row count + per-column
sums) exactly in sync with a snapshot-enabled route while paying only
for what changed — including DELETES and UPDATES, which the append-only
rollup (``maintenance.incremental_rollup``) cannot retract (min/max/HLL
sketches are not subtractable; count and sum are, which is exactly the
self-maintainable aggregate class this module supports).

How a refresh works:

1. Read the view's ``_ivm.json`` sidecar (travels INSIDE the view
   directory, so view data and applied-generation watermark move
   atomically in one directory swap — there is no window where they
   disagree, and a crash anywhere re-runs from a consistent pair).
2. ``snapshots.read_changes_between(applied, latest)`` — the net
   row-level feed, read from only the files the generations disagree
   on. No key classification needed: an update is a delete + insert to
   an additive aggregate.
3. Sign the feed (+1 insert, −1 delete), aggregate the delta to
   ``group_cols`` (delta-sized shuffle), union with the current view
   (groups-sized) and re-aggregate; groups whose count reaches zero
   drop out. An ``Observation`` on the staging write asserts no group
   went NEGATIVE (that would mean the feed and the view disagree about
   history — refuse to commit a corrupt view).
4. Swap the staged directory into place with the same two-rename
   crash-healed protocol compaction uses (``lake._recover_swap`` /
   ``_swap_into_place``).

Exactness: counts are exact by construction. Sums are exact for
integer and DECIMAL columns (use DECIMAL for money-like columns — the
engine-wide rule from q75); float sums accumulate the usual
reassociation noise under long retraction histories, so prefer decimal
when the view feeds anything that compares values.

Scale (100 TB route): a refresh touches the delta files (feed), the
view (groups-sized by construction), and two JSON manifests — never
the route. The initial build is the one full scan, pinned to a
generation so a concurrent writer cannot tear it.

Reference parity: engine-added (SURVEY §2.6) — the reference has no
derived-view story; its only output is the raw append sink
(src/function_app.py:389-414).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    _check_format,
    _hadoop_fs,
    _recover_swap,
    _swap_into_place,
)

IVM_META = "_ivm.json"
COUNT_COL = "n_rows"


def _sum_col(c: str) -> str:
    return f"sum_{c}"


def _write_meta(jvm, fs, dir_path: str, payload: dict) -> None:
    out = fs.create(jvm.org.apache.hadoop.fs.Path(f"{dir_path}/{IVM_META}"), True)
    try:
        out.write(bytearray(json.dumps(payload, sort_keys=True).encode("utf-8")))
    finally:
        out.close()


def read_view_meta(spark: SparkSession, view_path: str) -> dict | None:
    """The view's sidecar (source route, applied generation, column
    spec) — None when the view does not exist yet."""
    jvm, _, fs = _hadoop_fs(spark, view_path)
    p = jvm.org.apache.hadoop.fs.Path(f"{view_path.rstrip('/')}/{IVM_META}")
    if not fs.exists(p):
        return None
    return snap._read_json(jvm, fs, str(p))


def read_view(spark: SparkSession, view_path: str, fmt: str = "parquet") -> DataFrame:
    """The maintained view: ``group_cols`` + ``n_rows`` + ``sum_<c>``
    per sum column (the sidecar is underscore-named, invisible to the
    scan)."""
    _check_format(fmt)
    return spark.read.format(fmt).load(view_path)


def _aggregate(df: DataFrame, group_cols: list[str], sum_cols: list[str]) -> DataFrame:
    exprs = [F.count(F.lit(1)).cast("bigint").alias(COUNT_COL)]
    exprs += [F.sum(F.col(c)).alias(_sum_col(c)) for c in sum_cols]
    return df.groupBy(*group_cols).agg(*exprs)


def refresh_view_from_changes(
    spark: SparkSession,
    route: str,
    view_path: str,
    group_cols: list[str],
    sum_cols: list[str] | tuple[str, ...] = (),
    fmt: str = "parquet",
    live_only: bool = False,
) -> dict:
    """Create or incrementally refresh the aggregate view of ``route``
    at ``view_path``. Returns ``{"mode": "initial" | "incremental" |
    "noop", "applied_from", "applied_to", "groups_delta"}``.

    The source route must be snapshot-enabled (the generation ledger IS
    the incremental contract). If the previously applied generation has
    been pruned from the ledger, the refresh raises with the remedy
    (rebuild by deleting the view, or raise ``prune_generations``
    retention above the refresh cadence) rather than silently applying
    a torn feed.

    ``live_only`` (default off): the view's contract is exactness
    w.r.t. the PHYSICAL route — on a tombstone-retaining CDC route
    (``retain_tombstones=True``) that means soft-deleted rows COUNT:
    their nulled data columns pile into a NULL group, and a later
    ``expire_tombstones`` retracts keys that logically died long ago.
    ``live_only=True`` instead maintains the aggregate of the LIVE
    table (``lake.read_cdc_table`` semantics): the initial build
    filters tombstones from the pinned snapshot and every refresh
    consumes the live-table feed (``read_changes_between(live_only=
    True)``), so a soft delete retracts, a resurrection re-inserts, and
    an expiry span is a no-op — still exact, for the live relation.
    The setting is part of the view's spec (recorded in the sidecar);
    a view predating the option reads as ``live_only=False``. On a
    route with no ``_deleted`` column the two settings coincide.
    """
    _check_format(fmt)
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    sum_cols = list(sum_cols)
    reserved = {COUNT_COL} | {_sum_col(c) for c in sum_cols}
    clash = [c for c in group_cols if c in reserved]
    if clash:
        raise ValueError(
            f"group_cols collide with derived view columns: {clash}"
        )
    route = route.rstrip("/")
    view_path = view_path.rstrip("/")
    gens = snap.list_generations(spark, route)
    if not gens:
        raise ValueError(
            f"{route} has no generation ledger — IVM needs snapshots; "
            "call snapshots.enable_snapshots(route) first"
        )
    latest = gens[-1]
    jvm, vpath, fs = _hadoop_fs(spark, view_path)
    # heal a crashed prior swap before reading anything
    tmp, old, tmp_p, old_p = _recover_swap(jvm, fs, vpath, view_path)

    meta = read_view_meta(spark, view_path)
    spec = {
        "source_route": route,
        "group_cols": list(group_cols),
        "sum_cols": sum_cols,
        "live_only": bool(live_only),
    }
    if meta is None:
        # initial build: one pinned full scan of the latest generation
        base = snap.read_route_snapshot(spark, route, fmt=fmt, generation=latest)
        if live_only and "_deleted" in base.columns:
            # the parquet-pushable live predicate (read_cdc_table's)
            base = base.filter(
                F.col("_deleted").isNull() | (F.col("_deleted") == F.lit(False))
            )
        view = _aggregate(base, list(group_cols), sum_cols)
        if fs.exists(vpath):
            raise IOError(
                f"{view_path} exists but has no {IVM_META} sidecar — not "
                "an IVM view; refusing to overwrite it"
            )
        # stage data + sidecar together, land with ONE rename: a crash
        # can never leave a sidecar-less view (a half-written stage is
        # cleared by _recover_swap on the next call)
        view.write.format(fmt).mode("overwrite").save(tmp)
        _write_meta(jvm, fs, tmp, {**spec, "applied_generation": latest})
        fs.mkdirs(vpath.getParent())
        if not fs.rename(tmp_p, vpath):
            raise IOError(
                f"IVM initial build: could not move {tmp} to {view_path}"
            )
        return {
            "mode": "initial",
            "applied_from": None,
            "applied_to": latest,
            "groups_delta": None,
        }

    for k, v in spec.items():
        # a sidecar written before the live_only option existed reads
        # as live_only=False (the physical contract it was built under)
        have = meta.get(k, False) if k == "live_only" else meta.get(k)
        if have != v:
            raise ValueError(
                f"view spec drift: sidecar has {k}={have!r}, caller "
                f"passed {v!r} — a view's definition is fixed at creation; "
                "build a new view for a new definition"
            )
    applied = meta["applied_generation"]
    if applied == latest:
        return {
            "mode": "noop",
            "applied_from": applied,
            "applied_to": latest,
            "groups_delta": 0,
        }
    if applied not in gens:
        raise ValueError(
            f"view was applied at generation {applied}, which has been "
            f"pruned from {route}'s ledger (oldest kept: {gens[0]}) — the "
            "incremental feed is gone. Rebuild (delete the view dir) or "
            "keep prune_generations retention above the refresh cadence"
        )

    feed = snap.read_changes_between(
        spark, route, applied, latest, fmt=fmt, live_only=live_only
    )
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta_exprs = [F.sum(sign).cast("bigint").alias(COUNT_COL)]
    delta_exprs += [
        # null measure values contribute to neither the sum nor its
        # retraction — mirrors what F.sum skipped in the initial build
        F.sum(sign * F.col(c)).alias(_sum_col(c))
        for c in sum_cols
    ]
    delta = feed.groupBy(*group_cols).agg(*delta_exprs)

    current = read_view(spark, view_path, fmt=fmt)
    # align BOTH the delta's sum dtypes (sign * decimal widens) and the
    # combine re-aggregate's outputs (F.sum over decimal widens precision
    # by 10 per refresh) back to the view's persisted dtypes, so the
    # on-disk schema is stable across refreshes instead of drifting
    # decimal(22,2) -> (32,2) -> (38,2). The view dtype is the initial
    # build's F.sum output — already 10 digits wider than the measure —
    # so the cast-back cannot lose a value the view could hold anyway.
    view_types = dict(current.dtypes)
    combine_exprs = [F.sum(COUNT_COL).cast("bigint").alias(COUNT_COL)]
    combine_exprs += [
        F.sum(_sum_col(c)).cast(view_types[_sum_col(c)]).alias(_sum_col(c))
        for c in sum_cols
    ]
    delta = delta.select(
        *group_cols,
        F.col(COUNT_COL),
        *[F.col(_sum_col(c)).cast(view_types[_sum_col(c)]) for c in sum_cols],
    )
    obs = Observation()
    obs_delta = Observation()
    delta = delta.observe(obs_delta, F.count(F.lit(1)).alias("groups"))
    combined = (
        current.unionByName(delta)
        .groupBy(*group_cols)
        .agg(*combine_exprs)
        .observe(
            obs,
            F.sum(
                F.when(F.col(COUNT_COL) < 0, F.lit(1)).otherwise(F.lit(0))
            ).alias("negative_groups"),
        )
        .filter(F.col(COUNT_COL) > 0)
    )
    combined.write.format(fmt).mode("overwrite").save(tmp)
    neg = obs.get["negative_groups"]
    if neg:
        fs.delete(tmp_p, True)
        raise IOError(
            f"IVM refresh of {view_path}: {neg} group(s) would go to a "
            "negative row count — the feed and the view disagree about "
            "history (was the view written by something else, or the "
            "route rewritten outside the snapshot protocol?). Staged "
            "refresh discarded; rebuild the view"
        )
    _write_meta(jvm, fs, tmp, {**spec, "applied_generation": latest})
    _swap_into_place(jvm, fs, vpath, tmp_p, old_p, view_path, tmp)
    # groups touched by the feed, observed on the staging write itself
    groups_delta = obs_delta.get["groups"]
    return {
        "mode": "incremental",
        "applied_from": applied,
        "applied_to": latest,
        "groups_delta": groups_delta,
    }
