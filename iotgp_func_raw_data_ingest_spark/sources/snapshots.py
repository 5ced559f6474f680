"""Generation-pointer snapshots for flat route directories.

Closes the one reader-visibility gap the staged-replace protocol left
open (``lake._finish_staged_replace`` ordering note): a directory-
listing reader racing a multi-file commit transiently sees duplicated
rows (move-first ordering made that the safe direction, but it is
still an inconsistent read). A *snapshot reader* instead resolves one
tiny JSON manifest naming the exact live file set, so every read is a
consistent point-in-time view no matter what a writer is doing — the
same idea as Delta's commit log or an Iceberg snapshot, built from two
Hadoop-FS primitives and zero table-format dependencies.

Layout (per route directory):

- ``<route>/_gen/gen-<N>.json`` — one manifest per committed
  generation: ``{"generation": N, "files": [part names...], "kind",
  "writer", "created_utc_ms", "row_count"?}``. Underscore prefix keeps
  it invisible to every Spark/Hadoop directory-listing reader.
- ``<route>/_retired/<name>`` — data files replaced by a later
  generation, kept (not deleted) so older generations stay readable
  (time travel) until ``prune_generations`` vacuums them.

Commit protocol (optimistic CAS, like a lakehouse commit log):

1. write the manifest to ``_gen/.tmp-<uuid>``;
2. atomically ``rename`` it to ``gen-<N>.json`` where N = latest + 1.
   Hadoop ``rename`` refuses an existing destination on HDFS / local
   FS, so exactly one concurrent publisher wins N; the loser re-reads
   the winner's manifest and retries at N+1 with its delta intact.

Every publish is **delta-based** (``add`` / ``remove`` file names on
top of the parent manifest), never a directory listing: a listing
taken while another writer is mid-commit could capture a torn batch,
a delta by construction cannot. The only listing-based publishes are
``enable_snapshots`` (first generation) and the whole-route-swap
commit, both of which run under the lake's exclusive-rewrite contract.

Object-store caveat (same one Delta documents for S3): the CAS step
needs atomic rename-without-overwrite, which HDFS / ABFS / GCS / local
filesystems give and bare S3A does not — front S3 with a consistent
commit service or serialize publishers per route there.

Reader guarantees:

- ``read_route_snapshot`` (no generation): the latest *committed*
  generation — never a half-committed file set, never torn appends.
- ``read_route_snapshot(generation=K)``: time travel — the exact file
  set of generation K, readable until a vacuum retires-and-prunes it.
  Pinning a generation is how a training run records the exact bytes
  it read (reproducible data lineage for LLM pipelines).
- ``read_changes_between(from, to)``: change data feed — the net
  row-level changes between two generations, computed from ONLY the
  files the manifests disagree on (``diff_generations``), so an
  incremental consumer pays ∝ delta, never a table re-read.
- Snapshot resolution reads ONE small JSON instead of a recursive
  directory listing — at 100 TB / millions of files on an object
  store, that is the difference between a metadata call and a
  multi-minute LIST storm. Resolving the manifest's names to physical
  paths costs exactly TWO flat LISTs (route root + ``_retired/``) plus
  that one JSON read, regardless of how many files the generation
  holds — never a per-file existence probe (N round-trips on an
  object store).

Scale: manifests are O(#files-per-route) names (routes are compacted,
so thousands of names ≈ a few hundred KB); publish and resolve are
pure driver-side metadata ops, no Spark job. 100 TB story: cost is
independent of data bytes; the per-route file count is bounded by
``compact_lake_table``.

Reference parity note: the reference has no reader-consistency story
at all — its blob uploads are independent non-atomic puts
(src/function_app.py:389-414); this layer is engine-added surface.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from iotgp_func_raw_data_ingest_spark.sources.lake import (
    _check_format,
    _hadoop_fs,
    _with_route_lease,
)

GEN_DIR = "_gen"
RETIRED_DIR = "_retired"
_GEN_PREFIX = "gen-"
_GEN_SUFFIX = ".json"
# zero-padded so lexicographic listing order == numeric order
_GEN_WIDTH = 12


def _gen_name(n: int) -> str:
    return f"{_GEN_PREFIX}{n:0{_GEN_WIDTH}d}{_GEN_SUFFIX}"


def _gen_number(name: str) -> int | None:
    if not (name.startswith(_GEN_PREFIX) and name.endswith(_GEN_SUFFIX)):
        return None
    body = name[len(_GEN_PREFIX) : -len(_GEN_SUFFIX)]
    return int(body) if body.isdigit() else None


def _read_json(jvm, fs, path_str: str) -> dict:
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path_str))
    try:
        raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(raw.decode("utf-8"))


def _write_json_atomic(jvm, fs, dest: str, payload: dict) -> bool:
    """Write ``payload`` to a dot-temp next to ``dest`` and rename it
    in. Returns False when the rename loses a CAS race (dest exists);
    the temp is cleaned up either way, so a loser leaves no debris."""
    parent = dest.rsplit("/", 1)[0]
    tmp = f"{parent}/.tmp-{uuid.uuid4().hex}"
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    out = fs.create(tmp_p, True)
    try:
        out.write(bytearray(json.dumps(payload, sort_keys=True).encode("utf-8")))
    finally:
        out.close()
    if fs.rename(tmp_p, jvm.org.apache.hadoop.fs.Path(dest)):
        return True
    fs.delete(tmp_p, False)
    return False


def _list_gen_numbers(jvm, fs, route: str) -> list[int]:
    gen_p = jvm.org.apache.hadoop.fs.Path(f"{route}/{GEN_DIR}")
    if not fs.exists(gen_p):
        return []
    out = []
    for st in fs.listStatus(gen_p):
        n = _gen_number(st.getPath().getName())
        if n is not None:
            out.append(n)
    return sorted(out)


def _list_part_files(jvm, fs, route: str) -> list[str]:
    hpath = jvm.org.apache.hadoop.fs.Path(route)
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(hpath)
        if st.getPath().getName().startswith("part-")
    )


def _locate_files(jvm, fs, route: str, names: list[str], what: str) -> list[str]:
    """Resolve part-file names to their current physical location — the
    route root for live files, ``_retired/`` for files a later
    generation replaced — with exactly TWO flat LISTs (route root +
    ``_retired/``) instead of up-to-two existence probes PER FILE: at
    object-store latencies a thousand-file generation resolves in two
    metadata calls, not two thousand. Live wins when a name exists in
    both places (it shouldn't — ``retire_files`` refuses that state).
    Raises if any name is in neither place (vacuumed)."""
    live = {
        st.getPath().getName()
        for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(route))
        if st.getPath().getName().startswith("part-")
    }
    retired_p = jvm.org.apache.hadoop.fs.Path(f"{route}/{RETIRED_DIR}")
    retired = (
        {st.getPath().getName() for st in fs.listStatus(retired_p)}
        if fs.exists(retired_p)
        else set()
    )
    paths = []
    for name in names:
        if name in live:
            paths.append(f"{route}/{name}")
        elif name in retired:
            paths.append(f"{route}/{RETIRED_DIR}/{name}")
        else:
            raise FileNotFoundError(
                f"{what} of {route} references {name}, which is neither "
                "live nor retired — vacuumed by prune_generations; this "
                "generation is gone"
            )
    return paths


def snapshots_enabled(spark: SparkSession, route: str) -> bool:
    """True once ``enable_snapshots`` has committed at least one
    generation for this route — the switch every lake writer checks
    before spending any effort on manifests or retirement."""
    jvm, _, fs = _hadoop_fs(spark, route)
    return bool(_list_gen_numbers(jvm, fs, route))


def read_generation(spark: SparkSession, route: str, generation: int) -> dict:
    """The committed manifest of one generation (raises if pruned or
    never committed)."""
    jvm, _, fs = _hadoop_fs(spark, route)
    path = f"{route.rstrip('/')}/{GEN_DIR}/{_gen_name(generation)}"
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(path)):
        raise FileNotFoundError(
            f"generation {generation} of {route} does not exist "
            "(never committed, or pruned by prune_generations)"
        )
    return _read_json(jvm, fs, path)


def list_generations(spark: SparkSession, route: str) -> list[int]:
    """Committed generation numbers, ascending (pruned ones absent)."""
    jvm, _, fs = _hadoop_fs(spark, route)
    return _list_gen_numbers(jvm, fs, route)


def publish_generation(
    spark: SparkSession,
    route: str,
    *,
    kind: str,
    add: list[str] | tuple[str, ...] = (),
    remove: list[str] | tuple[str, ...] = (),
    full_listing: bool = False,
    row_count: int | None = None,
    writer: str | None = None,
    max_attempts: int = 32,
) -> int:
    """Commit the next generation and return its number.

    Delta mode (default): files = parent.files − ``remove`` + ``add``.
    Deltas compose correctly under concurrent publishers because each
    CAS loser re-reads the winner's manifest and replays its own delta
    on top — an append and a pruned merge hitting the same route both
    land, in either order, with neither's files lost.

    ``full_listing=True`` snapshots the directory as-is; ONLY safe when
    the caller holds exclusive write access to the route (the
    enable step and the whole-route-swap commit — both already
    exclusive by the lake's contract), because a listing can capture
    another writer's half-moved batch.
    """
    route = route.rstrip("/")
    jvm, _, fs = _hadoop_fs(spark, route)
    gen_dir = f"{route}/{GEN_DIR}"
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(gen_dir))
    add_l = list(add)
    remove_s = set(remove)
    for _ in range(max_attempts):
        nums = _list_gen_numbers(jvm, fs, route)
        parent = nums[-1] if nums else 0
        if full_listing:
            files = _list_part_files(jvm, fs, route)
        else:
            base: list[str] = (
                _read_json(jvm, fs, f"{gen_dir}/{_gen_name(parent)}")["files"]
                if parent
                else []
            )
            files = sorted((set(base) - remove_s) | set(add_l))
        manifest = {
            "generation": parent + 1,
            "parent": parent or None,
            "files": files,
            "kind": kind,
            "writer": writer or uuid.uuid4().hex,
            "created_utc_ms": int(time.time() * 1000),
        }
        if row_count is not None:
            manifest["row_count"] = row_count
        if _write_json_atomic(jvm, fs, f"{gen_dir}/{_gen_name(parent + 1)}", manifest):
            return parent + 1
        # CAS lost: another publisher committed parent+1 first — replay
        # our delta on top of their manifest
    raise IOError(
        f"publish_generation: lost the commit race {max_attempts} times "
        f"on {route} — pathological publisher contention, retry later"
    )


def resolve_snapshot(
    spark: SparkSession, route: str, generation: int | None = None
) -> dict:
    """The manifest of ``generation`` (default: latest) with a
    ``paths`` key added — each file name resolved to its current
    physical location (route root for live files, ``_retired/`` for
    files replaced by a later generation) via two flat LISTs, never a
    per-file probe. Raises if a referenced file was vacuumed (the
    generation is no longer readable — prune it)."""
    route = route.rstrip("/")
    jvm, _, fs = _hadoop_fs(spark, route)
    if generation is None:
        nums = _list_gen_numbers(jvm, fs, route)
        if not nums:
            raise FileNotFoundError(
                f"{route} has no committed generations — call "
                "enable_snapshots first (or use the directory-listing "
                "reader, lake.read_lake_table)"
            )
        generation = nums[-1]
    manifest = read_generation(spark, route, generation)
    out = dict(manifest)
    out["paths"] = _locate_files(
        jvm, fs, route, manifest["files"], f"generation {generation}"
    )
    return out


def read_route_snapshot(
    spark: SparkSession,
    route: str,
    fmt: str = "parquet",
    generation: int | None = None,
) -> DataFrame:
    """Consistent point-in-time read of one route: exactly the files
    the chosen generation committed, no matter what any writer is doing
    concurrently. An empty generation yields an empty scan of the
    route's schema-at-that-generation (zero files → empty DataFrame
    with no columns is meaningless, so we raise instead: an empty
    route has nothing to infer a schema from)."""
    _check_format(fmt)
    snap = resolve_snapshot(spark, route, generation)
    if not snap["paths"]:
        raise ValueError(
            f"generation {snap['generation']} of {route} is empty — "
            "no files to read (schema unknowable without a file)"
        )
    r = spark.read
    if fmt == "parquet":
        r = r.option("mergeSchema", "true")
    if fmt == "csv":
        r = r.option("header", "true")
    return r.format(fmt).load(snap["paths"])


def diff_generations(
    spark: SparkSession,
    route: str,
    from_generation: int,
    to_generation: int | None = None,
) -> dict:
    """File-level diff between two committed generations: which part
    files the ``to`` generation added and removed relative to ``from``,
    and which it shares (shared files are byte-identical by the
    protocol — a committed part file is immutable; rewrites always land
    under fresh names). Returns ``{"from", "to", "added", "removed",
    "shared"}`` with name lists sorted.

    This is the planning half of the change feed: the row-level reader
    only ever opens ``added`` + ``removed`` files, so diff cost is
    ∝ the data the generations actually disagree on — a pruned merge
    that touched 1 file of 64 yields a 2-file diff, not a table scan.
    Pure driver-side metadata (two small JSONs), no Spark job."""
    route = route.rstrip("/")
    jvm, _, fs = _hadoop_fs(spark, route)
    if to_generation is None:
        nums = _list_gen_numbers(jvm, fs, route)
        if not nums:
            raise FileNotFoundError(
                f"{route} has no committed generations — call "
                "enable_snapshots first"
            )
        to_generation = nums[-1]
    from_files = set(read_generation(spark, route, from_generation)["files"])
    to_files = set(read_generation(spark, route, to_generation)["files"])
    return {
        "from": from_generation,
        "to": to_generation,
        "added": sorted(to_files - from_files),
        "removed": sorted(from_files - to_files),
        "shared": sorted(from_files & to_files),
    }


def _read_names(
    spark: SparkSession, jvm, fs, route: str, names: list[str], fmt: str
) -> DataFrame | None:
    if not names:
        return None
    paths = _locate_files(jvm, fs, route, names, "generation diff")
    r = spark.read
    if fmt == "parquet":
        r = r.option("mergeSchema", "true")
    if fmt == "csv":
        r = r.option("header", "true")
    return r.format(fmt).load(paths)


def _align_columns(a: DataFrame, b: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Null-pad each side with the columns only the other has (schema
    evolution between generations adds columns), then project both to
    the same column order so ``exceptAll`` compares positionally-equal
    rows."""
    from pyspark.sql import functions as F

    a_types = dict(a.dtypes)
    b_types = dict(b.dtypes)
    for name, dt in b_types.items():
        if name not in a_types:
            a = a.withColumn(name, F.lit(None).cast(dt))
    for name, dt in a_types.items():
        if name not in b_types:
            b = b.withColumn(name, F.lit(None).cast(dt))
    order = list(a.columns)  # a's order, with b-only extras already appended
    return a.select(order), b.select(order)


def read_changes_between(
    spark: SparkSession,
    route: str,
    from_generation: int,
    to_generation: int | None = None,
    fmt: str = "parquet",
    key_cols: list[str] | None = None,
    change_col: str = "_change_type",
    live_only: bool = False,
) -> DataFrame:
    """Change data feed: the row-level changes that transform the
    ``from`` generation's view into the ``to`` generation's (default:
    latest) — the incremental-consumption primitive a downstream
    pipeline needs to refresh derived data without re-reading the
    route. Compressed semantics (like Delta CDF between two versions):
    the NET change per row across the generation span, not a replay of
    intermediate states.

    ``live_only`` (default off): on a tombstone-retaining CDC route
    (``start_cdc_merge_stream(retain_tombstones=True)``), the feed's
    default contract is PHYSICAL — a soft delete arrives as an update
    whose postimage has nulled data and ``_deleted = true``, and a
    later ``expire_tombstones`` emits delete changes for keys that
    logically died long ago. ``live_only=True`` instead yields the
    LIVE-TABLE feed (``lake.read_cdc_table`` semantics): rows with
    ``coalesce(_deleted, false) = true`` are filtered SYMMETRICALLY
    from both diff sides, so a soft delete classifies as a logical
    delete (live preimage, no postimage), a resurrection as a logical
    insert, and a tombstone-expiry span nets to ZERO feed rows — still
    exact, because marker flips are precisely the live-set membership
    changes. A route with no ``_deleted`` column reads identically
    under either setting. The filter uses the parquet-pushable
    ``_deleted IS NULL OR _deleted = false`` form, so all-tombstone
    row groups are pruned engine-side.

    Plan (cost ∝ what the generations disagree on, never table size):

    1. ``diff_generations`` — driver-side manifest diff; ``shared``
       files are immutable-by-protocol and never opened.
    2. Read ONLY the added and removed files; ONE groupBy-all-columns
       aggregation over removed(+1) ∪ added(−1) computes the two-way
       multiset diff (net > 0 ≡ ``removed.exceptAll(added)`` copies,
       net < 0 the reverse) and cancels carried rows — rows a rewrite
       copied unchanged into a replacement file — so a pruned merge's
       99% carried ballast produces zero feed rows, mostly map-side in
       the partial aggregate.
    3. Rows surviving on the removed side are deletions; on the added
       side, insertions. With ``key_cols``, a key present on both sides
       WITH EQUAL MULTIPLICITY is reclassified as an update: its removed
       rows become ``update_preimage`` and its added rows
       ``update_postimage`` (for a unique key — what the merge/delete
       primitives already require — that is the familiar one-pre/one-post
       pair). A key whose net-removed and net-added counts DIFFER cannot
       be presented as paired images, so its rows keep the plain
       delete/insert labels instead of emitting unpairable images (rows
       with a NULL key never equal-join and likewise stay insert/delete).

    Output: the data columns (schema-evolution columns null-padded on
    the older side) plus ``change_col`` ∈ {'insert', 'delete',
    'update_preimage', 'update_postimage'}. Identical generations (or
    ``from == to``) yield an empty feed with the same schema. A
    reversed span (``from > to``) is the inverse feed — the rollback
    view — by the same construction, no special casing.

    Scale: the single diff shuffle carries only delta bytes (the
    touched files), hashed on full rows — at a 1% CDC touch rate on a
    100 TB route that is a ~2 TB shuffle worst-case and typically far
    less after carried-row cancellation happens map-side in the partial
    aggregate. The key-classification join is keys-of-changed-rows
    sized, runs on the pre-replication net relation, and reuses the
    diff aggregation's exchange.

    Reference parity: engine-added (SURVEY §2.6) — the reference has no
    versioning, so no notion of "what changed" (src/function_app.py
    appends blobs blindly, :389-414).
    """
    from pyspark.sql import functions as F

    _check_format(fmt)
    route = route.rstrip("/")
    jvm, _, fs = _hadoop_fs(spark, route)
    d = diff_generations(spark, route, from_generation, to_generation)
    removed = _read_names(spark, jvm, fs, route, d["removed"], fmt)
    added = _read_names(spark, jvm, fs, route, d["added"], fmt)

    if removed is None and added is None:
        # no file-level difference → empty feed; schema comes from the
        # to-generation's files (identical to from's by construction)
        base_names = read_generation(spark, route, d["to"])["files"]
        if not base_names:
            raise ValueError(
                f"generations {d['from']} and {d['to']} of {route} are "
                "both empty — feed schema unknowable without a file"
            )
        base = _read_names(spark, jvm, fs, route, base_names[:1], fmt)
        if change_col in base.columns:
            raise ValueError(
                f"change_col {change_col!r} collides with a data column — "
                "pass a different name"
            )
        return base.limit(0).withColumn(change_col, F.lit(""))

    if removed is None or added is None:
        only = added if removed is None else removed
        empty = only.limit(0)
        removed = empty if removed is None else removed
        added = empty if added is None else added
    removed, added = _align_columns(removed, added)
    if live_only and "_deleted" in removed.columns:
        # symmetric live filter on BOTH diff sides: the surviving rows
        # are exactly each generation's live set, so the multiset diff
        # below computes the live-table feed. Applied per side (before
        # exceptAll) it pushes into each parquet scan; the null-padded
        # side folds to a no-op.
        live = F.col("_deleted").isNull() | (F.col("_deleted") == F.lit(False))
        removed = removed.filter(live)
        added = added.filter(live)

    data_cols = list(removed.columns)
    if change_col in data_cols:
        raise ValueError(
            f"change_col {change_col!r} collides with a data column — "
            "pass a different name"
        )
    if key_cols is not None:
        if not key_cols:
            raise ValueError(
                "key_cols=[] would classify on nothing — pass None for "
                "plain insert/delete semantics, or name the key columns"
            )
        missing = [k for k in key_cols if k not in data_cols]
        if missing:
            raise ValueError(f"key_cols not in the route's columns: {missing}")

    # NET form of the two-way multiset diff: one groupBy-all-columns
    # aggregation over removed(+1) ∪ added(−1) replaces the two
    # ``exceptAll`` subtrees (each its own full-width shuffle, and each
    # side scanned twice). net > 0 reproduces exceptAll's
    # max(count_removed − count_added, 0) copies on the deleted side,
    # net < 0 symmetrically on the inserted side; groupBy's null-safe
    # grouping matches exceptAll's null-safe row equality. One delta
    # shuffle instead of 4–6; the aggregated relation is reused (AQE
    # exchange reuse) by the key classification below.
    w, net_c = "_w", "_net"
    while w in data_cols:
        w += "_"
    while net_c in data_cols:
        net_c += "_"
    tagged = removed.withColumn(w, F.lit(1)).unionByName(
        added.withColumn(w, F.lit(-1))
    )
    net = (
        tagged.groupBy(*data_cols)
        .agg(F.sum(w).alias(net_c))
        .filter(F.col(net_c) != 0)
    )

    def replicate(df: DataFrame) -> DataFrame:
        # |net| copies of each surviving row (a row duplicated N extra
        # times in one generation nets to N) — exceptAll's multiset
        # semantics, restored post-aggregation on the compact relation
        return df.withColumn(
            net_c,
            F.explode(
                F.expr(f"array_repeat(1, int(abs({net_c})))")
            ),
        ).drop(net_c)

    if not key_cols:
        deleted = replicate(net.filter(F.col(net_c) > 0))
        inserted = replicate(net.filter(F.col(net_c) < 0))
        return deleted.withColumn(change_col, F.lit("delete")).unionByName(
            inserted.withColumn(change_col, F.lit("insert"))
        )

    # update = a key present on both sides with EQUAL multiplicity (a
    # unique key gives the 1:1 pre/post pair; M:N with M != N has no
    # pairing, so those keys fall back to delete/insert). Both counts
    # are keys-of-changed-rows sized aggregations over the already
    # delta-sized net relation — no new table-scale work. Classification
    # happens BEFORE replication, so the join touches one row per
    # distinct changed row, not per copy.
    del_counts = (
        net.filter(F.col(net_c) > 0)
        .groupBy(*key_cols)
        .agg(F.sum(net_c).alias("_n_del"))
    )
    ins_counts = (
        net.filter(F.col(net_c) < 0)
        .groupBy(*key_cols)
        .agg(F.sum(-F.col(net_c)).alias("_n_ins"))
    )
    upd_keys = (
        del_counts.join(ins_counts, on=key_cols, how="inner")
        .filter(F.col("_n_del") == F.col("_n_ins"))
        .select(*key_cols)
        .withColumn("_is_update", F.lit(True))
    )

    def classify(df: DataFrame, upd_label: str, base_label: str) -> DataFrame:
        joined = df.join(upd_keys, on=key_cols, how="left")
        return joined.withColumn(
            change_col,
            F.when(F.col("_is_update"), F.lit(upd_label)).otherwise(
                F.lit(base_label)
            ),
        ).select(*data_cols, net_c, change_col)

    return replicate(
        classify(net.filter(F.col(net_c) > 0), "update_preimage", "delete")
    ).unionByName(
        replicate(
            classify(net.filter(F.col(net_c) < 0), "update_postimage", "insert")
        )
    ).select(*data_cols, change_col)


def enable_snapshots(
    spark: SparkSession, route: str, kind: str = "enable"
) -> int:
    """Turn snapshot tracking on for a route by committing its first
    generation from a directory listing. Idempotent: if generations
    already exist, returns the latest without committing. Must run
    while no writer is mid-commit on the route (one quiet moment; every
    subsequent publish is delta-based and concurrency-safe)."""
    route = route.rstrip("/")
    jvm, _, fs = _hadoop_fs(spark, route)
    nums = _list_gen_numbers(jvm, fs, route)
    if nums:
        return nums[-1]
    return publish_generation(spark, route, kind=kind, full_listing=True)


def retire_files(spark: SparkSession, route: str, names: list[str]) -> int:
    """Move replaced data files from the route root into ``_retired/``
    (instead of deleting them) so older generations stay readable.
    Idempotent per name: already-retired names are skipped; a name
    missing from both places raises (that file was someone's data).
    Returns the number of files moved this call."""
    route = route.rstrip("/")
    jvm, _, fs = _hadoop_fs(spark, route)
    retired_dir = f"{route}/{RETIRED_DIR}"
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(retired_dir))
    moved = 0
    for name in names:
        src = jvm.org.apache.hadoop.fs.Path(f"{route}/{name}")
        dst = jvm.org.apache.hadoop.fs.Path(f"{retired_dir}/{name}")
        if fs.exists(dst):
            # a crashed prior attempt already moved it; if the source
            # ALSO exists something re-created the name — refuse to
            # guess which copy is authoritative
            if fs.exists(src):
                raise IOError(
                    f"retire_files: {name} exists both live and retired "
                    f"in {route} — resolve manually"
                )
            continue
        if not fs.exists(src):
            raise IOError(
                f"retire_files: {name} is neither live nor retired in "
                f"{route} — refusing to continue (a generation may "
                "reference it)"
            )
        if not fs.rename(src, dst):
            raise IOError(f"retire_files: could not move {name} into {retired_dir}")
        moved += 1
    return moved


@_with_route_lease("prune", route_param="route")
def prune_generations(
    spark: SparkSession,
    route: str,
    keep_last: int = 10,
    vacuum: bool = True,
    vacuum_grace_seconds: float | None = None,
) -> dict:
    """Drop generation manifests older than the newest ``keep_last``
    and (optionally) vacuum ``_retired/`` files no retained generation
    references. The latest generation is always kept. Returns
    ``{"pruned_generations": [...], "vacuumed_files": [...],
    "vacuum_deferred": bool}``.

    Run it like any retention job — scheduled, per route, under the
    same single-writer-per-route contract as compaction (a vacuum
    racing a publisher could otherwise delete a file a just-committed
    manifest still references).

    Grace window (defense-in-depth, mirroring the lake's unready-stage
    grace): if anything was retired into ``_retired/`` within the last
    ``vacuum_grace_seconds`` (default: ``lake.UNREADY_STAGE_GRACE_
    SECONDS``), the vacuum step is DEFERRED to the next scheduled run
    — a slow publisher may be mid-commit (files retired, manifest CAS
    or a crash-heal retry still in flight), and deleting a just-retired
    file would break its idempotent ``retire_files`` retry ("neither
    live nor retired") and could yank a file out from under an
    in-flight pinned read. Retirement recency is read off the
    ``_retired/`` DIRECTORY mtime (a rename bumps the directory; the
    moved file's own mtime survives the rename unchanged, so it cannot
    date the retirement). Manifest pruning is never deferred — dropping
    an old gen-N.json breaks no in-flight protocol step. Pass
    ``vacuum_grace_seconds=0`` to force the vacuum when the operator
    KNOWS no publisher is live (tests, quiesced routes)."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        UNREADY_STAGE_GRACE_SECONDS,
    )

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the latest always stays)")
    if vacuum_grace_seconds is None:
        vacuum_grace_seconds = UNREADY_STAGE_GRACE_SECONDS
    route = route.rstrip("/")
    jvm, _, fs = _hadoop_fs(spark, route)
    nums = _list_gen_numbers(jvm, fs, route)
    keep = set(nums[-keep_last:])
    pruned = []
    for n in nums:
        if n in keep:
            continue
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{route}/{GEN_DIR}/{_gen_name(n)}"), False
        )
        pruned.append(n)
    vacuumed: list[str] = []
    deferred = False
    if vacuum:
        retired_p = jvm.org.apache.hadoop.fs.Path(f"{route}/{RETIRED_DIR}")
        if fs.exists(retired_p):
            # retirement recency: the _retired/ DIRECTORY mtime (a
            # rename bumps it; the moved file's own mtime survives the
            # rename unchanged). Object stores and some Hadoop FS
            # implementations report synthetic directory mtimes (often
            # 0) — there, fall back to the newest FILE mtime under
            # _retired/ (on such stores "rename" is copy+delete, so the
            # file mtime IS the retirement instant). Taking the max of
            # both can only defer MORE, never less — the safe direction
            # for a grace window.
            recency_ms = fs.getFileStatus(retired_p).getModificationTime()
            for st in fs.listStatus(retired_p):
                recency_ms = max(recency_ms, st.getModificationTime())
            quiet_for = time.time() - recency_ms / 1000.0
            if quiet_for < vacuum_grace_seconds:
                deferred = True
            else:
                referenced: set[str] = set()
                for n in keep:
                    referenced.update(
                        read_generation(spark, route, n)["files"]
                    )
                for st in fs.listStatus(retired_p):
                    name = st.getPath().getName()
                    if name not in referenced:
                        fs.delete(st.getPath(), False)
                        vacuumed.append(name)
    return {
        "pruned_generations": pruned,
        "vacuumed_files": sorted(vacuumed),
        "vacuum_deferred": deferred,
    }
