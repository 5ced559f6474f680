"""Generation-pointer snapshot protocol (sources/snapshots.py): CAS
commit, delta composition, time-travel resolution through _retired/,
prune + vacuum, and the failure modes (vacuumed generation, live+retired
name conflict, empty generation)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
from iotgp_func_raw_data_ingest_spark.sources.lake import _hadoop_fs


def _route(spark, base, n=100, files=4):
    route = str(base / "lake" / "curated" / "crm" / "accounts")
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("v")
    )
    df.repartition(files).write.parquet(route)
    return route


def _parts(route):
    return sorted(f for f in os.listdir(route) if f.startswith("part-"))


def test_enable_and_latest_read(spark, tmp_path):
    route = _route(spark, tmp_path)
    assert not snap.snapshots_enabled(spark, route)
    g = snap.enable_snapshots(spark, route)
    assert g == 1
    assert snap.snapshots_enabled(spark, route)
    # idempotent — no second generation
    assert snap.enable_snapshots(spark, route) == 1
    assert snap.list_generations(spark, route) == [1]
    df = snap.read_route_snapshot(spark, route)
    assert df.count() == 100
    m = snap.read_generation(spark, route, 1)
    assert m["files"] == _parts(route)
    assert m["kind"] == "enable"
    assert m["parent"] is None


def test_delta_publish_append_and_remove(spark, tmp_path):
    route = _route(spark, tmp_path, n=50, files=2)
    snap.enable_snapshots(spark, route)
    before = _parts(route)
    # simulate an append batch: write more files in, publish delta-add
    extra = spark.range(50, 80).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("v")
    )
    extra.coalesce(1).write.mode("append").parquet(route)
    added = sorted(set(_parts(route)) - set(before))
    assert added
    g = snap.publish_generation(spark, route, kind="append", add=added)
    assert g == 2
    assert snap.read_route_snapshot(spark, route).count() == 80
    # gen 1 still reads the pre-append rows only (files all still live)
    assert snap.read_route_snapshot(spark, route, generation=1).count() == 50
    # delta-remove one file
    victim = added[0]
    g = snap.publish_generation(spark, route, kind="delete", remove=[victim])
    assert g == 3
    m = snap.read_generation(spark, route, 3)
    assert victim not in m["files"]
    assert m["parent"] == 2


def test_time_travel_through_retired(spark, tmp_path):
    route = _route(spark, tmp_path, n=60, files=3)
    snap.enable_snapshots(spark, route)
    old = _parts(route)
    # replace one file's rows: write a replacement, retire the original
    repl = spark.range(1000, 1010).select(
        F.col("id").alias("k"), F.lit(0.0).alias("v")
    )
    repl.coalesce(1).write.mode("append").parquet(route)
    new = sorted(set(_parts(route)) - set(old))
    snap.publish_generation(spark, route, kind="merge", add=new, remove=[old[0]])
    assert snap.retire_files(spark, route, [old[0]]) == 1
    # retired again → no-op
    assert snap.retire_files(spark, route, [old[0]]) == 0
    # the retired file is invisible to a directory-listing reader
    assert old[0] not in _parts(route)
    # latest = 60 - first file's rows + 10 replacements
    latest = snap.read_route_snapshot(spark, route)
    assert latest.filter(F.col("k") >= 1000).count() == 10
    # gen 1 = the original 60 rows, resolved through _retired/
    g1 = snap.resolve_snapshot(spark, route, 1)
    assert any(snap.RETIRED_DIR in p for p in g1["paths"])
    assert snap.read_route_snapshot(spark, route, generation=1).count() == 60


def test_cas_collision_replays_delta(spark, tmp_path, monkeypatch):
    """A publisher that loses the rename CAS must retry on top of the
    winner's manifest with its own delta intact."""
    route = _route(spark, tmp_path, n=20, files=1)
    snap.enable_snapshots(spark, route)
    real_write = snap._write_json_atomic
    state = {"injected": False}

    def racing_write(jvm, fs, dest, payload):
        if not state["injected"] and dest.endswith(snap._gen_name(2)):
            state["injected"] = True
            # the "other" writer commits gen 2 first
            real_write(
                jvm,
                fs,
                dest,
                {
                    "generation": 2,
                    "parent": 1,
                    "files": payload["files"] + ["part-other"],
                    "kind": "append",
                    "writer": "rival",
                    "created_utc_ms": 0,
                },
            )
            return False  # and our rename loses
        return real_write(jvm, fs, dest, payload)

    monkeypatch.setattr(snap, "_write_json_atomic", racing_write)
    g = snap.publish_generation(spark, route, kind="append", add=["part-mine"])
    assert g == 3
    m = snap.read_generation(spark, route, 3)
    # both writers' files survive, in either commit order
    assert "part-other" in m["files"] and "part-mine" in m["files"]


def test_prune_and_vacuum(spark, tmp_path):
    route = _route(spark, tmp_path, n=30, files=3)
    snap.enable_snapshots(spark, route)
    old = _parts(route)
    repl = spark.range(5).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    repl.coalesce(1).write.mode("append").parquet(route)
    new = sorted(set(_parts(route)) - set(old))
    snap.publish_generation(spark, route, kind="merge", add=new, remove=[old[0]])
    snap.retire_files(spark, route, [old[0]])
    snap.publish_generation(spark, route, kind="compact")  # gen 3, same files
    res = snap.prune_generations(
        spark, route, keep_last=2, vacuum_grace_seconds=0
    )
    assert res["pruned_generations"] == [1]
    # gen 1 was the only referent of the retired file → vacuumed
    assert res["vacuumed_files"] == [old[0]]
    assert snap.list_generations(spark, route) == [2, 3]
    with pytest.raises(FileNotFoundError):
        snap.read_generation(spark, route, 1)
    # latest still fully readable
    assert snap.read_route_snapshot(spark, route).count() == 25


def test_vacuumed_generation_raises(spark, tmp_path):
    route = _route(spark, tmp_path, n=10, files=1)
    snap.enable_snapshots(spark, route)
    jvm, _, fs = _hadoop_fs(spark, route)
    name = _parts(route)[0]
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{route}/{name}"), False)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        snap.resolve_snapshot(spark, route, 1)


def test_retire_conflict_and_missing_raise(spark, tmp_path):
    route = _route(spark, tmp_path, n=10, files=1)
    snap.enable_snapshots(spark, route)
    name = _parts(route)[0]
    with pytest.raises(IOError, match="neither live nor retired"):
        snap.retire_files(spark, route, ["part-not-there"])
    snap.retire_files(spark, route, [name])
    # re-create the live name → both copies exist → refuse
    with open(f"{route}/{name}", "wb") as f:
        f.write(b"impostor")
    with pytest.raises(IOError, match="both live and retired"):
        snap.retire_files(spark, route, [name])


def test_empty_generation_read_raises(spark, tmp_path):
    route = _route(spark, tmp_path, n=10, files=1)
    snap.enable_snapshots(spark, route)
    name = _parts(route)[0]
    snap.publish_generation(spark, route, kind="delete", remove=[name])
    with pytest.raises(ValueError, match="empty"):
        snap.read_route_snapshot(spark, route)


def test_manifest_is_sorted_json(spark, tmp_path):
    route = _route(spark, tmp_path, n=10, files=2)
    snap.enable_snapshots(spark, route)
    gen_file = os.path.join(route, snap.GEN_DIR, snap._gen_name(1))
    with open(gen_file, encoding="utf-8") as f:
        m = json.load(f)
    assert m["files"] == sorted(m["files"])
    assert m["generation"] == 1


def test_vacuum_grace_defers_just_retired(spark, tmp_path):
    """A vacuum concurrent with a slow publisher must leave a
    just-retired file alive: a rename into _retired/ bumps the
    DIRECTORY's mtime (the file's own mtime survives the rename and
    cannot date the retirement), so a default-grace prune defers the
    vacuum step — manifest pruning still runs — and a grace-0 prune on
    the quiesced route clears the file."""
    route = _route(spark, tmp_path, n=30, files=3)
    snap.enable_snapshots(spark, route)
    old = _parts(route)
    repl = spark.range(5).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v")
    )
    repl.coalesce(1).write.mode("append").parquet(route)
    new = sorted(set(_parts(route)) - set(old))
    snap.publish_generation(
        spark, route, kind="merge", add=new, remove=[old[0]]
    )
    snap.retire_files(spark, route, [old[0]])  # "slow publisher" just moved it

    res = snap.prune_generations(spark, route, keep_last=1)
    assert res["pruned_generations"] == [1]
    assert res["vacuum_deferred"] is True
    assert res["vacuumed_files"] == []
    jvm, _, fs = _hadoop_fs(spark, route)
    retired_p = jvm.org.apache.hadoop.fs.Path(
        f"{route}/{snap.RETIRED_DIR}/{old[0]}"
    )
    assert fs.exists(retired_p)
    # the publisher's idempotent retire retry still succeeds (the
    # vacuum did NOT create the "neither live nor retired" state)
    assert snap.retire_files(spark, route, [old[0]]) == 0

    res2 = snap.prune_generations(
        spark, route, keep_last=1, vacuum_grace_seconds=0
    )
    assert res2["vacuum_deferred"] is False
    assert res2["vacuumed_files"] == [old[0]]
    assert not fs.exists(retired_p)


def test_vacuum_grace_survives_synthetic_dir_mtime(spark, tmp_path):
    """Object stores and some Hadoop FS implementations report
    synthetic DIRECTORY mtimes (often 0). The grace must then date
    retirement off the newest FILE mtime under _retired/ instead of
    treating the directory as ancient and vacuuming a just-retired
    file out from under a slow publisher."""
    route = _route(spark, tmp_path, n=30, files=3)
    snap.enable_snapshots(spark, route)
    old = _parts(route)
    repl = spark.range(5).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v")
    )
    repl.coalesce(1).write.mode("append").parquet(route)
    new = sorted(set(_parts(route)) - set(old))
    snap.publish_generation(
        spark, route, kind="merge", add=new, remove=[old[0]]
    )
    snap.retire_files(spark, route, [old[0]])
    retired_dir = f"{route}/{snap.RETIRED_DIR}"
    os.utime(retired_dir, (0, 0))  # simulate a synthetic store mtime
    # the file under _retired/ keeps its real (recent) mtime — the
    # fallback must pick it up and defer
    res = snap.prune_generations(spark, route, keep_last=1)
    assert res["vacuum_deferred"] is True
    assert res["vacuumed_files"] == []
    jvm, _, fs = _hadoop_fs(spark, route)
    assert fs.exists(
        jvm.org.apache.hadoop.fs.Path(f"{retired_dir}/{old[0]}")
    )
    # a genuinely quiet route (file mtimes old too) still vacuums
    for f in os.listdir(retired_dir):
        os.utime(f"{retired_dir}/{f}", (0, 0))
    res2 = snap.prune_generations(spark, route, keep_last=1)
    assert res2["vacuum_deferred"] is False
    assert res2["vacuumed_files"] == [old[0]]
