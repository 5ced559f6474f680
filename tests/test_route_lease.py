"""Advisory single-writer-per-route lease (``lake.route_writer_lease``):
maintenance rewriters (compact / upsert / merge / keyed delete /
tombstone expiry / generation prune) CAS-create ``_writer_lease.json``
before planning and release it when done, so two concurrent rewriters on
one route produce one winner and one loud ``RouteLeaseHeld`` refusal —
the DEPLOYMENT contract converted from operator discipline into an
error. In-process failures release in ``finally``; a whole-process
crash leaves a lease that goes stale after the heal grace (or is
broken explicitly with ``break_route_lease``)."""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    ROUTE_LEASE_NAME,
    RouteLeaseHeld,
    break_route_lease,
    compact_lake_table,
    route_writer_lease,
)
from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
    delete_keys_from_table,
)


def _route(spark, tmp_path, n=60):
    lake = str(tmp_path / "lake")
    route = f"{lake}/f/db/t"
    spark.range(1, n + 1).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    ).repartition(3).write.parquet(route)
    return lake, route


def _doomed(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def test_concurrent_rewriters_one_winner_one_refusal(spark, tmp_path):
    """While one thread holds the route lease, a peer maintenance op
    refuses loudly (naming the holder); after release it succeeds."""
    lake, route = _route(spark, tmp_path)
    acquired, release = threading.Event(), threading.Event()

    def holder():
        with route_writer_lease(spark, route, "test-holder"):
            acquired.set()
            release.wait(30)

    t = threading.Thread(target=holder)
    t.start()
    assert acquired.wait(30)
    try:
        with pytest.raises(RouteLeaseHeld, match="test-holder"):
            delete_keys_from_table(spark, route, "k", _doomed(spark, 1, 4))
        with pytest.raises(RouteLeaseHeld):
            compact_lake_table(
                spark, lake, "f", "db", "t", EngineConfig(max_batch_size=100)
            )
        # the refused ops changed nothing
        assert spark.read.parquet(route).count() == 60
    finally:
        release.set()
        t.join(30)
    rep = delete_keys_from_table(spark, route, "k", _doomed(spark, 1, 4))
    assert rep["rows_deleted"] == 3
    assert not os.path.exists(f"{route}/{ROUTE_LEASE_NAME}")


def test_failed_op_releases_its_lease(spark, tmp_path, monkeypatch):
    """An op that dies with an exception mid-protocol must not strand
    its lease — the next rewriter acquires cleanly."""
    from iotgp_func_raw_data_ingest_spark.sources import maintenance as mnt

    lake, route = _route(spark, tmp_path)

    def crash(spark_, table_path, stage_name):
        raise RuntimeError("injected crash")

    real = mnt._finish_keyed_delete
    monkeypatch.setattr(mnt, "_finish_keyed_delete", crash)
    with pytest.raises(RuntimeError, match="injected crash"):
        delete_keys_from_table(spark, route, "k", _doomed(spark, 1, 4))
    monkeypatch.setattr(mnt, "_finish_keyed_delete", real)
    assert not os.path.exists(f"{route}/{ROUTE_LEASE_NAME}")
    # the retry acquires cleanly; its preamble heals the crashed run's
    # READY stage (the delete already landed), so nothing is left to do
    rep = delete_keys_from_table(spark, route, "k", _doomed(spark, 1, 4))
    assert rep["rows_deleted"] == 0
    remaining = {r["k"] for r in spark.read.parquet(route).collect()}
    assert remaining == set(range(4, 61))
    assert not os.path.exists(f"{route}/{ROUTE_LEASE_NAME}")


def test_stale_lease_is_broken_and_reacquired(spark, tmp_path):
    """A lease a KILLED process left behind goes stale after the heal
    grace: the next op breaks it and proceeds (same philosophy as
    clearing a quiet unready stage)."""
    lake, route = _route(spark, tmp_path)
    with route_writer_lease(spark, route, "zombie"):
        # simulate the process dying with the lease held: forget the
        # in-memory registry entry and age the file past the grace
        from iotgp_func_raw_data_ingest_spark.sources.lake import (
            _HELD_ROUTE_LEASES,
        )

        _HELD_ROUTE_LEASES.routes.clear()
        lease = f"{route}/{ROUTE_LEASE_NAME}"
        os.utime(lease, (1_000_000, 1_000_000))
        rep = delete_keys_from_table(spark, route, "k", _doomed(spark, 1, 4))
        assert rep["rows_deleted"] == 3

    # a FRESH foreign lease refuses until broken explicitly
    with route_writer_lease(spark, route, "fresh-zombie"):
        from iotgp_func_raw_data_ingest_spark.sources.lake import (
            _HELD_ROUTE_LEASES,
        )

        _HELD_ROUTE_LEASES.routes.clear()
        with pytest.raises(RouteLeaseHeld, match="fresh-zombie"):
            delete_keys_from_table(spark, route, "k", _doomed(spark, 4, 6))
        assert break_route_lease(spark, route) is True
        rep = delete_keys_from_table(spark, route, "k", _doomed(spark, 4, 6))
        assert rep["rows_deleted"] == 2


def test_reentrant_same_thread_passes_through(spark, tmp_path):
    """An op invoked under its caller's lease on the same route must not
    self-deadlock (e.g. a rollup's upsert under an orchestrator's
    lease)."""
    lake, route = _route(spark, tmp_path)
    with route_writer_lease(spark, route, "orchestrator"):
        rep = delete_keys_from_table(spark, route, "k", _doomed(spark, 1, 4))
        assert rep["rows_deleted"] == 3
        # still held by the orchestrator afterwards
        assert os.path.exists(f"{route}/{ROUTE_LEASE_NAME}")
    assert not os.path.exists(f"{route}/{ROUTE_LEASE_NAME}")


def test_prune_generations_takes_the_lease(spark, tmp_path):
    """The vacuum half of prune_generations is a destructive rewrite
    peer — it must refuse while another rewriter holds the route."""
    lake, route = _route(spark, tmp_path)
    snap.enable_snapshots(spark, route)
    acquired, release = threading.Event(), threading.Event()

    def holder():
        with route_writer_lease(spark, route, "compactor"):
            acquired.set()
            release.wait(30)

    t = threading.Thread(target=holder)
    t.start()
    assert acquired.wait(30)
    try:
        with pytest.raises(RouteLeaseHeld):
            snap.prune_generations(spark, route, keep_last=1)
    finally:
        release.set()
        t.join(30)
    out = snap.prune_generations(spark, route, keep_last=1)
    assert out["pruned_generations"] == []  # only gen 1 exists — kept


def test_missing_route_skips_lease(spark, tmp_path):
    """A lease on a route that does not exist yet is skipped (nothing to
    protect) — the op's own error/first-write behavior surfaces."""
    missing = str(tmp_path / "nope")
    with route_writer_lease(spark, missing, "x") as token:
        assert token is None
    assert not os.path.exists(missing)
