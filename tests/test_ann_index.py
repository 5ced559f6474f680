"""Persisted ANN index: lookup parity with the in-memory operator,
partition pruning in the physical plan, and the multi-probe recall knob."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators.similarity import (
    ann_topk,
    brute_force_topk,
    random_hyperplanes,
)
from iotgp_func_raw_data_ingest_spark.sources.ann_index import (
    ann_lookup,
    read_index_meta,
    write_ann_index,
)
from tests.conftest import SF_SMOKE

PLANES = random_hyperplanes(n_planes=8, dim=64)


def _corpus(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _queries(spark, n=5):
    return (
        _corpus(spark)
        .filter(F.col("vec_id") < n)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )


def test_index_roundtrip_and_meta(spark, tmp_path):
    idx = str(tmp_path / "idx")
    n_buckets = write_ann_index(_corpus(spark), idx, PLANES)
    assert n_buckets > 1
    meta = read_index_meta(spark, idx)
    assert meta["planes"] == PLANES and meta["id_col"] == "vec_id"
    # every corpus row survives, bucket is partition metadata
    back = spark.read.parquet(idx)
    assert back.count() == _corpus(spark).count()
    assert "bucket" in back.columns


def test_lookup_matches_inmemory_ann(spark, tmp_path):
    idx = str(tmp_path / "idx")
    write_ann_index(_corpus(spark), idx, PLANES)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann_lookup(
            spark, idx, _queries(spark), k=5, exclude_self=True
        ).collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann_topk(
            _corpus(spark), _queries(spark), PLANES, k=5, exclude_self=True
        ).collect()
    }
    assert got == want and got


def test_lookup_scan_is_partition_pruned(spark, tmp_path):
    idx = str(tmp_path / "idx")
    write_ann_index(_corpus(spark), idx, PLANES)
    plan = (
        ann_lookup(spark, idx, _queries(spark, n=2), k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the INDEX scan (not the unpartitioned query-side scan) must carry
    # the bucket IN (...) partition filter
    idx_scans = [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln and "/idx" in ln
    ]
    assert idx_scans
    assert all("PartitionFilters: [bucket" in ln for ln in idx_scans)


def test_multiprobe_recall_is_monotone(spark, tmp_path):
    idx = str(tmp_path / "idx")
    write_ann_index(_corpus(spark), idx, PLANES)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(
            _corpus(spark), _queries(spark), k=5, exclude_self=True
        ).collect()
    }

    def recall(probes: int) -> float:
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_lookup(
                spark, idx, _queries(spark), k=5, probes=probes,
                exclude_self=True,
            ).collect()
        }
        return len(got & truth) / len(truth)

    r0, r1, r2 = recall(0), recall(1), recall(2)
    assert 0.0 <= r0 <= r1 <= r2 <= 1.0
    # flipping each sign bit probes 8 extra buckets; on this corpus that
    # must recover strictly more of the exact top-5 set than bucket-only
    assert r1 > 0.0


def test_probes_is_hamming_radius():
    """probes=d probes every bucket within d bit flips: sum C(n,k) for
    k<=d buckets, all distinct, containing the exact bucket."""
    import math

    from iotgp_func_raw_data_ingest_spark.sources.ann_index import _probe_buckets

    import pytest as _pytest

    for d in range(4):
        got = _probe_buckets("b0110", d)
        want_n = sum(math.comb(4, k) for k in range(d + 1))
        assert len(got) == len(set(got)) == want_n
        assert got[0] == "b0110"
        assert all(
            sum(x != y for x, y in zip(g[1:], "0110")) <= d for g in got
        )
    # radius caps at the bit width; negative is rejected
    assert len(_probe_buckets("b01", 99)) == 4
    with _pytest.raises(ValueError):
        _probe_buckets("b01", -1)


def test_append_uses_index_planes_and_is_found(spark, tmp_path):
    idx = str(tmp_path / "idx")
    base = _corpus(spark).filter(F.col("vec_id") < 400)
    write_ann_index(base, idx, PLANES)
    extra = _corpus(spark).filter(F.col("vec_id") >= 400)
    from iotgp_func_raw_data_ingest_spark.sources.ann_index import append_ann_index

    added = append_ann_index(extra, idx)
    assert added == extra.count()
    back = spark.read.parquet(idx)
    assert back.count() == 500
    # an appended vector queried against the index must find itself
    q = extra.limit(1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = ann_lookup(spark, idx, q, k=1).collect()
    assert hits and hits[0]["neighbor_id"] == hits[0]["query_id"]
