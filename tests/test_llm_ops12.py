"""Semantic invariants for the training-loader determinism tranche
(q205 epoch shuffle, q206 mixture schedule)."""

from __future__ import annotations

from iotgp_func_raw_data_ingest_spark.plans import QUERIES
from tests.conftest import SF_SMOKE


def test_epoch_shuffle_is_a_partition_of_the_corpus(spark):
    rows = QUERIES["q205_epoch_shuffle"](spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert sum(r["sum_chars"] for r in rows) == (
        docs.groupBy().sum("n_chars").collect()[0][0]
    )
    shards = {r["shard"] for r in rows}
    assert shards <= set("0123456789abcdef")
    # 500 docs over 16 hash shards: every shard populated, roughly even
    assert len(shards) == 16
    counts = [r["n_docs"] for r in rows]
    assert max(counts) < 4 * min(counts)


def test_epoch_shuffle_reacts_to_the_seed(spark):
    """Same query with a different seed string must produce a different
    first_doc somewhere — the shuffle is keyed by the seed, not fixed."""
    base = {r["shard"]: r["first_doc"] for r in
            QUERIES["q205_epoch_shuffle"](spark, SF_SMOKE).collect()}
    other = {
        r["shard"]: r["first_doc"]
        for r in spark.sql(
            """
            WITH keyed AS (
                SELECT doc_id, n_chars,
                       md5(concat('epoch:8:', CAST(doc_id AS STRING))) AS k
                FROM documents
            )
            SELECT substring(k, 1, 1) AS shard,
                   min_by(doc_id, k) AS first_doc
            FROM keyed GROUP BY substring(k, 1, 1)
            """
        ).collect()
    }
    assert base != other


def test_mixture_schedule_is_round_robin(spark):
    rows = QUERIES["q206_mixture_schedule"](spark, SF_SMOKE).collect()
    assert len(rows) == 64
    # every (step, source) slot unique; every doc served at most once
    assert len({(r["step"], r["source"]) for r in rows}) == 64
    assert len({r["doc_id"] for r in rows}) == 64
    # slots fill in step order: any row of step s implies full steps < s
    n_sources = 20
    by_step: dict[int, int] = {}
    for r in rows:
        by_step[r["step"]] = by_step.get(r["step"], 0) + 1
    steps = sorted(by_step)
    assert steps == list(range(1, len(steps) + 1))
    for s in steps[:-1]:
        assert by_step[s] == n_sources


def test_weighted_mixture_respects_stride_ratios(spark):
    rows = QUERIES["q215_weighted_mixture"](spark, SF_SMOKE).collect()
    assert len(rows) == 60
    assert len({(r["vt"], r["source"]) for r in rows}) == 60
    assert len({r["doc_id"] for r in rows}) == 60
    # within any complete lcm window, a weight-3 source (stride 2)
    # serves 3 docs for each doc of a weight-1 source (stride 6)
    per_source = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
    for source, served in per_source.items():
        w = 1 + int(source[3:]) % 3
        stride = 6 // w
        # vt values are consecutive multiples of the stride from rank 1
        vts = sorted(x["vt"] for x in served)
        assert vts == [stride * (i + 1) for i in range(len(vts))]


def test_quota_allocation_sums_exactly(spark):
    rows = QUERIES["q216_quota_allocation"](spark, SF_SMOKE).collect()
    assert sum(r["quota"] for r in rows) == 100
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    total = docs.count()
    for r in rows:
        exact = 100 * r["n_docs"] / total
        # largest-remainder never strays more than one seat from exact
        assert abs(r["quota"] - exact) < 1.0
