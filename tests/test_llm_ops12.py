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
