"""Cross-check the MLlib LSH backends against the native operators."""

from __future__ import annotations

import pytest

pytest.importorskip("pyspark.ml")

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import ml_lsh
from iotgp_func_raw_data_ingest_spark.operators.dedup import jaccard_pairs


def test_ml_minhash_finds_constructed_dups(spark):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    near = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo zulu"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, "totally different words entirely here now")],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b) for r in
             ml_lsh.minhash_lsh_pairs_ml(df, "doc_id", "text", max_jaccard_distance=0.5).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert (1, 4) not in pairs


def test_ml_minhash_consistent_with_native(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    native = {(r.id_a, r.id_b) for r in jaccard_pairs(docs, "doc_id", "text", 3, 0.5).collect()}
    ml = {(r.id_a, r.id_b) for r in
          ml_lsh.minhash_lsh_pairs_ml(docs, "doc_id", "text", max_jaccard_distance=0.5).collect()}
    # ML pairs use hashed-bucket jaccard (collisions possible) and LSH
    # candidate recall; require strong overlap on this high-sim corpus
    if native:
        assert len(native & ml) >= 0.8 * len(native)


def test_ml_brp_ann_returns_k(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = ml_lsh.ann_neighbors_ml(emb, [float(x) for x in q], k=5)
    rows = out.collect()
    assert len(rows) == 5
    assert rows[0].id == 0 and rows[0].euclidean_dist == 0.0  # self is nearest


def test_dedup_against_ledger_flags_only_cross_increment_dups(spark):
    """Incremental dedup: a new doc that near-duplicates a LEDGER doc is
    flagged; a new doc that only duplicates another NEW doc is not (the
    increment is deduped against history, intra-increment dedup is
    minhash_lsh_pairs' job); an exact re-send scores est 1.0."""
    from iotgp_func_raw_data_ingest_spark.operators.dedup import (
        dedup_against_ledger,
        minhash_signatures,
    )

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    near = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo zulu"
    other = "totally different words entirely here right now for this document body"
    ledger_docs = spark.createDataFrame(
        [(10, base), (11, "unrelated ledger content nothing shared with anything else")],
        "doc_id long, text string",
    )
    new_docs = spark.createDataFrame(
        [(20, base), (21, near), (22, other), (23, other)],  # 22/23: intra-new dup only
        "doc_id long, text string",
    )
    ledger = minhash_signatures(ledger_docs, "doc_id", "text").drop("shingles")
    inc = minhash_signatures(new_docs, "doc_id", "text").drop("shingles")
    got = {r.id: (r.n_dup_sources, r.best_est)
           for r in dedup_against_ledger(inc, ledger).collect()}
    assert set(got) == {20, 21}          # 22/23 match each other, not history
    assert got[20] == (1, 1.0)           # exact re-send of a ledger doc
    assert got[21][0] == 1 and got[21][1] >= 0.5


def test_dedup_ledger_daily_cycle(spark, tmp_path):
    """Two-day ledger lifecycle: day-1 increment is deduped against the
    seed ledger and APPENDED to it (plain parquet append — the whole
    state update); day-2 then flags its dup against a day-1 doc, proving
    the ledger actually grows and the operator reads the appended rows."""
    from iotgp_func_raw_data_ingest_spark.operators.dedup import (
        dedup_against_ledger,
        minhash_signatures,
    )

    ledger_path = str(tmp_path / "ledger")
    seed = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    day1_doc = "one two three four five six seven eight nine ten eleven twelve"
    sigs = lambda rows: minhash_signatures(  # noqa: E731
        spark.createDataFrame(rows, "doc_id long, text string"), "doc_id", "text"
    ).drop("shingles")

    sigs([(1, seed)]).write.parquet(ledger_path)

    day1 = sigs([(10, day1_doc)])
    flagged1 = dedup_against_ledger(day1, spark.read.parquet(ledger_path)).collect()
    assert flagged1 == []  # nothing in history resembles day-1
    day1.write.mode("append").parquet(ledger_path)

    day2 = sigs([(20, day1_doc), (21, "fresh unseen content nothing prior matches")])
    flagged2 = {r.id: r.best_est
                for r in dedup_against_ledger(
                    day2, spark.read.parquet(ledger_path)).collect()}
    assert set(flagged2) == {20} and flagged2[20] == 1.0  # caught by day-1's append
