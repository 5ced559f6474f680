"""Semantic invariants for the ML-prep/behavioral tranche
(q217 embedding gram matrix, q218 session paths)."""

from __future__ import annotations

from iotgp_func_raw_data_ingest_spark.plans import QUERIES
from tests.conftest import SF_SMOKE


def test_gram_matrix_shape_and_diagonal(spark):
    rows = QUERIES["q217_embedding_gram"](spark, SF_SMOKE).collect()
    assert len(rows) == 64 * 65 // 2  # upper triangle incl. diagonal
    cells = {(r["i"], r["j"]): r["gram_e12"] for r in rows}
    assert all(i <= j for i, j in cells)
    # diagonal entries are sums of squares — strictly positive
    assert all(cells[(d, d)] > 0 for d in range(64))
    # Cauchy-Schwarz on the fixed-point gram: g_ij^2 <= g_ii * g_jj
    for (i, j), g in cells.items():
        if i != j:
            assert g * g <= cells[(i, i)] * cells[(j, j)]


def test_gram_matches_numpy_on_the_smoke_corpus(spark):
    import numpy as np

    emb = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
            .select("embedding").collect()
        ],
        dtype=np.float64,
    )
    q = np.floor(emb * 1e6).astype(np.int64)
    expected = q.T @ q  # exact integer gram in micro-units²
    cells = {
        (r["i"], r["j"]): r["gram_e12"]
        for r in QUERIES["q217_embedding_gram"](spark, SF_SMOKE).collect()
    }
    for (i, j), g in cells.items():
        assert g == expected[i, j], (i, j)


def test_gram_blocked_equals_expression_plan(spark):
    """The mapInArrow block-BLAS gram (operators/similarity.gram_blocked
    — the d≫64 scale path q217's docstring commits to) must be
    BIT-IDENTICAL to q217's gated Catalyst expression plan: both floor
    to int64 micro-units before multiplying, so there is no tolerance —
    any cell off by 1 means the fixed-point conventions diverged. A
    non-divisor block size exercises the ragged edge tiles."""
    expr = {
        (r["i"], r["j"]): r["gram_e12"]
        for r in QUERIES["q217_embedding_gram"](spark, SF_SMOKE).collect()
    }
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    from iotgp_func_raw_data_ingest_spark.operators.similarity import (
        gram_blocked,
    )

    for block in (64, 24):  # divisor and ragged tilings
        got = {
            (r["i"], r["j"]): r["gram_e12"]
            for r in gram_blocked(emb, "embedding", d=64, block=block).collect()
        }
        assert got == expr, f"block={block}"


def test_gram_blocked_tiny_hand_checked(spark):
    from iotgp_func_raw_data_ingest_spark.operators.similarity import (
        gram_blocked,
    )

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0],), ([0.5, -1.0, 0.25],)],
        "embedding array<float>",
    )
    got = {
        (r["i"], r["j"]): r["gram_e12"]
        for r in gram_blocked(df, "embedding", d=3, block=2).collect()
    }
    m = 1_000_000
    v1, v2 = [m, 2 * m, 3 * m], [m // 2, -m, m // 4]
    expected = {
        (i, j): v1[i] * v1[j] + v2[i] * v2[j]
        for i in range(3)
        for j in range(i, 3)
    }
    assert got == expected


def test_session_paths_are_wellformed(spark):
    rows = QUERIES["q218_session_paths"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    types = {"click", "view", "purchase", "signup", "error"}
    for r in rows:
        steps = r["path"].split(">")
        assert 1 <= len(steps) <= 8
        assert set(steps) <= types
