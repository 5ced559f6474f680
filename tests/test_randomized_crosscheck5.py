"""Randomized cross-checks for the round-7 operators: each is replayed
against an independent pure-Python/numpy reference sharing no code with
the operator — the gram matrix (block-BLAS over mapInArrow), SCD2 with
NULL-bearing attribute streams, and PQ encoding under sparse
large-domain code words."""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators.similarity import (
    gram_blocked,
    pq_codebooks,
    pq_encode,
)
from iotgp_func_raw_data_ingest_spark.operators.viewmaint import scd2_from_events


def test_gram_blocked_matches_numpy_random(spark):
    rng = random.Random(701)
    for trial, (d, block) in enumerate([(8, 3), (16, 16), (12, 5)]):
        n = rng.randint(5, 40)
        mat = [[rng.uniform(-2, 2) for _ in range(d)] for _ in range(n)]
        df = spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
            "vec_id long, embedding array<float>",
        )
        got = {
            (r["i"], r["j"]): r["gram_e12"]
            for r in gram_blocked(df, "embedding", d=d, block=block).collect()
        }
        # reference: float32 storage -> float64 -> floor to e6 ints, like
        # the operator's contract (parquet/DF column is array<float>)
        q = np.floor(
            np.array(mat, dtype=np.float32).astype(np.float64) * 1e6
        ).astype(np.int64)
        ref = q.T @ q
        assert len(got) == d * (d + 1) // 2, trial
        for (i, j), v in got.items():
            assert v == ref[i, j], (trial, i, j)


def _py_scd2(rows):
    """Pure-Python SCD2 replay: rows = (key, ts, tiebreak, attr).
    A version starts at the key's first event and at every null-safe
    attr change (None-to-None is NOT a change)."""
    out = []
    by_key = {}
    for r in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_key.setdefault(r[0], []).append(r)
    for key, evs in by_key.items():
        versions = []
        for _, ts, _tb, attr in evs:
            if not versions or attr != versions[-1][0]:
                versions.append((attr, ts))
        for i, (attr, ts) in enumerate(versions):
            nxt = versions[i + 1][1] if i + 1 < len(versions) else None
            out.append((key, i + 1, attr, ts, nxt, nxt is None))
    return out


def test_scd2_matches_python_replay_with_nulls(spark):
    rng = random.Random(702)
    rows = []
    tb = 0
    for key in range(6):
        t = 0
        for _ in range(rng.randint(1, 12)):
            t += rng.randint(1, 50)
            tb += 1
            attr = rng.choice([None, "a", "b", "c", None])
            rows.append((key, t, tb, attr))
    df = spark.createDataFrame(
        rows, "k int, ts long, tb int, attr string"
    ).select("k", F.timestamp_seconds("ts").alias("ts"), "tb", "attr")
    got = sorted(
        (r["k"], r["version"], r["attr"], r["is_current"])
        for r in scd2_from_events(df, "k", "attr", "ts", "tb").collect()
    )
    ref = sorted((k, v, a, cur) for k, v, a, _, _, cur in _py_scd2(rows))
    assert got == ref


def test_pq_encode_matches_python_argmin_sparse_codes(spark):
    rng = random.Random(703)
    n_sub, sub_dim = 2, 4
    # sparse, large code ids — exercises the widened 2^17 packed domain
    codes = [0, 63, 64, 4099, 130_000]
    seeds = [(c, [rng.uniform(-1, 1) for _ in range(8)]) for c in codes]
    corpus = seeds + [
        (200_000 + i, [rng.uniform(-1, 1) for _ in range(8)])
        for i in range(30)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in corpus],
        "vec_id long, embedding array<float>",
    )
    cb = pq_codebooks(
        df.filter(F.col("vec_id").isin(codes)), n_sub=n_sub, sub_dim=sub_dim
    )
    got = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_encode(df, cb, n_sub=n_sub, sub_dim=sub_dim).collect()
    }

    def e6(vec):
        return [
            int(np.floor(np.float64(np.float32(x)) * 1e6)) for x in vec
        ]

    seed_e6 = {c: e6(v) for c, v in seeds}
    for vid, vec in corpus:
        q = e6(vec)
        for m in range(n_sub):
            qs = q[m * sub_dim : (m + 1) * sub_dim]
            best = min(
                (
                    (
                        sum((a - b) ** 2 for a, b in zip(qs, seed_e6[c][m * sub_dim : (m + 1) * sub_dim])),
                        c,
                    )
                    for c in codes
                ),
            )[1]
            assert got[(vid, m)] == best, (vid, m)
