"""Product quantization (operators/similarity.py pq_*): encoding picks
the nearest codeword per subspace, seed vectors encode to themselves,
and ADC distances over codes equal exact quantized distances whenever a
vector coincides with its codewords (the zero-quantization-error case —
hand-checkable ground truth)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import similarity as S

DIM, N_SUB, SUB = 8, 2, 4


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _base(spark):
    # 4 seed vectors (ids 0-3) with well-separated subvectors
    seeds = [  # distinct codewords per subspace (0,1,2,3)
        (0, [0.0] * 8),
        (1, [1.0] * 8),
        (2, [2.0] * 8),
        (3, [3.0] * 8),
    ]
    extra = [
        (10, [0.1] * 8),               # nearest: both subs -> code 0
        (11, [0.9] * 8),               # nearest: both subs -> code 1
        (12, [0.1] * 4 + [1.9] * 4),   # sub0 -> 0, sub1 -> 2
    ]
    return _vecs(spark, [(i, [float(x) for x in v]) for i, v in seeds + extra])


def test_pq_encode_nearest_codeword_and_self(spark):
    df = _base(spark)
    cb = S.pq_codebooks(df.filter(F.col("vec_id") < 4), n_sub=N_SUB, sub_dim=SUB)
    enc = S.pq_encode(df, cb, n_sub=N_SUB, sub_dim=SUB)
    got = {(r["vec_id"], r["sub"]): r["code"] for r in enc.collect()}
    for sid in range(4):  # seeds encode to themselves (d2 = 0 at own code)
        assert got[(sid, 0)] == sid and got[(sid, 1)] == sid
    assert (got[(10, 0)], got[(10, 1)]) == (0, 0)
    assert (got[(11, 0)], got[(11, 1)]) == (1, 1)
    assert (got[(12, 0)], got[(12, 1)]) == (0, 2)


def test_pq_encode_handles_codes_beyond_64(spark):
    """Seed ids (= code words) outside [0, 64) must encode correctly.

    Regression for the r6 ADVICE item: the old ``d2·64 + code`` packed
    argmin key silently corrupted codes ≥ 64 (the ``% 64`` unpacking
    aliased them); the key now reserves 17 bits for the code — chosen
    over a domain-free struct-min, which planned SortAggregate and
    spilled 43.7 GB at the 2M stress tier (docstring) — and any code
    outside [0, 2¹⁷) raises instead of corrupting (next test)."""
    rows = [
        (100, [0.0] * 8),
        (200, [1.0] * 8),
        (999, [2.0] * 8),
        (10, [0.1] * 8),               # nearest codeword: 100
        (11, [1.9] * 8),               # nearest codeword: 999
    ]
    df = _vecs(spark, [(i, [float(x) for x in v]) for i, v in rows])
    cb = S.pq_codebooks(df.filter(F.col("vec_id") >= 100), n_sub=N_SUB, sub_dim=SUB)
    enc = S.pq_encode(df, cb, n_sub=N_SUB, sub_dim=SUB)
    got = {(r["vec_id"], r["sub"]): r["code"] for r in enc.collect()}
    for sid in (100, 200, 999):  # seeds encode to their own (large) ids
        assert got[(sid, 0)] == sid and got[(sid, 1)] == sid
    assert (got[(10, 0)], got[(10, 1)]) == (100, 100)
    assert (got[(11, 0)], got[(11, 1)]) == (999, 999)


def test_pq_encode_rejects_out_of_domain_codes(spark):
    """A codebook id outside [0, 2^17) must RAISE at execution — never
    silently alias into another code (the failure mode the r6 ADVICE
    flagged on the old 6-bit packing)."""
    import pytest

    rows = [(1 << 17, [0.0] * 8), (5, [1.0] * 8), (10, [0.2] * 8)]
    df = _vecs(spark, [(i, [float(x) for x in v]) for i, v in rows])
    cb = S.pq_codebooks(df.filter(F.col("vec_id") != 10), n_sub=N_SUB, sub_dim=SUB)
    with pytest.raises(Exception, match="outside \\[0, 131072\\)"):
        S.pq_encode(df, cb, n_sub=N_SUB, sub_dim=SUB).collect()


def test_pq_adc_matches_exact_for_zero_quantization_error(spark):
    df = _base(spark)
    seeds = df.filter(F.col("vec_id") < 4)
    cb = S.pq_codebooks(seeds, n_sub=N_SUB, sub_dim=SUB)
    enc = S.pq_encode(seeds, cb, n_sub=N_SUB, sub_dim=SUB)
    queries = df.filter(F.col("vec_id") == 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = S.pq_adc_topk(enc, cb, queries, k=4, n_sub=N_SUB, sub_dim=SUB)
    rows = {r["neighbor_id"]: r["adc_dist"] for r in out.collect()}
    # corpus = the codewords themselves -> ADC distance IS the exact
    # quantized sq-L2. query 10 = [0.1]*8 in e6 units
    assert rows[0] == 8 * (100_000**2)
    assert rows[1] == 8 * (900_000**2)
    assert rows[2] == 8 * (1_900_000**2)
    assert rows[3] == 8 * (2_900_000**2)
    ranks = {r["neighbor_id"]: r["rank"] for r in out.collect()}
    assert ranks[0] == 1 and ranks[1] == 2 and ranks[2] == 3 and ranks[3] == 4


def test_pq_adc_excludes_self_and_respects_k(spark):
    df = _base(spark)
    cb = S.pq_codebooks(df.filter(F.col("vec_id") < 4), n_sub=N_SUB, sub_dim=SUB)
    enc = S.pq_encode(df, cb, n_sub=N_SUB, sub_dim=SUB)
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = S.pq_adc_topk(enc, cb, queries, k=3, n_sub=N_SUB, sub_dim=SUB).collect()
    by_q = {}
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())
