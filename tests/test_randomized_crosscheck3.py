"""Randomized cross-checks for the round-6 tranche-3 operators (CMS,
Bloom, PQ) vs independent pure-Python references — the reference
reimplements the md5/fixed-point math from scratch (hashlib / plain
ints), sharing no code with the operators."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import similarity as S
from iotgp_func_raw_data_ingest_spark.operators import sketches as SK


def _pos(salt: str, sep: str, key: int, modulus: int) -> int:
    h = hashlib.md5(f"{salt}{sep}{key}".encode()).hexdigest()[:12]
    return int(h, 16) % modulus


def test_cms_matches_pure_python_sketch(spark):
    for seed, depth, width in ((7, 4, 64), (23, 3, 128)):
        rng = random.Random(seed)
        keys = [rng.randrange(50) for _ in range(600)]
        df = spark.createDataFrame([(k,) for k in keys], "key long")
        # pure-python CMS with the same md5 positions
        table = [[0] * width for _ in range(depth)]
        for k in keys:
            for d in range(depth):
                table[d][_pos(str(d), ":", k, width)] += 1
        probes = sorted(set(keys))[:25]
        cms = SK.cms_table(df, "key", depth=depth, width=width)
        got = {
            r["key"]: r["cms_est"]
            for r in SK.cms_lookup(
                cms,
                spark.createDataFrame([(k,) for k in probes], "key long"),
                "key",
                depth=depth,
                width=width,
            ).collect()
        }
        for k in probes:
            want = min(table[d][_pos(str(d), ":", k, width)] for d in range(depth))
            assert got[k] == want


def test_bloom_matches_pure_python_bits(spark):
    for seed, k_h, m in ((13, 2, 128), (31, 3, 256)):
        rng = random.Random(seed)
        members = sorted({rng.randrange(500) for _ in range(80)})
        build = spark.createDataFrame([(x,) for x in members], "key long")
        bits = {_pos(str(j), "#", x, m) for x in members for j in range(k_h)}
        got_bits = {
            r["pos"]
            for r in SK.bloom_bits(build, "key", n_hashes=k_h, n_bits=m).collect()
        }
        assert got_bits == bits
        probes = list(range(200))
        got = {
            r["key"]: r["bloom_hit"]
            for r in SK.bloom_probe(
                SK.bloom_bits(build, "key", n_hashes=k_h, n_bits=m),
                spark.createDataFrame([(x,) for x in probes], "key long"),
                "key",
                n_hashes=k_h,
                n_bits=m,
            ).collect()
        }
        for x in probes:
            want = all(_pos(str(j), "#", x, m) in bits for j in range(k_h))
            assert got[x] == want


def test_pq_matches_pure_python_adc(spark):
    n_sub, sub_dim = 2, 4
    for seed in (3, 19):
        rng = random.Random(seed)
        vecs = {
            i: [round(rng.uniform(-1, 1), 3) for _ in range(n_sub * sub_dim)]
            for i in range(40)
        }
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in vecs.items()],
            "vec_id long, embedding array<float>",
        )

        def e6(v):
            # float32 storage then e6 round, replaying the operator's cast
            import struct

            return [round(struct.unpack("f", struct.pack("f", x))[0] * 1e6) for x in v]

        cbs = {
            (c, m): e6(vecs[c])[m * sub_dim : (m + 1) * sub_dim]
            for c in range(8)
            for m in range(n_sub)
        }

        def sq(a, b):
            return sum((x - y) * (x - y) for x, y in zip(a, b))

        enc = {}
        for i, v in vecs.items():
            q = e6(v)
            for m in range(n_sub):
                sv = q[m * sub_dim : (m + 1) * sub_dim]
                enc[(i, m)] = min(
                    range(8), key=lambda c: (sq(sv, cbs[(c, m)]), c)
                )
        adc = {}
        for qid in range(3):
            qv = e6(vecs[qid])
            for i in vecs:
                if i == qid:
                    continue
                adc[(qid, i)] = sum(
                    sq(
                        qv[m * sub_dim : (m + 1) * sub_dim],
                        cbs[(enc[(i, m)], m)],
                    )
                    for m in range(n_sub)
                )
        want_top = {
            qid: sorted(
                ((d, i) for (q, i), d in adc.items() if q == qid)
            )[:5]
            for qid in range(3)
        }

        cb = S.pq_codebooks(df.filter(F.col("vec_id") < 8), n_sub=n_sub, sub_dim=sub_dim)
        encoded = S.pq_encode(df, cb, n_sub=n_sub, sub_dim=sub_dim)
        queries = df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        out = S.pq_adc_topk(
            encoded, cb, queries, k=5, n_sub=n_sub, sub_dim=sub_dim
        ).collect()
        got_top = {}
        for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
            got_top.setdefault(r["query_id"], []).append(
                (r["adc_dist"], r["neighbor_id"])
            )
        assert got_top == want_top
