"""Randomized cross-checks for the round-6 operators vs independent
pure-Python references (same philosophy as test_randomized_crosscheck:
seeded corpora, reference shares no code with the operator)."""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import expectations as E
from iotgp_func_raw_data_ingest_spark.operators import sketches as SK


def test_expectations_match_pure_python(spark):
    for seed in (3, 11, 29):
        rng = random.Random(seed)
        rows = [
            (
                rng.randrange(40),                      # id: guaranteed dups
                rng.choice(["a", "b", "c", None]),      # name with nulls
                rng.choice([rng.uniform(0, 100), None]),
            )
            for _ in range(300)
        ]
        df = spark.createDataFrame(rows, "id long, name string, v double")
        ref_ids = list(range(0, 40, 2))                 # evens are valid FK targets
        ref = spark.createDataFrame([(i,) for i in ref_ids], "k long")
        got = {
            r["expectation"]: (r["violations"], r["n_rows"])
            for r in E.validate_expectations(
                df,
                [
                    E.expect_not_null("nn", "name"),
                    E.expect_between("rng", "v", 10, 90),
                    E.expect_in_set("dom", "name", ["a", "b"]),
                    E.expect_unique("uq", ["id"]),
                    E.expect_foreign_key("fk", ["id"], ref, ["k"]),
                ],
            ).collect()
        }
        n = len(rows)
        assert got["nn"] == (sum(1 for r in rows if r[1] is None), n)
        assert got["rng"] == (
            sum(1 for r in rows if r[2] is None or not (10 <= r[2] <= 90)), n
        )
        assert got["dom"] == (sum(1 for r in rows if r[1] not in ("a", "b")), n)
        counts = Counter(r[0] for r in rows)
        assert got["uq"] == (sum(c - 1 for c in counts.values()), n)
        assert got["fk"] == (sum(1 for r in rows if r[0] not in ref_ids), n)


def test_theta_overlap_matches_exact_set_algebra(spark):
    for seed in (5, 17):
        rng = random.Random(seed)
        a = [(rng.choice("xy"), rng.randrange(200)) for _ in range(400)]
        b = [(rng.choice("xy"), rng.randrange(200)) for _ in range(400)]
        da = spark.createDataFrame(a, "g string, uid long")
        db = spark.createDataFrame(b, "g string, uid long")
        out = {
            r["g"]: (r["union_est"], r["overlap_est"], r["only_a_est"], r["only_b_est"])
            for r in SK.theta_overlap(
                SK.theta_distinct(da, ["g"], "uid"),
                SK.theta_distinct(db, ["g"], "uid"),
                ["g"],
            ).collect()
        }
        sa, sb = defaultdict(set), defaultdict(set)
        for g, u in a:
            sa[g].add(u)
        for g, u in b:
            sb[g].add(u)
        for g in out:
            A, B = sa[g], sb[g]
            # below nominal entries the sketch retains every hash -> exact
            assert out[g] == (len(A | B), len(A & B), len(A - B), len(B - A))


def test_kll_rollup_quantiles_match_numpy_disc(spark):
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        aggregate_increment,
        merge_rollup_frames,
        rollup_quantile_estimate,
    )
    import datetime as dt

    for seed in (2, 13):
        rng = random.Random(seed)
        rows = [
            (dt.datetime(2024, 1, 1 + rng.randrange(3), rng.randrange(24)),
             "t", round(rng.uniform(0, 1000), 3))
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "ts timestamp, d string, value double")
        aggs = ("count", "approx_quantile")
        parts = [
            aggregate_increment(
                df.filter(F.dayofmonth("ts") % 2 == p), "ts", "day", ["d"],
                "value", aggs=aggs,
            )
            for p in (0, 1)
        ]
        rolled = rollup_quantile_estimate(
            merge_rollup_frames(parts[0], parts[1], ["d"], aggs),
            {"p50": 0.5, "p90": 0.9},
        )
        got = {r["bucket_start"].day: (r["count_v"], r["p50"], r["p90"])
               for r in rolled.collect()}
        by_day = defaultdict(list)
        for ts, _, v in rows:
            by_day[ts.day].append(v)
        for day, vals in by_day.items():
            vals.sort()
            n = len(vals)
            # exact mode (n < k): estimate IS the value at rank ceil(q*n)
            exp = (n, vals[math.ceil(0.5 * n) - 1], vals[math.ceil(0.9 * n) - 1])
            assert got[day] == exp


def test_pagerank_iterations_match_pure_python(spark):
    for seed in (9, 23):
        rng = random.Random(seed)
        nodes = list(range(20))
        pairs = sorted(
            {tuple(sorted(rng.sample(nodes, 2))) for _ in range(40)}
        )
        pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
        from iotgp_func_raw_data_ingest_spark.operators.graph import (
            pagerank_from_pairs,
        )
        ranks = pagerank_from_pairs(pdf, iterations=3, damping=0.85)
        got = {r["id"]: r["rank"] for r in ranks.collect()}

        adj = defaultdict(list)
        for a, b in pairs:
            adj[a].append(b)
            adj[b].append(a)
        pr = {v: 1.0 for v in adj}
        for _ in range(3):
            nxt = {}
            for v in adj:
                s = sum(pr[u] / len(adj[u]) for u in adj[v])
                nxt[v] = round(0.15 + 0.85 * s, 9)
            pr = nxt
        assert set(got) == set(pr)
        for v in pr:
            assert abs(got[v] - pr[v]) < 1e-8, (v, got[v], pr[v])


def test_psi_drift_matches_pure_python(spark):
    from iotgp_func_raw_data_ingest_spark.operators.sketches import (
        kll_value_sketch,
        quantile_drift_psi,
    )

    for seed, shift in ((4, 0.0), (19, 30.0)):
        rng = random.Random(seed)
        a = [("g", round(rng.uniform(0, 100), 3)) for _ in range(400)]
        b = [("g", round(rng.uniform(0, 100) + shift, 3)) for _ in range(400)]
        da = spark.createDataFrame(a, "g string, v double")
        db = spark.createDataFrame(b, "g string, v double")
        got = quantile_drift_psi(
            kll_value_sketch(da, ["g"], "v"),
            kll_value_sketch(db, ["g"], "v"),
            ["g"],
            n_buckets=10,
        ).collect()[0]["psi"]

        va = sorted(v for _, v in a)
        vb = sorted(v for _, v in b)
        n = len(va)
        edges = [va[math.ceil(i / 10 * n) - 1] for i in range(1, 10)]
        def cdf(vals, x):
            return sum(1 for v in vals if v <= x) / len(vals)
        cra = [0.0] + [cdf(va, e) for e in edges] + [1.0]
        crb = [0.0] + [cdf(vb, e) for e in edges] + [1.0]
        exp = 0.0
        for i in range(1, 11):
            pa = max(cra[i] - cra[i - 1], 1e-6)
            pb = max(crb[i] - crb[i - 1], 1e-6)
            exp += (pa - pb) * math.log(pa / pb)
        assert abs(got - exp) < 1e-9, (got, exp)
        if shift:
            assert got > 0.25   # a 30% domain shift must read as "shifted"
        else:
            assert got < 0.1    # same distribution must read as stable
