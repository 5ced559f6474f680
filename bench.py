"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric", "value" (total sec), "unit", "queries", "sf"}.

Each query is executed with a `noop`-format write so the full plan runs
(scan → shuffle → agg) without driver-side collection skewing the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Python WORKERS (pandas UDFs, the Python DataSource) import the package
# too, and they resolve it via PYTHONPATH, not the driver's sys.path —
# without this, running bench.py from outside the repo silently fails
# every worker-side-import query (-1.0 timings)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.plans import QUERIES
from iotgp_func_raw_data_ingest_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cfg = EngineConfig(shuffle_partitions=int(cpus) if cpus.isdigit() else 32)
    spark = get_spark("iotgp-bench", config=cfg, master=f"local[{cpus}]")

    # Warm the JVM with one untimed pass of EVERY query at the TARGET SF:
    # each distinct plan pays whole-stage-codegen compile + JIT on first
    # execution (measured 10.6s first run vs 3.5s steady-state for the
    # shingle self-join), and AQE re-plans per SF (runtime stats decide
    # broadcast vs SMJ and coalesced partition counts), so a warm pass at
    # a smaller SF still left the timed run paying sf-specific compiles
    # (q101: 5.0s first sf0.1 run vs 1.7s steady-state). Timed numbers
    # below are steady-state throughput at the target SF.
    for name in sorted(QUERIES):
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # the timed loop reports the failure

    # Drift sentinels (r6 VERDICT task 4): two fixed cheap queries timed
    # right after warm-up and again at capture end. Their plans never
    # change round-over-round, so any start→end or round→round movement
    # in the sentinel numbers measures AMBIENT BOX LOAD, not code — the
    # evidence that lets a bench-notes drift adjudication stand on its
    # own instead of arguing from capture-to-capture totals.
    sentinel_names = [n for n in sorted(QUERIES) if n.startswith(("q01_", "q02_"))]

    def _time_sentinels() -> dict[str, float]:
        out: dict[str, float] = {}
        for name in sentinel_names:
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                try:
                    QUERIES[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception:
                    reps.append(-1.0)
                    break
                reps.append(time.perf_counter() - t0)
            out[name] = round(sorted(reps)[len(reps) // 2], 3)  # median
        return out

    sentinel_start = _time_sentinels()

    timings: dict[str, float] = {}
    failures: list[str] = []
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception:
            # one broken query must not kill the whole bench run
            failures.append(name)
            timings[name] = -1.0

    # Settle pass, min-of-two for EVERY query (r7 VERDICT task 2):
    # capture order pollutes in-suite timings — queries that run right
    # after the Arrow-decode ingest block absorb a Python-worker
    # warmdown penalty (q31 measured bimodal: 2.9-3.4s solo steady-state
    # vs 13.1s in-suite, identical code/plan — BENCH_NOTES_r04.md), and
    # rounds 5-7 each spent a drift adjudication arguing 1.1-1.2×
    # in-suite swings back to parity with sentinel + solo-retime
    # evidence. Steady-state throughput is the quantity this bench
    # claims, so every query is timed TWICE and the min recorded — the
    # captured number is steady-state by construction (one extra warm
    # pass ≈ 4 min at sf0.1; sf and pass order identical round-over-
    # round, so captures stay comparable).
    retimed: dict[str, float] = {}
    for name in sorted(n for n, t in timings.items() if t > 0):
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            continue  # keep the first-pass number
        second = round(time.perf_counter() - t0, 3)
        if second < timings[name]:
            retimed[name] = timings[name]
            timings[name] = second

    sentinel_end = _time_sentinels()

    total = round(sum(v for v in timings.values() if v > 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "failures": failures,
                "first_pass_when_retimed": retimed,
                "sentinel_start": sentinel_start,
                "sentinel_end": sentinel_end,
            }
        )
    )


if __name__ == "__main__":
    main()
