"""Solo re-time a SUBSET of queries with the bench's methodology
(noop sink, warm pass, then min of two timed passes) — the A/B
instrument for optimization work, so a single-query change doesn't
need a full 20-minute suite capture.

Run: python tools/time_queries.py <names...> [--sf=SF_DIR] [--reps=N]

Prints one JSON line {name: seconds} (min over reps) plus the q01/q02
sentinels so captures taken at different times stay comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.plans import QUERIES
from iotgp_func_raw_data_ingest_spark.session import get_spark


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    reps = 2
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        else:
            names.append(a)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cfg = EngineConfig(shuffle_partitions=int(cpus) if cpus.isdigit() else 32)
    spark = get_spark("time-queries", config=cfg, master=f"local[{cpus}]")

    def run(name: str) -> None:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # clamp reps (reps=0 would leave best=None → TypeError) and dedupe
    # an explicitly requested sentinel so it isn't timed twice
    reps = max(1, reps)
    sentinels = [n for n in sorted(QUERIES) if n.startswith(("q01_", "q02_"))]
    out: dict[str, float] = {}
    seen: set[str] = set()
    for name in sentinels + names:
        if name in seen:
            continue
        seen.add(name)
        if name not in QUERIES:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        run(name)  # warm: codegen/JIT for this plan shape
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            run(name)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
