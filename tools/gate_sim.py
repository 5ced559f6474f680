"""Full driver-gate simulation: run EVERY registered query against its
DuckDB oracle with a vanilla SparkSession (the driver builds its own
session — this catches any accidental reliance on session.py confs).

Run: python tools/gate_sim.py [sf_dir] [name-prefix-filter]

Prints one PASS/FAIL line per query and a failure summary; exit code 1
on any failure. This is the builder-side replica of the per-round
CORRECTNESS_r{N}.json gate, without the 50-query rotation window.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Python workers resolve the package via PYTHONPATH (see bench.py) —
# keep the gate runnable from any cwd
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # comma-separated prefixes select a subset (one Spark startup for a
    # targeted re-gate after an operator change)
    prefix = tuple((sys.argv[2] if len(sys.argv) > 2 else "").split(","))
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("gate-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from tests.oracle_compare import compare

    qs, oracles = e.queries(), e.oracle_sql()
    fails: list[tuple[str, str]] = []
    names = [n for n in sorted(qs) if n.startswith(prefix)]
    for name in names:
        try:
            ok, msg = compare(qs[name](spark, sf_dir), oracles[name], sf_dir)
        except Exception as ex:  # noqa: BLE001 - report, keep going
            ok, msg = False, f"EXC {ex}"
        print(("PASS" if ok else "FAIL"), name, "" if ok else msg[:200], flush=True)
        if not ok:
            fails.append((name, msg[:200]))
    print(f"{len(names) - len(fails)}/{len(names)} green; failures: {fails or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
