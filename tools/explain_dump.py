"""Dump ``explain("formatted")`` for named queries into a directory —
the before/after plan evidence an optimization round commits under
``plans/r{N}/``.

Run: python tools/explain_dump.py <out_dir> <suffix> <query...> [--sf=SF_DIR]

Each query lands at ``<out_dir>/<query>_<suffix>.txt``. Queries whose
builder RUNS streaming jobs / writes side outputs (the harness-style
gates) still produce a plan for the final returned DataFrame; for those
the file also notes that the plan covers only the returned summary, not
the streamed legs.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.plans import QUERIES
from iotgp_func_raw_data_ingest_spark.session import get_spark


def main() -> int:
    # accept both --sf=DIR and --sf DIR (r12 ADVICE: the space form was
    # silently consumed as query names), and print usage instead of an
    # IndexError when the positional args are missing
    sf_dir = "/root/testdata/sf0.01"
    args: list[str] = []
    it = iter(sys.argv[1:])
    for a in it:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--sf":
            sf_dir = next(it, sf_dir)
        else:
            args.append(a)
    if len(args) < 3:
        print(
            "usage: python tools/explain_dump.py <out_dir> <suffix> "
            "<query...> [--sf=SF_DIR]",
            file=sys.stderr,
        )
        return 2
    out_dir, suffix, names = args[0], args[1], args[2:]
    os.makedirs(out_dir, exist_ok=True)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cfg = EngineConfig(shuffle_partitions=int(cpus) if cpus.isdigit() else 32)
    spark = get_spark("explain-dump", config=cfg, master=f"local[{cpus}]")

    rc = 0
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not registered")
            rc = 1
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # noqa: BLE001 - report, keep going
            print(f"FAIL {name}: {ex}")
            rc = 1
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
