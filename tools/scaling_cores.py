"""Core-scaling capture at a LARGER data tier than the driver's sf0.1
— the signal the r12 verdict asked for (item 3): at sf0.1 the whole
suite is fixed-overhead-bound (114 queries < 0.5 s), so the driver's
8-vs-32-core probe measures Spark's constant costs, not parallelism.
This tool materializes an sf1-shaped tier (10× sf0.1) and times the
HEAVY data-bound queries at two core counts with the bench's
methodology (noop sink, warm pass, min of 2 timed passes).

The sf1 tier is TILED from the driver's read-only sf0.1 fixtures: ten
key-shifted copies of every scaled table (dims stay 1×, mirroring
TPC-H's sf scaling). Tiling preserves every predicate's selectivity
(each tile is distributionally identical to sf0.1) while keeping the
pair/similarity workloads honest:

- ``documents.text`` gets a per-tile token prefix, so tiles are
  DISJOINT shingle sub-corpora — near-dup pair counts scale exactly
  10×, instead of every doc gaining 9 exact twins (which would blow
  the pair relation up ~50× and measure a different workload);
- ``embeddings.embedding`` gets small per-tile deterministic noise for
  the same reason (no zero-distance twin pairs);
- key columns shift by tile × (max key + 1), so joins keep their
  1:N shapes and dedup keys stay unique.

Usage:
  python tools/scaling_cores.py gen [out_dir]          # materialize sf1
  python tools/scaling_cores.py time <dir> <cpus> [out.json]
  python tools/scaling_cores.py report <big.json> <small.json>

Run `time` as SEPARATE processes (one per core count) so each gets a
fresh JVM — the same discipline as the driver's c8 run.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/tmp/sfdata/sf1"
TILES = 10

# heavy data-bound queries (≥ ~2 s at sf0.1 and scaling-classified as
# linear-or-better / pair-generating in SCALING.md) + the two sentinels;
# streaming/lake-protocol queries are excluded on purpose — their cost
# is availableNow lifecycle fixed cost, which no core count changes
QUERIES_TO_TIME = [
    "q01_pricing_summary", "q02_selective_scan",
    "q29_ingest_volume", "q31_ngram_jaccard_pairs", "q32_minhash_lsh_pairs",
    "q34_simhash_neardup_pairs", "q35_text_profile", "q59_approx_aggs",
    "q68_corpus_curation", "q69_neardup_clusters", "q86_ivf_ann_topk",
    "q98_contamination_check", "q101_winnow_fingerprint",
    "q106_ngram_novelty", "q109_late_supplier_blame", "q113_simgraph_degree",
    "q125_kmeans_refine", "q126_trigram_langid", "q127_shingle_containment",
    "q139_semantic_lexical_dedup", "q147_lsh_recall_eval",
    "q162_dup_pair_provenance", "q167_lsh_precision_eval",
    "q168_simgraph_triangles", "q171_simhash64_fingerprints",
    "q172_simhash64_pairs", "q176_fastss_d2_pairs", "q217_embedding_gram",
    "q225_entity_resolution",
]

SCALED = ["customer", "supplier", "part", "orders", "lineitem", "events",
          "documents", "embeddings"]
DIMS = ["region", "nation"]
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _gen(out_dir: str) -> None:
    from pyspark.sql import functions as F

    from iotgp_func_raw_data_ingest_spark.config import EngineConfig
    from iotgp_func_raw_data_ingest_spark.session import get_spark

    spark = get_spark("scaling-gen", config=EngineConfig(shuffle_partitions=32),
                      master="local[32]")
    os.makedirs(out_dir, exist_ok=True)
    for name in DIMS:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")
        print(f"copied dim {name}")
    # offsets: tile t shifts every key column by t * (max over ALL key
    # domains + 1), one shared offset so FK edges stay aligned
    # (custkey in orders shifts exactly like custkey in customer)
    base = {}
    for name in SCALED:
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        for kc in KEY_COLS[name]:
            hi = df.agg(F.max(F.col(kc))).first()[0]
            base[kc] = int(hi) + 1
    # one offset domain per key FAMILY (custkey appears in customer and
    # orders; suppkey/partkey/orderkey in two tables each)
    fam = {
        "c_custkey": "cust", "o_custkey": "cust",
        "s_suppkey": "supp", "l_suppkey": "supp",
        "p_partkey": "part", "l_partkey": "part",
        "o_orderkey": "order", "l_orderkey": "order",
        "event_id": "event", "user_id": "cust",
        "doc_id": "doc", "vec_id": "vec",
    }
    fam_base = {}
    for kc, b in base.items():
        f = fam[kc]
        fam_base[f] = max(fam_base.get(f, 0), b)

    for name in SCALED:
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        tiles = []
        for t in range(TILES):
            tile = df
            for kc in KEY_COLS[name]:
                off = t * fam_base[fam[kc]]
                tile = tile.withColumn(kc, (F.col(kc) + F.lit(off)).cast(
                    dict(df.dtypes)[kc]))
            if name == "documents" and t > 0:
                # disjoint shingle space per tile (see module docstring)
                tile = tile.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(F.lit(f"t{t}_"), w),
                        ),
                        " ",
                    ),
                )
            if name == "embeddings" and t > 0:
                tile = tile.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x, i: (
                            x
                            + (F.pmod(F.hash(F.col("vec_id"), i, F.lit(t)),
                                      F.lit(1000)).cast("float")
                               / F.lit(5000.0) - F.lit(0.1))
                        ).cast("float"),
                    ),
                )
            tiles.append(tile)
        out = tiles[0]
        for tile in tiles[1:]:
            out = out.unionByName(tile)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"tiled {name} x{TILES}")
    print(f"sf1 tier at {out_dir}")


def _time(sf_dir: str, cpus: str, out_path: str | None) -> None:
    from iotgp_func_raw_data_ingest_spark.config import EngineConfig
    from iotgp_func_raw_data_ingest_spark.plans import QUERIES
    from iotgp_func_raw_data_ingest_spark.session import get_spark

    cfg = EngineConfig(shuffle_partitions=int(cpus))
    spark = get_spark("scaling-cores", config=cfg, master=f"local[{cpus}]")

    def run(name: str) -> None:
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    out: dict[str, float] = {}
    for name in QUERIES_TO_TIME:
        run(name)  # warm: codegen/JIT
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            run(name)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}s", file=sys.stderr)
    payload = {"cpus": int(cpus), "sf_dir": sf_dir, "queries": out}
    line = json.dumps(payload)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


def _report(big_path: str, small_path: str) -> None:
    big = json.load(open(big_path))
    small = json.load(open(small_path))
    print(f"| query | t({big['cpus']}c) | t({small['cpus']}c) | ratio |")
    print("|---|---|---|---|")
    ratios = []
    for name, tb in big["queries"].items():
        ts = small["queries"].get(name)
        if ts is None or tb <= 0:
            continue
        r = ts / tb
        ratios.append(r)
        print(f"| {name} | {tb:.2f}s | {ts:.2f}s | {r:.2f}x |")
    if ratios:
        import math

        g = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
        print(f"\ngeomean low-core/high-core time ratio: {g:.2f}x")


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    cmd = sys.argv[1]
    if cmd == "gen":
        _gen(sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT)
    elif cmd == "time":
        _time(sys.argv[2], sys.argv[3],
              sys.argv[4] if len(sys.argv) > 4 else None)
    elif cmd == "report":
        _report(sys.argv[2], sys.argv[3])
    else:
        print(__doc__, file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
