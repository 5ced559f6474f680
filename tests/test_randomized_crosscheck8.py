"""Randomized replay cross-check for the generation ledger's derived
surfaces: a random sequence of REAL lake mutations (pruned merges,
keyed deletes, published appends, a compaction) runs against a
snapshot-enabled route while a pure-Python dict model replays the same
intent. After every generation the model state is snapshotted; the
checks then pin:

- the IVM view (refreshed at random points and at the end) equals the
  model's aggregate EXACTLY (integer-cent decimals, no float slack);
- ``read_changes_between`` over random generation spans equals the
  model-state set difference — including spans that cross the
  compaction, whose whole-route rewrite must contribute ZERO net
  changes (every carried row cancels);
- time travel: a random pinned generation re-reads exactly the model
  state it had.
"""

from __future__ import annotations

import random
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources import ivm
from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    compact_lake_table,
    merge_lake_table_pruned,
)
from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
    delete_keys_from_table,
)

SCHEMA = "k bigint, seg string, val decimal(12,2)"
SEGS = ["a", "b", "c", "d"]


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, seg, Decimal(cents) / 100) for k, seg, cents in rows], SCHEMA
    )


def _model_agg(model):
    out: dict[str, tuple[int, int]] = {}
    for seg, cents in model.values():
        n, s = out.get(seg, (0, 0))
        out[seg] = (n + 1, s + cents)
    return {seg: (n, Decimal(s) / 100) for seg, (n, s) in out.items()}


def _model_rows(model):
    return {(k, seg, cents) for k, (seg, cents) in model.items()}


@pytest.mark.parametrize("seed", [0xC0FFEE, 20260816])
def test_randomized_feed_and_ivm_crosscheck(spark, tmp_path, seed):
    rng = random.Random(seed)
    lake = str(tmp_path / "lake")
    route = f"{lake}/curated/crm/accounts"
    cfg = EngineConfig(output_path=lake)

    model: dict[int, tuple[str, int]] = {
        k: (rng.choice(SEGS), rng.randrange(0, 100_000)) for k in range(300)
    }
    next_key = 1000
    _df(
        spark, [(k, seg, cents) for k, (seg, cents) in model.items()]
    ).repartitionByRange(4, "k").write.parquet(route)
    assert snap.enable_snapshots(spark, route) == 1

    states = {1: dict(model)}
    compact_gen = None
    view = str(tmp_path / "view")

    def refresh_and_check():
        ivm.refresh_view_from_changes(spark, route, view, ["seg"], ["val"])
        got = {
            r["seg"]: (r["n_rows"], r["sum_val"])
            for r in ivm.read_view(spark, view).collect()
        }
        assert got == _model_agg(model)

    refresh_and_check()  # initial build at generation 1

    for step in range(6):
        op = rng.choice(["merge", "delete", "append", "compact"])
        keys = list(model)
        if op == "merge" and keys:
            upd = rng.sample(keys, min(20, len(keys)))
            rest = [k for k in keys if k not in set(upd)]
            dels = rng.sample(rest, min(10, len(rest)))
            ins = []
            for _ in range(rng.randrange(1, 8)):
                ins.append(
                    (next_key, rng.choice(SEGS), rng.randrange(0, 100_000))
                )
                next_key += 1
            src_rows = []
            for k in upd:
                seg, _ = model[k]
                cents = rng.randrange(0, 100_000)
                src_rows.append((k, seg, cents, "u"))
                model[k] = (seg, cents)
            for k in dels:
                seg, cents = model.pop(k)
                src_rows.append((k, seg, cents, "d"))
            for k, seg, cents in ins:
                src_rows.append((k, seg, cents, "i"))
                model[k] = (seg, cents)
            src = spark.createDataFrame(
                [
                    (k, seg, Decimal(c) / 100, o)
                    for k, seg, c, o in src_rows
                ],
                SCHEMA + ", op string",
            )
            merge_lake_table_pruned(
                spark, lake, "curated", "crm", "accounts", src, ["k"], cfg,
                matched_update={"seg": "s.seg", "val": "s.val"},
                matched_update_condition="s.op = 'u'",
                matched_delete_condition="s.op = 'd'",
            )
        elif op == "delete" and keys:
            dels = rng.sample(keys, min(15, len(keys)))
            for k in dels:
                model.pop(k)
            delete_keys_from_table(
                spark, route, "k",
                spark.createDataFrame([(k,) for k in dels], "k bigint"),
            )
        elif op == "append":
            rows = []
            for _ in range(rng.randrange(3, 12)):
                rows.append(
                    (next_key, rng.choice(SEGS), rng.randrange(0, 100_000))
                )
                model[next_key] = rows[-1][1:]
                next_key += 1
            import os

            before = {
                f for f in os.listdir(route) if f.startswith("part-")
            }
            _df(spark, rows).coalesce(1).write.mode("append").parquet(route)
            added = sorted(
                f
                for f in os.listdir(route)
                if f.startswith("part-") and f not in before
            )
            snap.publish_generation(spark, route, kind="append", add=added)
        else:  # compact — whole-route swap, content identical
            compact_lake_table(
                spark, lake, "curated", "crm", "accounts", cfg
            )
            compact_gen = len(states) + 1
        states[len(states) + 1] = dict(model)
        if rng.random() < 0.5:
            refresh_and_check()

    refresh_and_check()  # final refresh covers any tail of generations
    gens = snap.list_generations(spark, route)
    assert gens == sorted(states)

    # feed over random spans == model-state set difference
    spans = [tuple(sorted(rng.sample(gens, 2))) for _ in range(4)]
    if compact_gen and compact_gen > 1:
        spans.append((compact_gen - 1, compact_gen))  # must be empty
    for a, b in spans:
        feed = snap.read_changes_between(spark, route, a, b)
        got_ins, got_del = set(), set()
        for r in feed.collect():
            row = (r["k"], r["seg"], int(r["val"] * 100))
            (got_ins if r["_change_type"] == "insert" else got_del).add(row)
        ra, rb = _model_rows(states[a]), _model_rows(states[b])
        assert got_ins == rb - ra, f"span {a}->{b} inserts"
        assert got_del == ra - rb, f"span {a}->{b} deletes"

    # time travel: a random pinned generation re-reads its model state
    g = rng.choice(gens)
    pinned = {
        (r["k"], r["seg"], int(r["val"] * 100))
        for r in snap.read_route_snapshot(spark, route, generation=g).collect()
    }
    assert pinned == _model_rows(states[g])
