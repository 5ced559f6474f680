"""Randomized cross-check for the out-of-order CDC apply
(start_cdc_merge_stream with persist_seq=True): a random change feed —
random ops (update/create/delete), random unique seqs, random keys
(present, absent, and re-keyed new) — is split into micro-batches by a
random assignment that IGNORES seq order, then replayed through the
stream and compared against a pure-Python "latest change per key by
seq" replay that shares no code with the operator.

Validity constraint the generator enforces (the operator's documented
physical-delete limitation): for any key whose WINNING change is a
delete, no LATER batch may carry a change for that key — once the row
(and its persisted _seq) is physically gone, a stale non-delete change
is indistinguishable from a first insert and resurrects the row (pinned
separately in test_streaming). Every other pattern — stale updates,
stale tombstones against present rows, inserts then stale updates,
absent-key tombstones — is generated freely and must land on the
declarative expectation regardless of batch order."""

from __future__ import annotations

import json
import os
import random

import pytest

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    read_lake_table,
    upsert_lake_table,
)


def _gen_feed(rng: random.Random, n_base: int):
    """Returns (base, changes). base: {k: (name, v)}. changes: list of
    (k, name, v, op, seq, batch) with unique (k, seq) and unique seq
    overall (simplest determinism), batches 0..2 assigned randomly,
    then fixed up so a winning delete's key never has a later-batch
    change after the delete's batch."""
    base = {k: (f"n{k}", k * 10) for k in range(n_base)}
    changes = []
    seqs = rng.sample(range(1, 10_000), 200)  # 45 key draws × ≤3 changes
    si = 0
    keys = (
        [rng.randrange(n_base) for _ in range(30)]  # present keys
        + [n_base + rng.randrange(20) for _ in range(10)]  # new keys
        + [5_000 + rng.randrange(10) for _ in range(5)]  # never-present
    )
    for k in keys:
        for _ in range(rng.randrange(1, 4)):  # 1-3 changes per key draw
            op = rng.choice(["u", "u", "c", "d"])
            seq = seqs[si]; si += 1
            changes.append(
                [k, f"v{k}-{seq}", seq * 3, op, seq, rng.randrange(3)]
            )
    # fix-up: for each key whose latest-by-seq change is a delete, move
    # every change with a lower seq into a batch <= the delete's batch
    # (resurrection avoidance — the documented limitation)
    by_key: dict[int, list] = {}
    for c in changes:
        by_key.setdefault(c[0], []).append(c)
    for k, cs in by_key.items():
        cs.sort(key=lambda c: c[4])
        winner = cs[-1]
        if winner[3] == "d":
            for c in cs[:-1]:
                c[5] = min(c[5], winner[5])
    return base, changes


def _py_apply(base, changes):
    """Declarative replay: latest change per key by seq wins; latest
    op 'd' removes the key (or no-ops if absent); anything else upserts
    (name, v) and records its seq. Batch assignment is irrelevant BY
    DESIGN — that is the property under test."""
    latest: dict[int, tuple] = {}
    for k, name, v, op, seq, _b in changes:
        if k not in latest or seq > latest[k][3]:
            latest[k] = (name, v, op, seq)
    out = {k: (name, v, None) for k, (name, v) in base.items()}
    for k, (name, v, op, seq) in latest.items():
        if op == "d":
            out.pop(k, None)
        else:
            out[k] = (name, v, seq)
    return out


@pytest.mark.parametrize("seed", [7, 23, 101, 911])
def test_cdc_out_of_order_random_replay(spark, tmp_path, seed):
    from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
        start_cdc_merge_stream,
    )

    rng = random.Random(seed)
    base, changes = _gen_feed(rng, n_base=60)

    cfg = EngineConfig(max_batch_size=10_000)
    lake = str(tmp_path / "lake")
    upsert_lake_table(
        spark, lake, "f", "db", "t",
        spark.createDataFrame(
            [(k, n, v) for k, (n, v) in base.items()], ["id", "name", "v"]
        ),
        ["id"], cfg,
    )

    src = tmp_path / "changes"
    src.mkdir()
    for b in range(3):
        rows = [c for c in changes if c[5] == b]
        p = src / f"b{b}.json"
        p.write_text(
            "\n".join(
                json.dumps(
                    {"id": k, "name": None if op == "d" else n,
                     "v": None if op == "d" else v, "op": op, "seq": seq}
                )
                for k, n, v, op, seq, _ in rows
            )
            + "\n"
        )
        os.utime(p, (1_700_000_000 + b * 10,) * 2)

    stream = (
        spark.readStream.schema("id long, name string, v long, op string, seq long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_cdc_merge_stream(
        stream, lake, "f", "db", "t", ["id"], "seq", cfg,
        str(tmp_path / "ckpt"), persist_seq=True,
    )
    q.awaitTermination(300)

    expected = _py_apply(base, changes)
    out = read_lake_table(spark, lake, "f", "db", "t")
    got = {r["id"]: (r["name"], r["v"], r["_seq"]) for r in out.collect()}
    assert got == expected, (
        f"seed {seed}: {len(got)} rows vs {len(expected)} expected; "
        f"diff keys: {sorted(set(got) ^ set(expected))[:10]}"
    )
