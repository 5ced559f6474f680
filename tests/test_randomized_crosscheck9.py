"""Randomized cross-check for tombstone-retaining CDC apply
(start_cdc_merge_stream with persist_seq=True, retain_tombstones=True):
the SAME random feed generator as crosscheck7 but WITHOUT its fix-up
constraint — crosscheck7 must move every change for a key into a batch
at or before its winning delete's batch (the physical-delete
resurrection window); tombstone mode exists to make that constraint
unnecessary, so here batch assignment is FULLY random, deletes
included, and the final route state (live rows AND tombstone rows) must
still equal a pure-Python latest-change-per-key-by-seq replay that
shares no code with the operator. A final expire_tombstones pass at a
randomly drawn seq horizon is cross-checked the same way."""

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
from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
    expire_tombstones,
)


def _gen_feed(rng: random.Random, n_base: int):
    """(base, changes): base {k: (name, v)}; changes rows
    (k, name, v, op, seq, batch) with unique seqs and FULLY random batch
    assignment — no resurrection fix-up, the property tombstone mode
    buys."""
    base = {k: (f"n{k}", k * 10) for k in range(n_base)}
    changes = []
    seqs = rng.sample(range(1, 10_000), 200)
    si = 0
    keys = (
        [rng.randrange(n_base) for _ in range(30)]
        + [n_base + rng.randrange(20) for _ in range(10)]
        + [5_000 + rng.randrange(10) for _ in range(5)]
    )
    for k in keys:
        for _ in range(rng.randrange(1, 4)):
            op = rng.choice(["u", "u", "c", "d"])
            seq = seqs[si]; si += 1
            changes.append([k, f"v{k}-{seq}", seq * 3, op, seq, rng.randrange(3)])
    return base, changes


def _py_apply(base, changes):
    """Declarative replay under soft deletes: latest change per key by
    seq wins; a winning delete leaves a tombstone (nulled data, its seq,
    deleted=True) whether or not the key ever existed; anything else is
    a live row. Batch assignment is irrelevant BY DESIGN."""
    latest: dict[int, tuple] = {}
    for k, name, v, op, seq, _b in changes:
        if k not in latest or seq > latest[k][3]:
            latest[k] = (name, v, op, seq)
    out = {k: (name, v, None, False) for k, (name, v) in base.items()}
    for k, (name, v, op, seq) in latest.items():
        if op == "d":
            out[k] = (None, None, seq, True)
        else:
            out[k] = (name, v, seq, False)
    return out


def _py_expire(state, horizon):
    return {
        k: row
        for k, row in state.items()
        if not (row[3] and row[2] is not None and row[2] <= horizon)
    }


@pytest.mark.parametrize("seed", [13, 47, 307, 1013])
def test_tombstone_cdc_random_replay_and_expiry(spark, tmp_path, seed):
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
        str(tmp_path / "ckpt"), persist_seq=True, retain_tombstones=True,
    )
    q.awaitTermination(300)

    def route_state():
        out = read_lake_table(spark, lake, "f", "db", "t")
        return {
            r["id"]: (r["name"], r["v"], r["_seq"], bool(r["_deleted"]))
            for r in out.collect()
        }

    expected = _py_apply(base, changes)
    got = route_state()
    assert got == expected, (
        f"seed {seed}: {len(got)} rows vs {len(expected)} expected; "
        f"diff keys: {sorted(set(got) ^ set(expected))[:10]}"
    )

    # expiry at a random horizon drawn from the used seq range
    horizon = rng.choice(sorted(c[4] for c in changes))
    expire_tombstones(spark, f"{lake}/f/db/t", horizon_seq=horizon)
    expected2 = _py_expire(expected, horizon)
    got2 = route_state()
    assert got2 == expected2, (
        f"seed {seed}: expiry at {horizon} diverged; "
        f"diff keys: {sorted(set(got2) ^ set(expected2))[:10]}"
    )
