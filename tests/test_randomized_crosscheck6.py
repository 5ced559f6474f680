"""Randomized cross-check for merge_lake_table: random target/source
tables and random clause combinations replayed against a pure-Python
merge that shares no code with the operator. Catches clause-precedence,
carry, and schema-alignment bugs the handwritten fixtures might miss."""

from __future__ import annotations

import random

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    merge_lake_table,
    read_lake_table,
)


def _py_merge(target, source, del_thresh, upd_thresh, do_insert):
    """Pure-Python replay. target/source: {k: (seg, bal)} where bal may
    be None. Clauses, with ANSI NULL semantics — a condition evaluating
    to NULL (None operand) is NOT satisfied, and NULL propagates through
    the update arithmetic:
    WHEN MATCHED AND t.bal < del_thresh THEN DELETE;
    WHEN MATCHED AND s.bal > upd_thresh THEN UPDATE SET seg = s.seg,
        bal = s.bal + t.bal;
    WHEN NOT MATCHED THEN INSERT (if do_insert)."""
    out = {}
    for k, (seg, bal) in target.items():
        if k in source:
            s_seg, s_bal = source[k]
            if del_thresh is not None and bal is not None and bal < del_thresh:
                continue  # deleted — tested before update, ANSI order
            if upd_thresh is None or (s_bal is not None and s_bal > upd_thresh):
                new_bal = (
                    None if s_bal is None or bal is None
                    else round(s_bal + bal, 6)
                )
                out[k] = (s_seg, new_bal)
            else:
                out[k] = (seg, bal)
        else:
            out[k] = (seg, bal)
    if do_insert:
        for k, (seg, bal) in source.items():
            if k not in target:
                out[k] = (seg, bal)
    return out


def test_merge_matches_python_replay_random(spark, tmp_path):
    rng = random.Random(801)
    segs = ["A", "B", "C"]
    def _bal(rng):
        # ~1 in 4 NULL: NULL clause conditions must read as not-satisfied
        # and NULL must propagate through the update arithmetic — the
        # regression class where a NULL keep-predicate silently deleted
        return None if rng.random() < 0.25 else round(rng.uniform(-10, 10), 2)

    for trial in range(6):
        target = {
            k: (rng.choice(segs), _bal(rng))
            for k in rng.sample(range(40), rng.randint(5, 20))
        }
        source = {
            k: (rng.choice(segs) + "2", _bal(rng))
            for k in rng.sample(range(60), rng.randint(5, 20))
        }
        del_thresh = rng.choice([None, 0.0, 3.0])
        upd_thresh = rng.choice([None, -5.0, 0.0])
        do_insert = rng.choice([True, False])

        lake = str(tmp_path / f"lake{trial}")
        cfg = EngineConfig(output_path=lake)
        spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in target.items()],
            "k long, seg string, bal double",
        ).write.parquet(f"{lake}/curated/rc/t")
        src_df = spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in source.items()],
            "k long, seg string, bal double",
        )
        merge_lake_table(
            spark, lake, "curated", "rc", "t", src_df, ["k"], cfg,
            matched_update={"seg": "s.seg", "bal": "s.bal + t.bal"},
            matched_update_condition=(
                None if upd_thresh is None else f"s.bal > {upd_thresh}"
            ),
            matched_delete_condition=(
                None if del_thresh is None else f"t.bal < {del_thresh}"
            ),
            insert_when_not_matched=do_insert,
        )
        got = {
            r["k"]: (r["seg"], None if r["bal"] is None else round(r["bal"], 6))
            for r in read_lake_table(spark, lake, "curated", "rc", "t").collect()
        }
        want = _py_merge(target, source, del_thresh, upd_thresh, do_insert)
        assert got == want, (
            trial, del_thresh, upd_thresh, do_insert,
            {k: (got.get(k), want.get(k)) for k in set(got) ^ set(want)
             | {k for k in set(got) & set(want) if got[k] != want[k]}},
        )
