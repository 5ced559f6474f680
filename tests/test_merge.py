"""ANSI MERGE semantics over the lake (sources/lake.py merge_lake_table):
clause application, clause precedence, cardinality enforcement, and the
schema-alignment rules for inserts. The q228 gate checks the census; these
pin the row-level contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    merge_lake_table,
    read_lake_table,
)

ROUTE = ("curated", "crm", "people")


def _seed(spark, tmp_path, rows):
    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(rows, "k long, seg string, bal double")
    df.write.parquet(f"{lake}/curated/crm/people")
    return lake, EngineConfig(output_path=lake)


def _read(spark, lake):
    return {
        r["k"]: (r["seg"], r["bal"])
        for r in read_lake_table(spark, lake, *ROUTE).collect()
    }


def test_merge_update_insert_delete_clauses(spark, tmp_path):
    lake, cfg = _seed(
        spark, tmp_path,
        [(1, "A", 10.0), (2, "B", -5.0), (3, "C", 7.0), (4, "D", 1.0)],
    )
    src = spark.createDataFrame(
        # 1 → matched update, 2 → matched but bal<0 → DELETE wins,
        # 9 → not matched → insert; 3/4 untouched → carried
        [(1, "A2", 100.0), (2, "B2", 200.0), (9, "NEW", 50.0)],
        "k long, seg string, bal double",
    )
    before, after = merge_lake_table(
        spark, lake, *ROUTE, src, ["k"], cfg,
        matched_update={"seg": "s.seg", "bal": "s.bal"},
        matched_delete_condition="t.bal < 0",
    )
    assert (before, after) == (4, 4)
    got = _read(spark, lake)
    assert got == {
        1: ("A2", 100.0),   # updated from source
        3: ("C", 7.0),      # carried
        4: ("D", 1.0),      # carried
        9: ("NEW", 50.0),   # inserted
    }


def test_merge_delete_precedes_update(spark, tmp_path):
    """A matched row satisfying BOTH conditions is deleted, not updated
    (clauses are tested in delete-then-update order, as declared)."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", -1.0)])
    src = spark.createDataFrame([(1, "A2", 5.0)], "k long, seg string, bal double")
    merge_lake_table(
        spark, lake, *ROUTE, src, ["k"], cfg,
        matched_update={"bal": "s.bal"},
        matched_update_condition="s.bal > 0",
        matched_delete_condition="t.bal < 0",
    )
    assert _read(spark, lake) == {}


def test_merge_update_condition_gates_update(spark, tmp_path):
    """Matched rows failing the update condition are carried unchanged."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 10.0), (2, "B", 3.0)])
    src = spark.createDataFrame(
        [(1, "x", 100.0), (2, "x", 200.0)], "k long, seg string, bal double"
    )
    merge_lake_table(
        spark, lake, *ROUTE, src, ["k"], cfg,
        matched_update={"bal": "s.bal"},
        matched_update_condition="t.bal > 5",
    )
    assert _read(spark, lake) == {1: ("A", 100.0), 2: ("B", 3.0)}


def test_merge_no_insert_when_disabled(spark, tmp_path):
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0)])
    src = spark.createDataFrame([(9, "N", 9.0)], "k long, seg string, bal double")
    merge_lake_table(
        spark, lake, *ROUTE, src, ["k"], cfg, insert_when_not_matched=False
    )
    assert _read(spark, lake) == {1: ("A", 1.0)}


def test_merge_insert_aligns_to_target_schema(spark, tmp_path):
    """Inserted rows take the TARGET schema: source-only columns are
    dropped, target columns absent from the source become NULL."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0)])
    src = spark.createDataFrame(
        [(9, "extra", "N")], "k long, junk string, seg string"
    )  # no bal column, extra junk column
    merge_lake_table(spark, lake, *ROUTE, src, ["k"], cfg)
    out = read_lake_table(spark, lake, *ROUTE)
    assert set(out.columns) == {"k", "seg", "bal"}
    got = _read(spark, lake)
    assert got[9] == ("N", None)
    assert got[1] == ("A", 1.0)


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    """ANSI cardinality rule: >1 source row per key MATCHING a target
    row raises instead of picking an arbitrary winner (contrast
    upsert_lake_table)."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0)])
    src = spark.createDataFrame(
        [(1, "x", 2.0), (1, "y", 3.0)], "k long, seg string, bal double"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_lake_table(spark, lake, *ROUTE, src, ["k"], cfg)


def test_merge_duplicate_unmatched_source_keys_insert(spark, tmp_path):
    """ANSI (r8 verdict item): duplicate source keys that match NO
    target row are legitimate — each NOT-MATCHED row inserts, exactly
    like Delta/Iceberg merges. The pre-r9 check was stricter than ANSI
    and raised here."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0)])
    src = spark.createDataFrame(
        # key 9 duplicated but unmatched → two inserts; key 1 matched once
        [(9, "x", 2.0), (9, "y", 3.0), (1, "u", 4.0)],
        "k long, seg string, bal double",
    )
    before, after = merge_lake_table(
        spark, lake, *ROUTE, src, ["k"], cfg,
        matched_update={"bal": "s.bal"},
    )
    assert (before, after) == (1, 3)
    rows = sorted(
        (r["k"], r["seg"], r["bal"])
        for r in read_lake_table(spark, lake, *ROUTE).collect()
    )
    assert rows == [(1, "A", 4.0), (9, "x", 2.0), (9, "y", 3.0)]


def test_merge_duplicate_keys_mixed_matched_raises(spark, tmp_path):
    """A key duplicated in the source AND present in the target raises
    even when OTHER duplicate keys are unmatched — the semi-join probe
    must test every duplicate key, not a sample of the dup set."""
    lake, cfg = _seed(spark, tmp_path, [(5, "A", 1.0)])
    src = spark.createDataFrame(
        [(9, "x", 2.0), (9, "y", 3.0), (5, "u", 4.0), (5, "v", 6.0)],
        "k long, seg string, bal double",
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_lake_table(spark, lake, *ROUTE, src, ["k"], cfg)


def test_merge_pins_nondeterministic_source(spark, tmp_path):
    """r8 ADVICE: the source runs through two actions (cardinality probe,
    then the merge join) — unpinned, a non-deterministic source could
    pass the probe yet present duplicate matching keys to the join,
    silently multi-matching a target row. The eager localCheckpoint pin
    guarantees both actions see the SAME rows: whatever the rand keys
    land on, a target-domain key can never appear twice afterwards."""
    for attempt in range(3):
        lake, cfg = _seed(
            spark, tmp_path / f"a{attempt}", [(k, "T", 1.0) for k in range(10)]
        )
        src = spark.range(10).select(
            F.floor(F.rand() * 40).cast("long").alias("k"),  # unseeded
            F.lit("S").alias("seg"),
            F.lit(2.0).alias("bal"),
        )
        try:
            merge_lake_table(
                spark, lake, *ROUTE, src, ["k"], cfg,
                matched_update={"bal": "s.bal"},
            )
        except ValueError:
            continue  # dup key matched the target — legitimate raise
        counts = (
            read_lake_table(spark, lake, *ROUTE)
            .filter(F.col("k") < 10)
            .groupBy("k")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert counts == 0, "a target key was multi-matched"


def test_merge_requires_existing_target_and_valid_args(spark, tmp_path):
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(output_path=lake)
    src = spark.createDataFrame([(1, "x", 2.0)], "k long, seg string, bal double")
    with pytest.raises(FileNotFoundError, match="does not exist"):
        merge_lake_table(spark, lake, *ROUTE, src, ["k"], cfg)
    lake2, cfg2 = _seed(spark, tmp_path, [(1, "A", 1.0)])
    with pytest.raises(ValueError, match="key columns"):
        merge_lake_table(
            spark, lake2, *ROUTE, src.drop("k"), ["k"], cfg2
        )
    with pytest.raises(ValueError, match="unknown target columns"):
        merge_lake_table(
            spark, lake2, *ROUTE, src, ["k"], cfg2,
            matched_update={"nope": "s.bal"},
        )
    with pytest.raises(ValueError, match="key columns"):
        merge_lake_table(
            spark, lake2, *ROUTE, src, ["k"], cfg2,
            matched_update={"k": "s.k"},
        )


def test_merge_sidecar_row_count_updated(spark, tmp_path):
    """The _meta.json sidecar swaps in WITH the merged data (the upsert/
    compaction crash-safety contract) and carries the new row count."""
    from iotgp_func_raw_data_ingest_spark.sources.lake import read_route_meta

    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0), (2, "B", 2.0)])
    src = spark.createDataFrame([(9, "N", 9.0)], "k long, seg string, bal double")
    merge_lake_table(
        spark, lake, *ROUTE, src, ["k"], cfg, meta_extra={"merge_batch": 7}
    )
    meta = read_route_meta(spark, f"{lake}/curated/crm/people")
    assert meta["row_count"] == 3
    assert meta["merge_batch"] == 7


def test_merge_rejects_reserved_marker_columns(spark, tmp_path):
    """The presence markers drive every clause decision — a user column
    by the same name must raise, not silently corrupt the merge."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0)])
    src = spark.createDataFrame(
        [(1, "x", 2.0, True)],
        "k long, seg string, bal double, _merge_s_present boolean",
    )
    with pytest.raises(ValueError, match="reserved"):
        merge_lake_table(spark, lake, *ROUTE, src, ["k"], cfg)


def test_merge_rejects_dead_update_condition(spark, tmp_path):
    """An update condition without a SET map would silently do nothing —
    reject it at the call site."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0)])
    src = spark.createDataFrame([(1, "x", 2.0)], "k long, seg string, bal double")
    with pytest.raises(ValueError, match="no effect"):
        merge_lake_table(
            spark, lake, *ROUTE, src, ["k"], cfg,
            matched_update_condition="s.bal > 0",
        )


def test_merge_preserves_target_schema_types(spark, tmp_path):
    """A source with narrower column types (int key, float bal) must not
    drift the rewritten route's schema — output types are the target's."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0)])
    src = spark.createDataFrame(
        [(9, "N", 9.0)], "k int, seg string, bal float"
    )
    merge_lake_table(spark, lake, *ROUTE, src, ["k"], cfg)
    out = read_lake_table(spark, lake, *ROUTE)
    assert dict(out.dtypes) == {"k": "bigint", "seg": "string", "bal": "double"}
    assert _read(spark, lake) == {1: ("A", 1.0), 9: ("N", 9.0)}


def test_merge_null_condition_means_not_satisfied(spark, tmp_path):
    """ANSI: a clause condition evaluating to NULL is NOT satisfied — a
    matched row whose delete-condition column is NULL must be carried
    (or updated), never silently deleted by NULL-filter semantics."""
    lake = str(tmp_path / "lake")
    spark.createDataFrame(
        [(1, "A", None), (2, "B", -3.0)], "k long, seg string, bal double"
    ).write.parquet(f"{lake}/curated/crm/people")
    cfg = EngineConfig(output_path=lake)
    src = spark.createDataFrame(
        [(1, "A2", 5.0), (2, "B2", 6.0)], "k long, seg string, bal double"
    )
    merge_lake_table(
        spark, lake, *ROUTE, src, ["k"], cfg,
        matched_update={"seg": "s.seg"},
        matched_update_condition="t.bal > 0",   # NULL for k=1 → carried
        matched_delete_condition="t.bal < 0",   # NULL for k=1 → no delete
    )
    got = _read(spark, lake)
    # k=1: NULL bal → neither clause fires → carried verbatim
    # k=2: bal<0 → deleted
    assert got == {1: ("A", None)}


def test_merge_null_source_keys_insert_not_cardinality_error(spark, tmp_path):
    """NULL source keys never match any target row (join semantics), so
    several of them are NOT a cardinality violation — each inserts as
    its own unmatched row."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0)])
    src = spark.createDataFrame(
        [(None, "N1", 2.0), (None, "N2", 3.0)], "k long, seg string, bal double"
    )
    before, after = merge_lake_table(spark, lake, *ROUTE, src, ["k"], cfg)
    assert (before, after) == (1, 3)
    rows = read_lake_table(spark, lake, *ROUTE).collect()
    assert {r["seg"] for r in rows} == {"A", "N1", "N2"}
    assert sum(1 for r in rows if r["k"] is None) == 2


def test_merge_recovers_crash_windows(spark, tmp_path):
    """merge_lake_table shares the two-rename swap machinery with
    compaction/upsert: a stranded .compact-old with no live route (crash
    between the two renames) and stale .compact-tmp/.compact-old
    leftovers alongside a live route must both be healed by the next
    merge — no rows lost, none duplicated."""
    import os

    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0), (2, "B", 2.0)])
    route = f"{lake}/curated/crm/people"
    # window (a): rename-out done, rename-in pending → only .compact-old
    os.rename(route, f"{route}.compact-old")
    src = spark.createDataFrame([(9, "N", 9.0)], "k long, seg string, bal double")
    before, after = merge_lake_table(spark, lake, *ROUTE, src, ["k"], cfg)
    assert (before, after) == (2, 3)
    assert _read(spark, lake) == {1: ("A", 1.0), 2: ("B", 2.0), 9: ("N", 9.0)}
    # window (b): stale tmp + old alongside the live route
    os.makedirs(f"{route}.compact-tmp")
    with open(f"{route}.compact-tmp/part-half.parquet", "w") as f:
        f.write("junk")
    os.makedirs(f"{route}.compact-old")
    with open(f"{route}.compact-old/part-stale.parquet", "w") as f:
        f.write("junk")
    src2 = spark.createDataFrame([(1, "A2", 5.0)], "k long, seg string, bal double")
    merge_lake_table(
        spark, lake, *ROUTE, src2, ["k"], cfg,
        matched_update={"seg": "s.seg", "bal": "s.bal"},
    )
    assert _read(spark, lake) == {1: ("A2", 5.0), 2: ("B", 2.0), 9: ("N", 9.0)}
    assert not os.path.exists(f"{route}.compact-tmp")
    assert not os.path.exists(f"{route}.compact-old")


def test_merge_evolve_schema_unions_source_columns(spark, tmp_path):
    """evolve_schema=True: source-only columns join the rewritten schema
    — NULL for carried/deleted-into-carried target rows, the source
    value on insert, and settable from matched_update like any target
    column. Default-off behavior (drop) is pinned by
    test_merge_insert_aligns_to_target_schema."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0), (2, "B", 2.0)])
    src = spark.createDataFrame(
        [(1, "A2", 10.0, "eu"), (9, "N", 9.0, "us")],
        "k long, seg string, bal double, region string",
    )
    before, after = merge_lake_table(
        spark, lake, *ROUTE, src, ["k"], cfg,
        matched_update={"bal": "s.bal", "region": "s.region"},
        evolve_schema=True,
    )
    assert (before, after) == (2, 3)
    out = read_lake_table(spark, lake, *ROUTE)
    assert out.columns == ["k", "seg", "bal", "region"]
    rows = {r["k"]: (r["seg"], r["bal"], r["region"]) for r in out.collect()}
    assert rows == {
        1: ("A", 10.0, "eu"),   # matched update sets the evolved column
        2: ("B", 2.0, None),    # carried row is NULL-padded
        9: ("N", 9.0, "us"),    # insert takes the source value
    }


def test_merge_evolved_column_null_without_update(spark, tmp_path):
    """An evolved column NOT named in matched_update stays NULL on
    matched rows — evolution changes the schema, never silently the
    matched rows' values."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0)])
    src = spark.createDataFrame(
        [(1, "x", 5.0, "eu"), (9, "N", 9.0, "us")],
        "k long, seg string, bal double, region string",
    )
    merge_lake_table(
        spark, lake, *ROUTE, src, ["k"], cfg,
        matched_update={"bal": "s.bal"},
        evolve_schema=True,
    )
    rows = {
        r["k"]: (r["bal"], r["region"])
        for r in read_lake_table(spark, lake, *ROUTE).collect()
    }
    assert rows == {1: (5.0, None), 9: (9.0, "us")}


def test_merge_update_of_unknown_column_still_rejected(spark, tmp_path):
    """Without evolve_schema, a matched_update naming a source-only
    column is a caller error, exactly as before the flag existed."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0)])
    src = spark.createDataFrame(
        [(1, "x", 5.0, "eu")], "k long, seg string, bal double, region string"
    )
    with pytest.raises(ValueError, match="unknown target columns"):
        merge_lake_table(
            spark, lake, *ROUTE, src, ["k"], cfg,
            matched_update={"region": "s.region"},
        )


def test_merge_not_matched_condition_gates_insert(spark, tmp_path):
    """WHEN NOT MATCHED AND <condition> THEN INSERT: unmatched source
    rows failing — or NULLing (ANSI: NULL means not satisfied) — the
    condition are dropped, never inserted; matched rows are unaffected
    by the insert condition."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 10.0)])
    src = spark.createDataFrame(
        # 1 matched → update regardless of insert condition;
        # 8 unmatched, op='u' → inserts; 9 unmatched, op='d' (a CDC
        # tombstone for an absent key) → dropped; 10 unmatched, op NULL
        # → condition is NULL → dropped
        [(1, "A2", 1.0, "u"), (8, "N", 8.0, "u"), (9, "X", 9.0, "d"),
         (10, "Y", 2.0, None)],
        "k long, seg string, bal double, op string",
    )
    before, after = merge_lake_table(
        spark, lake, *ROUTE, src, ["k"], cfg,
        matched_update={"seg": "s.seg", "bal": "s.bal"},
        not_matched_condition="s.op <> 'd'",
    )
    assert (before, after) == (1, 2)
    assert _read(spark, lake) == {1: ("A2", 1.0), 8: ("N", 8.0)}


def test_merge_not_matched_condition_requires_insert(spark, tmp_path):
    """A not_matched_condition with the insert clause disabled can never
    fire — reject it as a caller error instead of silently ignoring."""
    lake, cfg = _seed(spark, tmp_path, [(1, "A", 1.0)])
    src = spark.createDataFrame([(9, "N", 9.0)], "k long, seg string, bal double")
    with pytest.raises(ValueError, match="no effect"):
        merge_lake_table(
            spark, lake, *ROUTE, src, ["k"], cfg,
            insert_when_not_matched=False,
            not_matched_condition="s.bal > 0",
        )
