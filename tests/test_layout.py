"""Z-order layout: key correctness + measured data-skipping win.

The pruning test reads real parquet footers (pyarrow) and counts files
whose min/max range overlaps a predicate — the same decision Spark's
scan makes — comparing a Z-ordered write against a single-column sort.
"""

from __future__ import annotations

import glob
import math
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.sources.layout import (
    with_zorder_key,
    zorder,
)
from tests.conftest import SF_SMOKE


def test_zorder_key_is_deterministic_and_bounded(spark):
    df = spark.range(1000).select(
        F.col("id").alias("a"), (999 - F.col("id")).alias("b")
    )
    k1 = [r[0] for r in with_zorder_key(df, ["a", "b"], bits=8).select("_zkey").collect()]
    k2 = [r[0] for r in with_zorder_key(df, ["a", "b"], bits=8).select("_zkey").collect()]
    assert k1 == k2
    assert all(0 <= k < (1 << 16) for k in k1)
    # corners of the value space map to corners of the key space
    keyed = {
        (r["a"], r["b"]): r["_zkey"]
        for r in with_zorder_key(df, ["a", "b"], bits=8).collect()
    }
    assert keyed[(0, 999)] != keyed[(999, 0)]
    # (0 rank, 0 rank) would need a=0,b=0 which doesn't exist here; check
    # monotone corner: max a + max b rank -> all bits set
    df2 = spark.createDataFrame([(0, 0), (255, 255)], ["a", "b"])
    corner = {
        (r["a"], r["b"]): r["_zkey"] for r in with_zorder_key(df2, ["a", "b"], bits=8).collect()
    }
    assert corner[(0, 0)] == 0
    assert corner[(255, 255)] == (1 << 16) - 1


def test_zorder_rejects_bad_args(spark):
    df = spark.range(10).select(F.col("id").alias("a"))
    with pytest.raises(ValueError):
        with_zorder_key(df, [])
    with pytest.raises(ValueError):
        with_zorder_key(df, ["a"], bits=61)


def _files_overlapping(path: str, col: str, lo: float, hi: float) -> int:
    """Files whose [min,max] for col intersects [lo,hi] — what a
    stats-pruning scan must read."""
    n = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = math.inf, -math.inf
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    fmin = min(fmin, c.statistics.min)
                    fmax = max(fmax, c.statistics.max)
        if fmin <= hi and fmax >= lo:
            n += 1
    return n


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    # 64×64 uniform grid → 16 files. The Z-curve's top 4 bits split each
    # dimension twice, so files must tile the grid 4×4: a band predicate
    # on EITHER dimension overlaps ~4 files, while a single-column sort
    # is perfect on its own column and prunes nothing on the other.
    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    n_files = 16

    z_path = str(tmp_path / "zorder")
    zorder(grid, ["a", "b"], n_files).write.parquet(z_path)

    lin_path = str(tmp_path / "linear")
    grid.repartitionByRange(n_files, "a").sortWithinPartitions(
        "a"
    ).write.parquet(lin_path)

    band = (0, 6)  # ~10% of each dimension's domain

    z_a = _files_overlapping(z_path, "a", *band)
    z_b = _files_overlapping(z_path, "b", *band)
    l_a = _files_overlapping(lin_path, "a", *band)
    l_b = _files_overlapping(lin_path, "b", *band)

    total_z = len(glob.glob(os.path.join(z_path, "*.parquet")))
    total_l = len(glob.glob(os.path.join(lin_path, "*.parquet")))

    # the a-sort cannot prune on b at all
    assert l_b == total_l
    # z-order prunes on BOTH dimensions (~4 of 16 tiles each; allow
    # range-partitioner boundary wobble)
    assert z_a <= 6 < total_z
    assert z_b <= 6 < total_z
    # combined, the z layout beats the single-column layout
    assert z_a + z_b < l_a + l_b


def test_compaction_with_zorder_recluster(spark, tmp_path):
    from iotgp_func_raw_data_ingest_spark.config import EngineConfig
    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        compact_lake_table,
        read_lake_table,
    )

    cfg = EngineConfig(max_batch_size=100)
    lake = str(tmp_path / "lake")
    dest = f"{lake}/f/db/t"
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "user_id", "value")
    )
    n_rows = ev.count()
    ev.write.option("maxRecordsPerFile", 50).parquet(dest)

    before, after = compact_lake_table(
        spark, lake, "f", "db", "t", cfg,
        target_records_per_file=500, zorder_cols=["user_id", "value"],
    )
    assert after < before
    got = read_lake_table(spark, lake, "f", "db", "t")
    assert got.count() == n_rows
    # the rewrite preserved content, not just cardinality
    assert got.agg(F.sum("event_id")).collect()[0][0] == ev.agg(
        F.sum("event_id")
    ).collect()[0][0]


def test_zorder_key_monotone_per_dimension(spark):
    # Morton codes are strictly monotone in each coordinate with the
    # other held fixed — the property that makes range pruning sound.
    df = spark.range(256).select(
        F.col("id").alias("a"), F.lit(7).alias("b")
    ).unionAll(
        spark.range(256).select(F.lit(7).alias("a"), F.col("id").alias("b"))
    )
    # bits=8 with domain 0..255 → rank == value exactly (span 255 maps
    # v -> floor(v/255*255) = v), so monotonicity must be strict
    keyed = with_zorder_key(df, ["a", "b"], bits=8).collect()
    a_keys = [r["_zkey"] for r in sorted(
        (r for r in keyed if r["b"] == 7 and r["a"] != 7), key=lambda r: r["a"]
    )]
    b_keys = [r["_zkey"] for r in sorted(
        (r for r in keyed if r["a"] == 7 and r["b"] != 7), key=lambda r: r["b"]
    )]
    assert all(x < y for x, y in zip(a_keys, a_keys[1:]))
    assert all(x < y for x, y in zip(b_keys, b_keys[1:]))


def test_zorder_constant_column_is_safe(spark, tmp_path):
    # span == 0 (all values equal) must not divide by zero; the constant
    # dimension contributes rank 0 and the other dimension still orders
    df = spark.range(100).select(F.lit(5).alias("a"), F.col("id").alias("b"))
    keyed = with_zorder_key(df, ["a", "b"], bits=8).collect()
    assert len(keyed) == 100
    keys = [r["_zkey"] for r in sorted(keyed, key=lambda r: r["b"])]
    assert keys == sorted(keys)
    # negative values normalize fine too
    df2 = spark.createDataFrame([(-50, 1), (0, 2), (50, 3)], ["a", "b"])
    ranks = {r["a"]: r["_zkey"] for r in with_zorder_key(df2, ["a"], bits=8).collect()}
    assert ranks[-50] < ranks[0] < ranks[50]
