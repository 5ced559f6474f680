"""Randomized cross-checks for the round-6 extension-surface tranche:
the chunking UDTF, the recursive-CTE walk, and the Python data sources
are each replayed against independent pure-Python references (plain
str slicing / dict walks / pyarrow), sharing no code with the
operators."""

from __future__ import annotations

import random
import string

import pyarrow as pa
import pyarrow.parquet as pq


def _py_chunks(text: str, size: int, stride: int) -> list[tuple[int, str, int]]:
    out = []
    if text is None or size <= 0:
        return out
    step = stride if stride > 0 else size
    for i, start in enumerate(range(0, len(text), step)):
        piece = text[start : start + size]
        if not piece:
            break
        out.append((i, piece, len(piece)))
        if start + size >= len(text):
            break
    return out


def test_chunk_udtf_matches_pure_python(spark):
    from iotgp_func_raw_data_ingest_spark.operators.udtfs import register_udtfs

    register_udtfs(spark)
    rng = random.Random(41)
    cases = []
    for _ in range(25):
        n = rng.randrange(0, 300)
        text = "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))
        size = rng.randrange(1, 80)
        stride = rng.randrange(1, 80)
        cases.append((text, size, stride))
    for text, size, stride in cases:
        got = [
            (r.chunk_id, r.chunk_text, r.chunk_len)
            for r in spark.sql(
                "SELECT * FROM chunk_text(?, ?, ?) ORDER BY chunk_id",
                args=[text, size, stride],
            ).collect()
        ]
        assert got == _py_chunks(text, size, stride), (text, size, stride)


def test_recursive_cte_matches_pure_python_walk(spark):
    for seed in (3, 11):
        rng = random.Random(seed)
        n = rng.randrange(200, 800)
        b = rng.choice([2, 7, 10])
        # pure-python: depth of k in the parent(k) = k // b forest
        depth = {}
        for k in range(n):
            d, cur = 0, k
            while cur >= b:
                cur //= b
                d += 1
            depth[k] = d
        expected = {}
        for k, d in depth.items():
            expected[d] = expected.get(d, 0) + 1

        spark.range(n).createOrReplaceTempView("xc_keys")
        rows = spark.sql(
            f"""
            WITH RECURSIVE walk AS (
                SELECT id AS k, 0 AS depth FROM xc_keys WHERE id < {b}
                UNION ALL
                SELECT s.id, w.depth + 1
                FROM xc_keys s JOIN walk w ON w.k = s.id DIV {b}
                WHERE s.id >= {b}
            )
            SELECT depth, COUNT(*) AS n FROM walk GROUP BY depth
            """
        ).collect()
        assert {r.depth: r.n for r in rows} == expected, (n, b)


def test_python_datasource_random_layouts_match_pyarrow(spark, tmp_path):
    from iotgp_func_raw_data_ingest_spark.sources.pydatasource import (
        register_python_datasources,
    )

    register_python_datasources(spark)
    rng = random.Random(59)
    for case in range(3):
        n = rng.randrange(50, 400)
        rg = rng.randrange(7, 120)
        vals = [rng.randrange(-(10**6), 10**6) for _ in range(n)]
        path = str(tmp_path / f"xc{case}.parquet")
        pq.write_table(
            pa.table({"v": vals, "tag": [f"t{i%5}" for i in range(n)]}),
            path,
            row_group_size=rg,
        )
        got = sorted(
            (r.v, r.tag)
            for r in spark.read.format("parquet_rowgroups")
            .option("path", path)
            .load()
            .collect()
        )
        assert got == sorted((v, f"t{i%5}") for i, v in enumerate(vals)), (n, rg)

        # streaming replay with a batch size misaligned to the row groups
        out, ckpt = str(tmp_path / f"out{case}"), str(tmp_path / f"ckpt{case}")
        q = (
            spark.readStream.format("parquet_replay_stream")
            .option("path", path)
            .option("rows_per_batch", str(rng.randrange(5, 90)))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        streamed = sorted(
            (r.v, r.tag) for r in spark.read.parquet(out).collect()
        )
        assert streamed == got, (n, rg)
