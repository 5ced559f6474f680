"""Ingest-surface queries in the correctness gate: the SQL-expressible
parts of the decode/route pipeline, verified against DuckDB.

These run the REAL ingest operators (functions.codecs.clean_base64,
operators.ingest.resolve_route / ingest_pipeline) over deterministic
inputs synthesized from the `documents` table, with the oracle rebuilding
the expected result in ANSI SQL. The deflate/zlib decompress cascade has
no DuckDB equivalent and is covered by golden pytest cases instead
(tests/test_ingest.py, FIXTURES.md §B.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.functions.codecs import clean_base64
from iotgp_func_raw_data_ingest_spark.operators.ingest import (
    ingest_pipeline,
    resolve_route,
)
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q26_base64_clean_roundtrip",
    oracle="""
    WITH d AS (
        SELECT doc_id, text,
               ' %' || base64(encode(text)) || chr(10) || '==' AS dirty
        FROM documents WHERE doc_id <= 100
    ), c AS (
        SELECT doc_id, text,
               regexp_replace(dirty, '[^A-Za-z0-9+/=]', '', 'g') AS cl
        FROM d
    ), p AS (
        SELECT doc_id, text,
               cl || repeat('=', (4 - length(cl) % 4) % 4) AS cleaned
        FROM c
    )
    SELECT doc_id,
           length(cleaned) AS b64_len,
           (decode(from_base64(regexp_replace(cleaned, '=+$',
               repeat('=', (4 - length(regexp_replace(cleaned, '=+$', '', 'g')) % 4) % 4), 'g')))
             = text) AS roundtrip_ok
    FROM p
    """,
)
def q26_base64_clean_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4 parity: dirty base64 (whitespace, '%', stray '=' padding) →
    clean_base64 → unbase64 → original text.

    The cleaner is pure JVM built-ins (regexp_replace + pad); the oracle
    reimplements the same normalization in DuckDB SQL.
    """
    t = prep(spark, sf_dir)
    docs = t["documents"].filter(F.col("doc_id") <= 100)
    dirty = F.concat(
        F.lit(" %"), F.base64(F.col("text").cast("binary")), F.lit("\n"), F.lit("==")
    )
    cleaned = clean_base64(dirty)
    # the injected trailing '==' makes len%4 == 2 cases re-pad; strip-then-
    # re-pad both sides identically before decoding
    stripped = F.regexp_replace(cleaned, "=+$", "")
    repad = F.concat(
        stripped, F.repeat(F.lit("="), ((F.lit(4) - F.length(stripped) % 4) % 4).cast("int"))
    )
    return docs.select(
        "doc_id",
        F.length(cleaned).cast("long").alias("b64_len"),
        (F.unbase64(repad).cast("string") == F.col("text")).alias("roundtrip_ok"),
    )


@register(
    "q27_route_resolution",
    oracle="""
    WITH env AS (
        SELECT doc_id,
               'IoT ' || source || '.Doc-' || CAST(doc_id % 5 AS VARCHAR) || '!' AS src_raw,
               CASE WHEN doc_id % 3 = 0 THEN '' ELSE 'Folder ' || source END AS dest_raw
        FROM documents WHERE doc_id <= 200
    ), kept AS (
        SELECT doc_id,
               regexp_replace(trim(src_raw), '[^a-zA-Z0-9._-]', '', 'g') AS src,
               trim(dest_raw) AS dest
        FROM env
    ), parts AS (
        SELECT doc_id,
               CASE WHEN strpos(src, '.') > 0 THEN substr(src, 1, strpos(src, '.') - 1) ELSE src END AS db_part,
               CASE WHEN strpos(src, '.') > 0 THEN substr(src, strpos(src, '.') + 1) ELSE src END AS table_part,
               CASE WHEN dest <> '' THEN dest ELSE 'assorted' END AS folder_src
        FROM kept
    )
    SELECT doc_id,
           regexp_replace(lower(trim(folder_src)), '[^a-z0-9_-]+', '_', 'g') AS folder,
           regexp_replace(lower(trim(CASE WHEN db_part <> '' THEN db_part ELSE 'unknown_db' END)), '[^a-z0-9_-]+', '_', 'g') AS source_db,
           regexp_replace(lower(trim(CASE WHEN table_part <> '' THEN table_part ELSE 'unknown_table' END)), '[^a-z0-9_-]+', '_', 'g') AS "table"
    FROM parts
    """,
)
def q27_route_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 parity: the real resolve_route operator over dirty Source /
    Destination strings (illegal chars, empty Destination → fallback,
    first-dot split), oracle-rebuilt in SQL."""
    t = prep(spark, sf_dir)
    env = t["documents"].filter(F.col("doc_id") <= 200).select(
        "doc_id",
        F.struct(
            F.concat(
                F.lit("IoT "), F.col("source"), F.lit(".Doc-"),
                (F.col("doc_id") % 5).cast("string"), F.lit("!"),
            ).alias("Source"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("")).otherwise(
                F.concat(F.lit("Folder "), F.col("source"))
            ).alias("Destination"),
            F.lit(None).cast("string").alias("Data"),
            F.lit("Raw").alias("MessageType"),
        ).alias("envelope"),
    )
    return resolve_route(env).select("doc_id", "folder", "source_db", "table")


@register(
    "q29_ingest_volume",
    oracle="""
    SELECT 'assorted' AS folder, 'vol' AS source_db, 'li' AS "table",
           count(*) AS n_rows
    FROM lineitem
    """,
)
def q29_ingest_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-kernel throughput under the correctness gate: every lineitem
    row rides through the FULL ingest path — rows batched ~1000/message
    into JSON array payloads, base64'd, enveloped, then parse → decode →
    route → explode. Output: routed row count per route (must equal the
    table's cardinality). This is the bench's ingest headline."""
    t = prep(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_linenumber", "l_quantity")
    msgs = li.groupBy((F.col("l_orderkey") % 1000).alias("bucket")).agg(
        F.collect_list(
            F.struct("l_orderkey", "l_linenumber", "l_quantity")
        ).alias("payload_rows")
    )
    bodies = msgs.select(
        F.to_json(
            F.struct(
                F.lit("vol.li").alias("Source"),
                F.base64(F.to_json(F.col("payload_rows")).cast("binary")).alias("Data"),
                F.lit("Raw").alias("MessageType"),
            )
        ).alias("body")
    )
    # AQE coalesces the 1000-message shuffle to a handful of partitions —
    # correct for shuffle volume, wrong before an expensive decode stage:
    # the Python kernel + envelope parse would run ~6-wide on 32 cores.
    # Spread the (few, large) bodies across the full parallelism first.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    routed = ingest_pipeline(bodies.repartition(n_part))
    return routed.groupBy("folder", "source_db", "table").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


@register(
    "q28_ingest_pipeline_e2e",
    oracle="""
    SELECT 'assorted'              AS folder,
           'docs'                  AS source_db,
           lang                    AS "table",
           CAST(doc_id AS VARCHAR) AS id,
           lang                    AS doc_lang,
           CAST(n_chars AS VARCHAR) AS chars
    FROM documents WHERE doc_id <= 100
    """,
)
def q28_ingest_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ingest pipeline end-to-end inside the correctness gate:
    documents → synthesized envelope bodies (JSON + base64 payload) →
    parse → decode → route → exploded row maps. The oracle states the
    expected routed rows directly."""
    t = prep(spark, sf_dir)
    bodies = t["documents"].filter(F.col("doc_id") <= 100).select(
        F.to_json(
            F.struct(
                F.concat(F.lit("Docs."), F.col("lang")).alias("Source"),
                F.base64(
                    F.to_json(
                        F.struct(
                            F.col("doc_id").alias("id"),
                            F.col("lang").alias("doc_lang"),
                            F.col("n_chars").alias("chars"),
                        )
                    ).cast("binary")
                ).alias("Data"),
                F.lit("Raw").alias("MessageType"),
            )
        ).alias("body")
    )
    routed = ingest_pipeline(bodies)
    return routed.select(
        "folder",
        "source_db",
        "table",
        F.col("row").getItem("id").alias("id"),
        F.col("row").getItem("doc_lang").alias("doc_lang"),
        F.col("row").getItem("chars").alias("chars"),
    )
