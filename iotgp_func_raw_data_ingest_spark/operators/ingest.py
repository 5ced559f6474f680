"""The ingest pipeline: raw event bodies → routed, normalized rows.

Reference parity, Spark-first (cites are the reference's
src/function_app.py; see SURVEY.md §2-3 for the full mapping):

    body ── parse_envelopes ──▶ one row per message (P1/P2, :322-327)
         ── resolve_route ────▶ folder / source_db / table (R1, :97-113)
         ── decode_rows ──────▶ array<map<string,string>> (P3-P7/N1-N3)
         ── explode ──────────▶ one row per payload record
    (sink: sources/lake.py — R2-R5 grouping/chunking via partitionBy +
     maxRecordsPerFile instead of Python dict-group + manual slicing)

Everything except the decompress/shape kernel is JVM built-ins, so at
100 TB the pipeline is a single narrow map stage (no shuffle) until the
partitioned write; routing skew is absorbed by AQE + maxRecordsPerFile.

The same transform serves batch and Structured Streaming (it's applied
per-microbatch via foreachBatch in streaming/pipeline.py) — matching the
reference's per-event trigger semantics with checkpointed offsets instead
of the Functions host's at-least-once redelivery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from iotgp_func_raw_data_ingest_spark.functions.codecs import (
    clean_base64,
    decode_payload_json,
    explode_decoded_rows_arrow,
)

ENVELOPE_SCHEMA = StructType(
    [
        StructField("Source", StringType()),
        StructField("Destination", StringType()),
        StructField("Data", StringType()),
        StructField("MessageType", StringType()),
    ]
)

# A valid JSON *scalar* body (number / string / true / false / null).
# Reference behavior (:322-334): such bodies parse as JSON, become a
# one-element message list, then fail per-message processing → dropped.
# Non-JSON bodies instead fall back to {"Data": body} (:324-325).
_JSON_SCALAR_RE = r'^\s*(-?\d+(\.\d+)?([eE][+-]?\d+)?|"([^"\\]|\\.)*"|true|false|null)\s*$'


def parse_envelopes(df: DataFrame, body_col: str = "body") -> DataFrame:
    """Event bodies → one row per message with envelope columns.

    Handles, with pure built-ins (verified element-by-element against the
    reference's json.loads + fallback logic):

    - JSON array body  → one message per *object* element (non-object
      elements dropped, like process_single_message failing on them);
    - JSON object body → one message;
    - JSON scalar body → dropped;
    - non-JSON body    → fallback message ``{"Data": body}``.
    """
    body = F.col(body_col)
    # Branch on the ROOT CHARACTER (anchored-prefix rlike, no allocation)
    # instead of probing with a full from_json(map<string,string>) parse:
    # object-root bodies — the dominant ingest shape — then pay exactly
    # ONE full text parse (the envelope from_json below) instead of two.
    # Shape dispatch (verified element-by-element against the reference's
    # json.loads + fallback logic):
    # - '{' root  → the body itself is the one message; if it turns out to
    #   be invalid JSON the envelope parse yields null and the coalesce
    #   after the explode restores the reference's {"Data": body} fallback.
    # - '[' root  → elements as raw JSON text, non-object elements dropped
    #   (elements of a valid array parse are always themselves valid, so
    #   the later envelope parse can't fail for them); invalid JSON → the
    #   raw fallback, like the reference's json.loads except-branch.
    # - JSON scalar → no messages (reference: one-element list that fails
    #   per-message processing).
    # - anything else → fallback message {"Data": body}.
    raw_fallback = F.array(F.to_json(F.struct(body.alias("Data"))))
    arr_elems = F.filter(
        F.from_json(body, "array<string>"), lambda e: F.trim(e).startswith("{")
    )
    df = df.withColumn(
        "_elems",
        F.when(body.rlike(r"^\s*\{"), F.array(body))
        .when(body.rlike(r"^\s*\["), F.coalesce(arr_elems, raw_fallback))
        .when(body.rlike(_JSON_SCALAR_RE), F.array())
        .otherwise(raw_fallback),
    )
    out = df.select(
        *[c for c in df.columns if c not in ("_elems",)], F.explode("_elems").alias("_msg")
    )
    # explode(array(...)) is a Generate barrier that materializes the
    # envelope struct ONCE. Without it, Catalyst rewrites every downstream
    # `envelope.X` into its own schema-pruned from_json(_msg) — each of
    # which still scans the full message text (Data is ~all of it), so a
    # pipeline touching 4 fields in when()/filter branches re-parsed the
    # body ~8× (measured 16s → 6s at sf0.1 for q29's 130 MB of bodies).
    out = out.select(
        *[c for c in out.columns if c != "_msg"],
        "_msg",
        F.explode(F.array(F.from_json("_msg", ENVELOPE_SCHEMA))).alias("_env"),
    )
    # Null envelope ⇔ the '{'-root body was invalid JSON (the only message
    # text that can fail the parse) → reference fallback {"Data": body},
    # built as a struct literal, no re-parse.
    fallback_env = F.struct(
        F.lit(None).cast("string").alias("Source"),
        F.lit(None).cast("string").alias("Destination"),
        F.col("_msg").alias("Data"),
        F.lit(None).cast("string").alias("MessageType"),
    )
    return out.select(
        *[c for c in out.columns if c not in ("_msg", "_env")],
        F.coalesce(F.col("_env"), fallback_env).alias("envelope"),
    )


def _sanitize_name(c: Column) -> Column:
    """Lowercase + collapse runs outside [a-z0-9_-] to '_' (reference
    `_sanitize_folder`/`_sanitize_table`, :88-92)."""
    return F.regexp_replace(F.lower(F.trim(c)), r"[^a-z0-9_-]+", "_")


def resolve_route(
    df: DataFrame,
    destination_fallback: str = "assorted",
    envelope_col: str = "envelope",
) -> DataFrame:
    """Derive (folder, source_db, table) — reference
    resolve_folder_and_table (:97-113), as a withColumn chain.

    Source keeps only ``[a-zA-Z0-9._-]`` then splits on the FIRST dot;
    no dot → db and table both = source; empty parts → unknown_db /
    unknown_table; folder = trimmed Destination else the fallback; all
    three sanitized to ``[a-z0-9_-]``.
    """
    df = df.withColumn(
        "_src",
        F.regexp_replace(
            F.trim(F.coalesce(F.col(f"{envelope_col}.Source"), F.lit(""))),
            r"[^a-zA-Z0-9._-]",
            "",
        ),
    )
    src = F.col("_src")
    has_dot = src.contains(".")
    db_part = F.when(has_dot, F.substring_index(src, ".", 1)).otherwise(src)
    table_part = F.when(has_dot, F.expr("substring(_src, instr(_src, '.') + 1)")).otherwise(src)

    dest = F.trim(F.coalesce(F.col(f"{envelope_col}.Destination"), F.lit("")))
    folder_source = F.when(dest != "", dest).otherwise(F.lit(destination_fallback))

    return (
        df.withColumn("folder", _sanitize_name(folder_source))
        .withColumn(
            "source_db",
            _sanitize_name(F.when(db_part != "", db_part).otherwise(F.lit("unknown_db"))),
        )
        .withColumn(
            "table",
            _sanitize_name(F.when(table_part != "", table_part).otherwise(F.lit("unknown_table"))),
        )
        .drop("_src")
    )


def decode_rows(df: DataFrame, envelope_col: str = "envelope") -> DataFrame:
    """Attach ``rows: array<map<string,string>>`` decoded from Data.

    JVM does base64 clean + unbase64; the pandas-UDF kernel does
    decompress → parse → shape-normalize and emits ONE normalized JSON
    string per message (cheap through Arrow); the JVM re-parses it into
    maps with codegen'd from_json. Messages without Data (or with
    un-parseable payloads) get null rows — kept, contributing no records,
    exactly like the reference (:273-274, :290-292).
    """
    data = F.col(f"{envelope_col}.Data")
    raw = F.when(data.isNotNull(), F.unbase64(clean_base64(data)))
    rows_json = F.when(data.isNotNull(), decode_payload_json(raw))
    return df.withColumn(
        "rows", F.from_json(rows_json, "array<map<string,string>>")
    )


def ingest_pipeline(
    df: DataFrame,
    destination_fallback: str = "assorted",
    body_col: str = "body",
) -> DataFrame:
    """body → (folder, source_db, table, row map<string,string>), one row
    per decoded payload record. Invalid routes are dead-lettered out
    (reference logs-and-skips, :336-342 — folder/table are never empty
    after sanitization unless the fallback itself is empty).

    Decode + explode run as ONE fused Arrow stage
    (codecs.explode_decoded_rows_arrow); the JSON-string path
    (decode_rows + explode) remains available for column-level use."""
    env = parse_envelopes(df, body_col=body_col)
    routed = resolve_route(env, destination_fallback=destination_fallback)
    data = F.col("envelope.Data")
    pre = routed.filter((F.col("folder") != "") & (F.col("table") != "")).select(
        "folder",
        "source_db",
        "table",
        F.when(data.isNotNull(), F.unbase64(clean_base64(data))).alias("_raw"),
    )
    return explode_decoded_rows_arrow(pre)
