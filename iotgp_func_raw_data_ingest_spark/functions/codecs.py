"""Decode kernel: base64 cleaning (JVM built-ins) + the one genuinely
Python stage — decompress cascade → JSON parse → shape-normalize.

Reference parity (cited file is the reference's src/function_app.py):

- ``clean_base64``      ← clean_base64, :118-127 — strip chars outside
  ``[A-Za-z0-9+/=]`` and re-pad ``=`` to a multiple of 4. Pure
  ``regexp_replace``/``repeat`` built-ins → whole-stage codegen.
- ``decode_payload_rows`` ← try_decompress :129-144, payload parse
  :281-292, shape detect `_is_columnar_dict` :149-159, normalize
  `_normalize_columnar` :161-175 / `_flatten_decoded_rows` :193-198 /
  `_rows_to_columnar` :200-220. Spark has no deflate/zlib column function
  and ``from_json`` cannot express "dynamic keys + JSON-stringify nested
  values + columnar-dict explode", so this one stage is an Arrow-batched
  pandas UDF over the base64-decoded binary. Everything before (clean,
  unbase64) and after (explode, group, write) is JVM-side.

Scale: the UDF is per-row Python but Arrow-batched; it appears once in
the plan, streams batch-at-a-time (no driver collect), and its output is
immediately exploded so Spark's columnar pipeline takes over.

Known hazard (reference parity, src/function_app.py:129-144): raw
deflate has no header or checksum, so a PLAIN payload can occasionally
be a syntactically valid deflate stream — the cascade then "decompresses"
it to garbage and the message dead-letters (hypothesis found live
examples, tests/test_codec_properties.py). The reference has the
identical failure mode; senders are expected to actually compress or
send plain JSON that (like virtually all real JSON) isn't valid deflate.
"""

from __future__ import annotations

import gzip
import json
import zlib

try:  # optional fast path: orjson parses bytes 2-5x faster than stdlib.
    # On orjson failure we RETRY with stdlib before giving up: orjson is
    # stricter than the reference's json.loads (it rejects NaN/Infinity
    # literals), and the dead-letter boundary must match the reference's
    # acceptance set exactly. Accepted payloads produce identical Python
    # dicts/lists either way, so normalization and hashes are unaffected.
    import orjson as _fastjson

    def _json_loads(raw: bytes):
        try:
            return _fastjson.loads(raw)
        except Exception:
            return json.loads(raw.decode("utf-8"))

except ImportError:  # pragma: no cover - exercised when orjson is absent
    def _json_loads(raw: bytes):
        return json.loads(raw.decode("utf-8"))

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StringType

# ---------------------------------------------------------------------------
# P3: base64 cleaner — JVM built-ins only
# ---------------------------------------------------------------------------


def clean_base64(col: Column | str) -> Column:
    """Strip illegal base64 chars and right-pad ``=`` to len % 4 == 0.

    Fast path: strip whitespace with ``translate`` (a tight char-map pass,
    no regex, one allocation), then one anchored-char-class ``rlike`` scan
    proves the result is clean. Real-world dirt is overwhelmingly
    whitespace — MIME/chunked base64 encoders (including Spark's own
    ``base64`` in chunked mode) insert CRLF every 76 chars — and the
    regex rebuild it avoids costs ~70× more (measured 9.6s vs 0.14s over
    130 MB of 100 KB payloads at sf0.1: java.util.regex replace runs
    ~27 MB/s AND the when() branch structure blocks subexpression
    elimination, so it evaluated twice).

    Exactness: if the whitespace-stripped string passes the guard, the
    original contained only legal chars + whitespace with valid padding,
    so the full rebuild (strip illegals, pad to %4) would produce exactly
    the stripped string — the fast path is a true fixpoint, golden-tested
    against the rebuild in tests/test_ingest.py.

    \\z not $ in the guard: Java's $ matches BEFORE a final line
    terminator, so 'QUJD\\n' would otherwise pass with the newline kept.
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    ws = F.translate(c, " \t\r\n", "")
    ws_clean = ws.rlike("^[A-Za-z0-9+/]*={0,2}\\z") & (F.length(ws) % 4 == 0)
    cleaned = F.regexp_replace(c, r"[^A-Za-z0-9+/=]", "")
    pad = (F.lit(4) - F.length(cleaned) % 4) % 4
    return F.when(ws_clean, ws).otherwise(
        F.concat(cleaned, F.repeat(F.lit("="), pad.cast("int")))
    )


# ---------------------------------------------------------------------------
# P5-P7 / N1-N3: decompress → parse → shape-normalize (Python kernel)
# ---------------------------------------------------------------------------


def _try_decompress(data: bytes) -> bytes:
    """gzip → raw-deflate → zlib-with-header → passthrough; first success
    wins (same order as the reference, cheapest-likely first)."""
    for method in (
        lambda: gzip.decompress(data),
        lambda: zlib.decompress(data, -15),
        lambda: zlib.decompress(data),
    ):
        try:
            return method()
        except Exception:
            continue
    return data


def _norm_cell(v) -> str | None:
    """Stringly-typed cell normalization: dict/list → JSON text, None kept,
    everything else → ``str(v)`` (bools → 'True'/'False', like Python)."""
    if v is None:
        return None
    if isinstance(v, (dict, list)):
        return json.dumps(v, ensure_ascii=False)
    return str(v)


def _is_columnar_dict(obj) -> bool:
    """Dict whose values are all lists of one length (zero-length columns
    tolerated — the reference's ``0 not in lengths`` carve-out)."""
    if not isinstance(obj, dict) or not obj:
        return False
    lengths = set()
    for v in obj.values():
        if not isinstance(v, list):
            return False
        lengths.add(len(v))
        if len(lengths) > 1 and 0 not in lengths:
            return False
    return True


def _columnar_to_rows(col_dict: dict) -> list[dict]:
    """Columnar dict → row maps. Row count = longest column; ragged
    (zero-length-tolerated) columns pad with None. Divergence note: the
    reference keeps ragged columns as-is in its single-row LIST<STRING>
    layout; row-per-record parquet needs rectangular data."""
    n = max((len(v) for v in col_dict.values()), default=0)
    keys = list(col_dict.keys())
    return [
        {k: _norm_cell(col_dict[k][i]) if i < len(col_dict[k]) else None for k in keys}
        for i in range(n)
    ]


def _rows_to_maps(decoded) -> list[dict]:
    """Row-list / single-dict shapes → row maps (non-dict rows dropped)."""
    if isinstance(decoded, list):
        rows = [r for r in decoded if isinstance(r, dict)]
    elif isinstance(decoded, dict):
        rows = [decoded]
    else:
        return []
    return [{k: _norm_cell(v) for k, v in r.items()} for r in rows]


def decode_one(raw: bytes | None) -> list[dict] | None:
    """Full per-message kernel: decompress → utf-8 → json → shape →
    normalized row maps. None (not []) when the payload isn't JSON, so the
    caller can tell 'no payload' from 'payload with zero rows'."""
    if raw is None:
        return None
    try:
        decoded = _json_loads(_try_decompress(bytes(raw)))
    except Exception:
        return None
    if isinstance(decoded, dict) and _is_columnar_dict(decoded):
        return _columnar_to_rows(decoded)
    return _rows_to_maps(decoded)


_ROWS_TYPE = ArrayType(MapType(StringType(), StringType()))


@F.pandas_udf(_ROWS_TYPE)
def _decode_payload_rows_udf(raw: pd.Series) -> pd.Series:
    return raw.map(decode_one)


# The kernel IS deterministic; the nondeterministic flag only tells
# Catalyst not to duplicate or re-order the call. Without it,
# InferFiltersFromGenerate clones the whole decode expression into an
# inferred `size(rows) > 0` filter below the projection and the kernel
# runs TWICE per message (measured 2× wall time at sf0.1).
_decode_payload_rows_udf = _decode_payload_rows_udf.asNondeterministic()


def decode_payload_rows(col: Column | str) -> Column:
    """Binary payload column → ``array<map<string,string>>`` of row maps.

    NOTE: returning nested list<map> through Arrow is ~15× slower than the
    JSON-string path below (Arrow conversion of Python dicts dominates —
    measured 20s vs 1.3s kernel time for 600k rows at sf0.1). Kept for
    API completeness and tests; the pipeline uses decode_payload_json.
    """
    c = F.col(col) if isinstance(col, str) else col
    return _decode_payload_rows_udf(c)


def _decode_one_json(raw: bytes | None) -> str | None:
    rows = decode_one(raw)
    return None if rows is None else json.dumps(rows, ensure_ascii=False)


@F.pandas_udf(StringType())
def _decode_payload_json_udf(raw: pd.Series) -> pd.Series:
    return raw.map(_decode_one_json)


_decode_payload_json_udf = _decode_payload_json_udf.asNondeterministic()  # see above


def decode_payload_json(col: Column | str) -> Column:
    """Binary payload → ONE JSON string of normalized row objects (all
    values already stringified/null by the kernel). Crossing the
    Arrow boundary as a plain string and re-parsing JVM-side with
    ``from_json(array<map<string,string>>)`` keeps the Python stage cheap
    — the Arrow transfer of one string per message costs ~nothing, and
    the JVM parse is codegen'd and parallel."""
    c = F.col(col) if isinstance(col, str) else col
    return _decode_payload_json_udf(c)


def explode_decoded_rows_arrow(df: "DataFrame", raw_col: str = "_raw", row_col: str = "row"):
    """Fused decode+explode: DataFrame(..., raw binary LAST) → one output
    row per decoded payload record, passthrough columns repeated, plus a
    ``row: map<string,string>`` column.

    One mapInArrow stage replaces pandas-UDF → json.dumps → Arrow string →
    JVM from_json → Generate(explode): the kernel writes the exploded
    MapArray directly (flat key/value arrays + offsets — no per-row Python
    dict→Arrow conversion), and passthrough columns are repeated with a
    zero-copy ``take``. Cuts the second full JSON text pass from the
    ingest hot path (q29: 10.5s → see bench). Messages with null /
    undecodable / empty payloads contribute no rows, exactly like
    ``explode(rows)`` on the JSON path (reference :273-274, :290-292).

    Scale: still a single narrow Arrow-batched map stage — no shuffle, no
    driver involvement; batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    import pyarrow as pa
    from pyspark.sql.types import MapType, StructField, StructType

    fields = [f for f in df.schema.fields if f.name != raw_col]
    if df.schema.fieldNames()[-1] != raw_col:
        raise ValueError(f"{raw_col} must be the last column")
    names = [f.name for f in fields] + [row_col]
    out_schema = StructType(
        fields + [StructField(row_col, MapType(StringType(), StringType()))]
    )

    def _batches(it):
        for rb in it:
            raws = rb.column(rb.num_columns - 1).to_pylist()
            take: list[int] = []
            offsets: list[int] = [0]
            keys: list[str] = []
            vals: list[str | None] = []
            for i, raw in enumerate(raws):
                rows = decode_one(raw) if raw is not None else None
                if not rows:
                    continue
                for r in rows:
                    for k, v in r.items():
                        keys.append(k)
                        vals.append(v)
                    offsets.append(len(keys))
                    take.append(i)
            idx = pa.array(take, type=pa.int64())
            row_arr = pa.MapArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(keys, type=pa.string()),
                pa.array(vals, type=pa.string()),
            )
            cols = [rb.column(j).take(idx) for j in range(rb.num_columns - 1)]
            yield pa.RecordBatch.from_arrays(cols + [row_arr], names=names)

    return df.mapInArrow(_batches, schema=out_schema)
