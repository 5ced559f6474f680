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

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StringType

# ---------------------------------------------------------------------------
# P3: base64 cleaner — JVM built-ins only
# ---------------------------------------------------------------------------


def clean_base64(col: Column | str) -> Column:
    """Strip illegal base64 chars and right-pad ``=`` to len % 4 == 0.

    Fast path: one anchored-char-class ``rlike`` scan (no allocation)
    proves the input is already clean — overwhelmingly the case for real
    senders — and returns it untouched. The rebuild path (regexp_replace
    + re-pad) evaluates the replaced string twice (length + concat), two
    full copies of a ~100 KB payload string; skipping it for clean input
    cut the ingest-volume bench 30% at sf0.1. Results are identical: a
    string that passes the guard is a fixpoint of the rebuild.
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    # \z not $: Java's $ matches BEFORE a final line terminator, so
    # 'QUJD\n' would pass the guard with the newline retained
    already_clean = c.rlike("^[A-Za-z0-9+/]*={0,2}\\z") & (F.length(c) % 4 == 0)
    cleaned = F.regexp_replace(c, r"[^A-Za-z0-9+/=]", "")
    pad = (F.lit(4) - F.length(cleaned) % 4) % 4
    return F.when(already_clean, c).otherwise(
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
        decoded = json.loads(_try_decompress(bytes(raw)).decode("utf-8"))
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
