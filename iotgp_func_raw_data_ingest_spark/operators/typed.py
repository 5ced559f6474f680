"""Typed view over the stringly-typed ingest lake (SURVEY.md §7.4).

The reference degrades every cell to string-or-null (parity mode, the
lake's physical truth). For querying, a typed mode infers per-column
types by sampling and applies ``try_cast`` — rows that don't conform
become null in that column instead of failing the query (PERMISSIVE
semantics).

Inference is deliberately conservative and deterministic: a column gets
a type only if EVERY non-null sampled value parses as it, testing in
order long → double → timestamp → boolean, else it stays string. At
scale, run inference on a bounded sample (the default caps scanned rows)
and persist the inferred schema rather than re-deriving per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CANDIDATES = ("long", "double", "timestamp", "boolean")


def infer_column_types(df: DataFrame, sample_rows: int = 10_000) -> dict[str, str]:
    """Map column → inferred type name (string if nothing fits).

    One aggregate pass over a bounded sample: for each column and
    candidate type, count non-null values that fail try_cast; the first
    candidate with zero failures (and at least one parsed value) wins.
    """
    sample = df.limit(sample_rows)
    aggs = []
    for c in df.columns:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNotNull(), 1)).alias(f"{c}__nn"))
        for t in _CANDIDATES:
            bad = F.count(F.when(col.isNotNull() & col.try_cast(t).isNull(), 1))
            aggs.append(bad.alias(f"{c}__{t}__bad"))
    row = sample.agg(*aggs).collect()[0].asDict()
    out: dict[str, str] = {}
    for c in df.columns:
        chosen = "string"
        if row[f"{c}__nn"] > 0:
            for t in _CANDIDATES:
                if row[f"{c}__{t}__bad"] == 0:
                    chosen = t
                    break
        out[c] = chosen
    return out


def typed_view(df: DataFrame, schema: dict[str, str] | None = None) -> DataFrame:
    """Apply try_cast per column; unparseable cells → null (kept rows)."""
    schema = schema or infer_column_types(df)
    return df.select(
        *[
            F.col(c).try_cast(t).alias(c) if t != "string" else F.col(c)
            for c, t in schema.items()
        ]
    )
