"""Declarative data-quality expectations over a DataFrame — the
constraint-audit pass a training-data pipeline runs before publishing a
snapshot (null rates, value ranges, domain membership, key uniqueness,
referential integrity).

Scale design (the part that matters at 100 TB): every ROW-LEVEL
expectation — not_null / range / in_set / regex / custom predicate —
fuses into ONE aggregation over ONE scan of the table, as conditional
counters with map-side partial aggregation: auditing 40 constraints
costs the same scan as auditing one. The two relational expectations
that genuinely need their own shuffle are isolated: ``unique`` is a
groupBy on the key columns (count>1 groups), ``foreign_key`` is a
left-anti join against the (typically broadcastable) referenced keys.
Nothing collects row-level violations to the driver — the report is one
row PER EXPECTATION, and callers who need offending rows re-filter with
the expectation's own predicate.

Reference parity: the reference engine validates only its own config at
startup (src/function_app.py:33-38 fail-fast on missing env); row-level
data contracts are part of the beyond-reference curation surface,
sibling to sources/maintenance.py validate_lake (which audits lake
STRUCTURE, not row content).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named constraint. ``kind`` is one of: predicate (row-level,
    fused), unique (key groupBy), foreign_key (anti-join)."""

    name: str
    kind: str
    predicate: Column | None = None          # predicate kind: rows must satisfy
    cols: tuple[str, ...] = ()               # unique / foreign_key key columns
    ref: DataFrame | None = field(default=None, compare=False)  # foreign_key target
    ref_cols: tuple[str, ...] = ()           # columns in ref (default: cols)


def expect_not_null(name: str, col: str) -> Expectation:
    return Expectation(name, "predicate", F.col(col).isNotNull())


def expect_between(name: str, col: str, lo, hi) -> Expectation:
    # null fails a range check (it is not known to be in range)
    return Expectation(name, "predicate", F.col(col).between(lo, hi))


def expect_in_set(name: str, col: str, values) -> Expectation:
    return Expectation(name, "predicate", F.col(col).isin(list(values)))


def expect_matches(name: str, col: str, pattern: str) -> Expectation:
    return Expectation(name, "predicate", F.col(col).rlike(pattern))


def expect_predicate(name: str, predicate: Column) -> Expectation:
    """Escape hatch: any boolean column expression (stays JVM-side)."""
    return Expectation(name, "predicate", predicate)


def expect_unique(name: str, cols: list[str]) -> Expectation:
    return Expectation(name, "unique", None, tuple(cols))


def expect_foreign_key(
    name: str, cols: list[str], ref: DataFrame, ref_cols: list[str] | None = None
) -> Expectation:
    return Expectation(
        name, "foreign_key", None, tuple(cols), ref, tuple(ref_cols or cols)
    )


def validate_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> DataFrame:
    """Evaluate every expectation; returns one row per expectation:
    ``(expectation, violations, n_rows, ok)``, in the declared order
    (an ``ord`` column callers may sort by is kept internal).

    Violations counted: predicate — rows where the predicate is not
    TRUE (nulls violate); unique — rows beyond the first per duplicated
    key (a fully-unique table scores 0); foreign_key — rows (null or
    not) whose key has no match in the reference."""
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")

    spark = df.sparkSession
    reports: list[DataFrame] = []
    # one shared total for every report that needs n_rows but does not
    # derive it from its own aggregation — a single extra scan per call,
    # not one per foreign-key expectation
    needs_total = any(e.kind == "foreign_key" for e in expectations)
    totals = (
        # eager checkpoint: crossJoin consumers would otherwise each
        # re-execute the count scan (Catalyst does not dedupe subtrees)
        df.agg(F.count(F.lit(1)).cast("long").alias("n_rows")).localCheckpoint(
            eager=True
        )
        if needs_total
        else None
    )

    preds = [e for e in expectations if e.kind == "predicate"]
    if preds:
        total = F.count(F.lit(1))
        # coalesce: F.sum over ZERO rows is NULL — an empty table must
        # report 0 violations (trivially passing), not a null `ok`
        aggs = [total.alias("__n")] + [
            F.coalesce(
                F.sum(F.when(e.predicate.isNull() | ~e.predicate, 1).otherwise(0)),
                F.lit(0),
            ).alias(f"v{i}")
            for i, e in enumerate(preds)
        ]
        row = df.agg(*aggs)
        # one narrow pivot of the single agg row to (name, violations, n);
        # names ride as literal Columns, never interpolated into SQL text
        kv = []
        for i, e in enumerate(preds):
            kv.append(F.lit(e.name))
            kv.append(F.struct(F.col(f"v{i}").alias("v"), F.col("__n").alias("n")))
        reports.append(
            row.select(
                F.explode(F.create_map(*kv)).alias("expectation", "s")
            ).select(
                "expectation",
                F.col("s.v").cast("long").alias("violations"),
                F.col("s.n").cast("long").alias("n_rows"),
            )
        )

    for e in expectations:
        if e.kind == "predicate":
            continue
        if e.kind == "unique":
            keyed = df.groupBy(*e.cols).agg(F.count(F.lit(1)).alias("c"))
            rep = keyed.agg(
                F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("long").alias(
                    "violations"
                ),
                F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_rows"),
            )
        elif e.kind == "foreign_key":
            refk = e.ref.select(
                *[F.col(rc).alias(c) for c, rc in zip(e.cols, e.ref_cols)]
            ).dropDuplicates(list(e.cols))
            missing = df.join(refk, list(e.cols), "left_anti")
            rep = missing.agg(
                F.count(F.lit(1)).cast("long").alias("violations")
            ).crossJoin(totals)
        else:
            raise ValueError(f"unknown expectation kind: {e.kind}")
        reports.append(rep.select(F.lit(e.name).alias("expectation"), "violations", "n_rows"))

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    order = spark.createDataFrame(
        [(n, i) for i, n in enumerate(names)], "expectation string, ord int"
    )
    return (
        out.join(F.broadcast(order), "expectation")
        .select(
            "expectation",
            "violations",
            "n_rows",
            (F.col("violations") == 0).alias("ok"),
            "ord",
        )
        .orderBy("ord")
        .drop("ord")
    )
