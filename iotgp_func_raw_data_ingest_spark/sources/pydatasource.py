"""Custom batch data source via the Spark 4 Python DataSource API.

The reference reads its inputs with hand-rolled pyarrow calls on the
driver (``/root/reference/src/function_app.py:230-260`` — one process,
one file, eager).  Spark's Python DataSource API is the distributed
version of that escape hatch: when a format has no JVM reader (an
in-house telemetry container, a vendor export, an object-store layout
Spark doesn't know), you implement ``DataSource``/``DataSourceReader``
in Python and Spark plans it like any other scan — partition planning
on the driver, per-partition reads on executors, results crossing the
boundary as Arrow record batches.

``ParquetRowGroupDataSource`` demonstrates the full surface against a
format we can verify exactly (parquet, so the driver's DuckDB oracle
can check every row): one ``InputPartition`` per parquet row group,
per-partition ``pyarrow`` reads yielding ``RecordBatch`` (the zero-copy
fast path — never per-row tuples), and column pruning pushed into the
pyarrow scan via the ``columns`` option.

Scale notes (100 TB):

- Parallelism = row groups, the same granularity Spark's native parquet
  scan uses; a 1000-executor cluster saturates as long as the file set
  has ≥ cores row groups.  For multi-file datasets, partitions would be
  (file, row-group) pairs — the planner loop is the only part that
  changes.
- Column pruning happens in ``pyarrow.ParquetFile.iter_batches`` —
  bytes never leave the storage layer for unread columns.  Predicate
  pushdown would ride the same option channel (this demo keeps the
  surface minimal).
- For formats Spark DOES have a JVM reader for, use it — this API pays
  a Python worker per task; its job is formats that would otherwise
  need a driver-side collect-and-parallelize.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

#: arrow type name → Spark DDL type, for schema inference from the file.
_ARROW_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "binary": "binary",
    "large_binary": "binary",
    "date32[day]": "date",
}


def _ddl_for(field: "pa.Field") -> str:
    t = str(field.type)
    if t in _ARROW_TO_DDL:
        return _ARROW_TO_DDL[t]
    if t.startswith("timestamp[us"):
        return "timestamp_ntz" if "tz=" not in t else "timestamp"
    raise ValueError(
        f"parquet_rowgroups: unsupported arrow type {t!r} for column "
        f"{field.name!r} — pass `columns` to select supported ones"
    )


class _RowGroupPartition(InputPartition):
    def __init__(self, index: int):
        self.index = index


class ParquetRowGroupReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options["path"]
        cols = options.get("columns", "")
        self._columns = [c.strip() for c in cols.split(",") if c.strip()] or None

    def partitions(self):  # planned on the driver: one split per row group
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self._path).metadata.num_row_groups
        return [_RowGroupPartition(i) for i in range(n)]

    def read(self, partition: _RowGroupPartition) -> Iterator["pa.RecordBatch"]:
        # Runs on the executor. Yield Arrow batches (never tuples) so the
        # Python→JVM hop is columnar; `columns` prunes the physical read.
        import pyarrow.parquet as pq

        f = pq.ParquetFile(self._path)
        yield from f.iter_batches(
            row_groups=[partition.index], columns=self._columns
        )


class ParquetRowGroupDataSource(DataSource):
    """``spark.read.format("parquet_rowgroups").option("path", p)``.

    Options: ``path`` (required), ``columns`` (optional comma list —
    pruned inside the pyarrow scan).
    """

    @classmethod
    def name(cls) -> str:
        return "parquet_rowgroups"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        schema = pq.ParquetFile(self.options["path"]).schema_arrow
        cols = self.options.get("columns", "")
        names = [c.strip() for c in cols.split(",") if c.strip()] or schema.names
        return ", ".join(
            f"{n} {_ddl_for(schema.field(n))}" for n in names
        )

    def reader(self, schema) -> ParquetRowGroupReader:  # noqa: ANN001
        return ParquetRowGroupReader(dict(self.options))


class _RowRangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class ParquetReplayStreamReader(DataSourceStreamReader):
    """Replay a parquet file as a micro-batch stream, offset = row index.

    The partition-based stream-reader API (not the Simple one): offsets
    are planned on the driver, each ``_RowRangePartition`` is read on an
    executor, and ``trigger(availableNow=True)`` drains the whole file
    in one pass — the probe-measured behavior the gate query relies on
    (the Simple reader's driver-side prefetch admits only one increment
    per availableNow run).

    Row ranges are mapped to parquet row groups before reading, so a
    partition touches only the row groups it overlaps — per-partition
    read cost is O(partition), not O(file).
    """

    def __init__(self, options: dict):
        self._path = options["path"]
        cols = options.get("columns", "")
        self._columns = [c.strip() for c in cols.split(",") if c.strip()] or None
        self._rows_per_batch = int(options.get("rows_per_batch", 10_000))

    def _total_rows(self) -> int:
        import pyarrow.parquet as pq

        return pq.ParquetFile(self._path).metadata.num_rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        return {"row": self._total_rows()}

    def partitions(self, start: dict, end: dict):
        s, e, step = start["row"], end["row"], self._rows_per_batch
        return [
            _RowRangePartition(i, min(i + step, e)) for i in range(s, e, step)
        ] or [_RowRangePartition(s, s)]

    def read(self, partition: _RowRangePartition):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(self._path)
        md = f.metadata
        # row groups overlapping [start, end)
        groups, first_row = [], 0
        base = None
        for g in range(md.num_row_groups):
            n = md.row_group(g).num_rows
            if first_row < partition.end and first_row + n > partition.start:
                if base is None:
                    base = first_row
                groups.append(g)
            first_row += n
        if not groups:
            return iter(())

        table = f.read_row_groups(groups, columns=self._columns)
        lo = partition.start - base
        rows = table.slice(lo, partition.end - partition.start).to_pylist()
        names = table.schema.names
        return iter(tuple(r[n] for n in names) for r in rows)

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass


class ParquetReplayStreamSource(DataSource):
    """``spark.readStream.format("parquet_replay_stream")``.

    Options: ``path`` (required), ``columns`` (optional comma list),
    ``rows_per_batch`` (partition granularity, default 10k rows).

    Deterministic replay source for testing streaming semantics: the
    offset log pins exactly which row ranges each micro-batch consumed,
    so a checkpoint restart provably re-emits nothing (q202's gate).
    """

    @classmethod
    def name(cls) -> str:
        return "parquet_replay_stream"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        schema = pq.ParquetFile(self.options["path"]).schema_arrow
        cols = self.options.get("columns", "")
        names = [c.strip() for c in cols.split(",") if c.strip()] or schema.names
        return ", ".join(f"{n} {_ddl_for(schema.field(n))}" for n in names)

    def streamReader(self, schema) -> ParquetReplayStreamReader:  # noqa: ANN001
        return ParquetReplayStreamReader(dict(self.options))


class _GenerationPartition(InputPartition):
    def __init__(self, row: tuple | None):
        self.row = row


class GenerationLedgerStreamReader(DataSourceStreamReader):
    """Follow a snapshot-enabled route's generation ledger as a stream:
    offset = ``{"generation": N}``, one row per NEWLY COMMITTED
    generation manifest. Because the offset IS the applied-generation
    watermark, Spark's own offset log checkpoints it — a restarted
    stream resumes from exactly the last committed generation, the
    committed-batch-ledger idiom with zero custom state files.

    Generations are consecutive integers by the publish CAS (parent+1
    always), so the ``(start, end]`` offset span enumerates manifests
    directly; a manifest missing from that span means
    ``prune_generations`` dropped it — the reader raises with the
    remedy rather than silently skipping history (the same refusal the
    IVM refresh makes).

    The rows are manifest SUMMARIES (generation, parent, kind, writer,
    created_utc_ms, n_files, row_count) — tiny driver-side metadata,
    exactly what ``publish_generation`` wrote. The row-level change
    feed is deliberately NOT produced here: computing it needs the
    distributed multiset diff (``snapshots.read_changes_between``),
    which ``streaming.pipeline.start_changes_stream`` runs inside
    ``foreachBatch`` where a full SparkSession exists. Manifests are
    read with plain local-filesystem I/O (the planner worker has no
    JVM gateway); for object-store routes, front the ledger with a
    mounted path or extend this seam with fsspec.
    """

    def __init__(self, options: dict):
        route = options["route"]
        for prefix in ("file://", "file:"):
            if route.startswith(prefix):
                route = route[len(prefix):]
                break
        self._route = route.rstrip("/")
        self._start = int(options.get("start_generation", 0))

    def _gen_dir(self) -> str:
        return f"{self._route}/_gen"

    def _latest(self) -> int:
        import os

        d = self._gen_dir()
        if not os.path.isdir(d):
            return self._start
        best = self._start
        for name in os.listdir(d):
            if name.startswith("gen-") and name.endswith(".json"):
                body = name[4:-5]
                if body.isdigit():
                    best = max(best, int(body))
        return best

    def _manifest(self, n: int) -> dict:
        import json
        import os

        path = f"{self._gen_dir()}/gen-{n:012d}.json"
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"generation {n} of {self._route} is missing from the "
                "ledger (pruned by prune_generations?) — the stream "
                "cannot skip history; restart it with start_generation "
                "at or above the oldest kept generation"
            )
        with open(path, "rb") as f:
            return json.loads(f.read().decode("utf-8"))

    def initialOffset(self) -> dict:
        return {"generation": self._start}

    def latestOffset(self) -> dict:
        return {"generation": self._latest()}

    def partitions(self, start: dict, end: dict):
        s, e = start["generation"], end["generation"]
        parts = []
        for n in range(s + 1, e + 1):
            m = self._manifest(n)
            rc = m.get("row_count")
            parts.append(
                _GenerationPartition(
                    (
                        int(m["generation"]),
                        int(m["parent"]) if m.get("parent") else None,
                        str(m.get("kind")),
                        str(m.get("writer")),
                        int(m.get("created_utc_ms", 0)),
                        len(m.get("files", [])),
                        int(rc) if rc is not None else None,
                    )
                )
            )
        return parts or [_GenerationPartition(None)]

    def read(self, partition: _GenerationPartition):
        if partition.row is None:
            return iter(())
        return iter((partition.row,))

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass


class GenerationLedgerStreamSource(DataSource):
    """``spark.readStream.format("generation_ledger_stream")``.

    Options: ``route`` (required — a snapshot-enabled route directory),
    ``start_generation`` (emit generations strictly ABOVE this; default
    0 = the full retained history).

    One row per newly committed generation; schema below. The
    foreachBatch consumers (``start_changes_stream``,
    ``start_ivm_refresh_stream``) turn those commit events into the
    row-level change feed / an exact view refresh."""

    @classmethod
    def name(cls) -> str:
        return "generation_ledger_stream"

    def schema(self) -> str:
        return (
            "generation bigint, parent bigint, kind string, "
            "writer string, created_utc_ms bigint, n_files int, "
            "row_count bigint"
        )

    def streamReader(self, schema) -> GenerationLedgerStreamReader:  # noqa: ANN001
        return GenerationLedgerStreamReader(dict(self.options))


def register_python_datasources(spark) -> None:  # noqa: ANN001
    """Register all Python data sources (idempotent per session)."""
    spark.dataSource.register(ParquetRowGroupDataSource)
    spark.dataSource.register(ParquetReplayStreamSource)
    spark.dataSource.register(GenerationLedgerStreamSource)
