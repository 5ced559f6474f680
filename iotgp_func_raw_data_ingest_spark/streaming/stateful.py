"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no user-managed state (offsets live in the Functions
host — SURVEY.md §2.6); these are the streaming-native capabilities a
Spark engine adds on top:

- **streaming exact dedup** over a key with TTL state (the streaming twin
  of operators/dedup.exact_dedup_groups): emit a row the first time a key
  is seen, remember it until the state times out.
- **running per-key counters** that survive across micro-batches.

State is per-key, pruned by processing-time timeout — bounded memory at
any corpus size.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("first_seen_count", LongType()),
    ]
)
DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _make_dedup_fn(ttl_ms: int | None):
    def _dedup_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n_new = sum(len(pdf) for pdf in pdfs)
        if state.exists:
            (seen,) = state.get
            state.update((seen + n_new,))
            return iter(())  # key already emitted once
        state.update((n_new,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        return iter([pd.DataFrame({"key": [key[0]], "first_seen_count": [n_new]})])

    return _dedup_fn


def streaming_dedup(
    stream: DataFrame, key_col: str = "key", ttl_ms: int | None = 24 * 3600 * 1000
) -> DataFrame:
    """Emit each key once (its first micro-batch), with the count of rows
    that arrived in that batch; later duplicates are absorbed into state.

    ``ttl_ms`` bounds state per key on a CONTINUOUS stream (default 24h).
    Pass ``ttl_ms=None`` for bounded replays driven by
    ``trigger(availableNow=True)``: with ProcessingTimeTimeout armed, the
    engine keeps scheduling no-data micro-batches to evaluate pending
    timers and an availableNow query NEVER terminates (measured — the
    q178 gate stream looped hundreds of empty batches until its sink
    tasks died); with NoTimeout it drains the input and stops. A bounded
    replay tears its state down with the query, so the TTL buys nothing
    there anyway."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _make_dedup_fn(ttl_ms),
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


COUNTER_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("total", LongType()),
        StructField("batches", LongType()),
    ]
)
COUNTER_STATE_SCHEMA = StructType(
    [StructField("total", LongType()), StructField("batches", LongType())]
)


def _counter_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n = sum(len(pdf) for pdf in pdfs)
    total, batches = state.get if state.exists else (0, 0)
    total, batches = total + n, batches + 1
    state.update((total, batches))
    return iter([pd.DataFrame({"key": [key[0]], "total": [total], "batches": [batches]})])


def running_counters(stream: DataFrame, key_col: str = "key") -> DataFrame:
    """Per-key running totals across micro-batches (update mode)."""
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _counter_fn,
            outputStructType=COUNTER_OUTPUT_SCHEMA,
            stateStructType=COUNTER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
