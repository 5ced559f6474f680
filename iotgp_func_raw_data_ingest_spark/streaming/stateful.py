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


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n_new = sum(len(pdf) for pdf in pdfs)
    if state.exists:
        (seen,) = state.get
        state.update((seen + n_new,))
        return iter(())  # key already emitted once
    state.update((n_new,))
    state.setTimeoutDuration(24 * 3600 * 1000)
    return iter([pd.DataFrame({"key": [key[0]], "first_seen_count": [n_new]})])


def streaming_dedup(stream: DataFrame, key_col: str = "key") -> DataFrame:
    """Emit each key once (its first micro-batch), with the count of rows
    that arrived in that batch; later duplicates are absorbed into state."""
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
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
