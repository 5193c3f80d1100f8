"""Custom stateful streaming operator (arbitrary per-key state).

Beyond built-in windowed aggregation: ``applyInPandasWithState``
keeps an explicit per-key state value across micro-batches in the
state store — the general tool for operators Spark's declarative
surface can't express (the reference's closest construct is the
Singer STATE bookmark carried between runs,
`tap_mysql/sync_strategies/common.py:200-206`).

State here is O(distinct keys), Arrow-batched into Python once per
key per micro-batch — the slow path relative to JVM aggregation, but
the only path for imperative per-key logic. Use the built-in
window/session aggregations whenever they can express the semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # per-row integer cents: exact and associative across batches
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value_cents": [cents]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user event count + value total, updated every
    micro-batch. Emits the latest total for each user seen in the
    batch (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
