"""transformWithStateInPandas — Spark 4's arbitrary-state API.

Successor to ``applyInPandasWithState`` (``streaming/stateful.py``):
a ``StatefulProcessor`` object with named, schema'd state variables
(value/list/map), timers, TTLs, and initial-state bootstrap. Requires
the RocksDB state store provider AND the ``protobuf`` package in the
worker Python (the state-server protocol) — absent protobuf, use the
``applyInPandasWithState`` twin, which has no extra dependency. Both
surfaces ship so either API style works.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)


class UserTotalsProcessor(StatefulProcessor):
    """Running per-user totals — the transformWithState twin of
    ``stateful.running_user_totals`` (same integer-cents exactness)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_events BIGINT, total_value_cents BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, cents = self._totals.get() if self._totals.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value_cents": [cents]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas
    (update mode, processing-time; needs the RocksDB provider)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
