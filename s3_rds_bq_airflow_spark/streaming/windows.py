"""Event-time windowed aggregations for streams.

These are the SAME expressions as the batch queries in
``queries/eventsops.py`` — Spark's unified model means one definition
serves both; the batch oracle checks validate the semantics and the
streaming tests validate watermark/late-data behavior.

Watermarks bound state: a tumbling/sliding window's partial aggregate
is held only until ``watermark > window.end``, then emitted (append
mode) and evicted. Without a watermark a streaming aggregation's
state grows without bound — every function here requires one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _value_aggs() -> list:
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    ]


def tumbling_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, event_type) counts/sums over tumbling windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(*_value_aggs())
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Hopping windows: each event contributes to window/slide
    instances; state is per (window instance, event_type)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(*_value_aggs())
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    *,
    gap: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user sessions closed by ``gap`` of inactivity. Session state
    merges adjacent windows as events arrive and is finalized (and
    dropped) once the watermark passes session end + gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(*_value_aggs())
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def dedup_events(
    events: DataFrame,
    *,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop repeats of ``keys`` arriving within
    the watermark horizon (``dropDuplicatesWithinWatermark``) — state
    holds one entry per key only until the watermark passes it, so
    memory is bounded by the lateness window, not the stream length.
    The batch face of this is ``operators/dedup.exact_dedup``."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
