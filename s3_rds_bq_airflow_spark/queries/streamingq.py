"""Declared queries backed by REAL Structured Streaming runs.

Each call stages the events table as arrival files, executes a
micro-batch streaming query to completion (availableNow trigger),
and returns the materialized result — oracle-checked against the
same DuckDB SQL as the batch equivalents, proving the unified
batch/stream semantics rather than asserting them.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from .registry import query
from ._util import ts_str


def _utc_wall(col):
    """Instant -> UTC wall-clock (timestamp_ntz) under ANY session
    timezone (same construction as io/tables.load_table)."""
    return F.to_utc_timestamp(col, F.current_timezone()).cast("timestamp_ntz")


def _run_stream(spark, sf_dir, build, name_prefix):
    from ..streaming import read_event_stream, stage_as_files

    landing = tempfile.mkdtemp(prefix=f"{name_prefix}_")
    stage_as_files(os.path.join(sf_dir, "events.parquet"), landing, n_files=4)
    table = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, landing)
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(table)


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark, sf_dir):
    """Tumbling-window aggregation executed BY THE STREAMING ENGINE
    (micro-batched file arrivals, state store, complete-mode emission)
    and checked against the identical batch oracle."""
    from ..streaming import tumbling_event_counts

    out = _run_stream(spark, sf_dir, tumbling_event_counts, "stream_tumble")
    return out.select(
        ts_str(_utc_wall(F.col("window_start"))).alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@query(
    "q_stream_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            >= INTERVAL '15 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def q_stream_sessionize(spark, sf_dir):
    """Session windows computed by the streaming state store (merging
    session state across micro-batches), equal to the batch
    gaps-and-islands oracle."""
    from ..streaming import sessionize

    out = _run_stream(spark, sf_dir, sessionize, "stream_sess")
    return out.select(
        "user_id",
        ts_str(_utc_wall(F.col("session_start"))).alias("session_start"),
        "n_events",
        "total_value",
    )


@query(
    "q_stream_exactly_once",
    oracle="""
    SELECT COUNT(*) AS n_events,
           COUNT(DISTINCT event_id) AS n_distinct_ids,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    """,
)
def q_stream_exactly_once(spark, sf_dir):
    """Exactly-once over an at-least-once feed, executed by the
    streaming engine: the landing directory contains a DUPLICATE
    redelivery of one arrival file (same rows, new file name — the
    classic upstream retry); dropDuplicatesWithinWatermark must yield
    exactly the original table's aggregate."""
    import shutil

    from ..streaming import read_event_stream, stage_as_files
    from ..streaming.windows import dedup_events

    landing = tempfile.mkdtemp(prefix="stream_eo_")
    paths = stage_as_files(os.path.join(sf_dir, "events.parquet"), landing, n_files=3)
    dup = os.path.join(landing, "part-redelivered.parquet")
    shutil.copyfile(paths[1], dup)
    os.utime(dup, (os.path.getmtime(paths[-1]) + 5,) * 2)

    table = f"stream_eo_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, landing, max_files_per_trigger=2)
    deduped = dedup_events(stream, keys=["event_id"], watermark="10 days")
    # post-dedup the stream carries unique event_ids, so plain COUNT
    # equals the oracle's COUNT(DISTINCT) — streaming forbids exact
    # distinct aggregation (unbounded state).
    agg = deduped.groupBy().agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.lit(1)).alias("n_distinct_ids"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(table)


@query(
    "q_stream_join",
    oracle="""
    SELECT s.event_id AS s_id, c.event_id AS c_id
    FROM events s JOIN events c
      ON s.user_id = c.user_id
     AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL 2 HOUR
    WHERE s.event_type = 'signup' AND c.event_type = 'click'
    """,
)
def q_stream_join(spark, sf_dir):
    """Watermarked STREAM-STREAM interval join executed by the
    streaming engine (both sides unbounded file streams, state
    bounded by watermark + the interval condition, append mode):
    clicks within 2 hours after a signup. The oracle is the batch
    interval join over the same events — the unified-semantics
    guarantee, proven rather than asserted."""
    import uuid as _uuid

    from ..streaming import read_event_stream, stage_as_files

    landing = tempfile.mkdtemp(prefix="stream_join_")
    stage_as_files(os.path.join(sf_dir, "events.parquet"), landing, n_files=4)

    def side(event_type, p):
        s = read_event_stream(spark, landing).where(F.col("event_type") == event_type)
        return s.select(
            F.col("user_id").alias(f"{p}_user"),
            F.col("ts").alias(f"{p}_ts"),
            F.col("event_id").alias(f"{p}_id"),
        ).withWatermark(f"{p}_ts", "2 hours")

    joined = side("signup", "s").join(
        side("click", "c"),
        F.expr("s_user = c_user AND c_ts >= s_ts AND c_ts < s_ts + INTERVAL 2 HOURS"),
    ).select(F.col("s_id"), F.col("c_id"))
    table = f"q_stream_join_{_uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(table)


@query(
    "q_stream_static_join",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           CAST(MAX(e.user_id) AS BIGINT) AS max_user,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_stream_static_join(spark, sf_dir):
    """Stream-static enrichment join — the dimension-lookup shape of
    every production stream (click joins user profile, reading joins
    device registry): the event stream micro-batches against a STATIC
    customer dimension, then aggregates per market segment. The
    static side needs no watermark and holds no state — each
    micro-batch plans a fresh (broadcast) hash join against it, so
    dimension updates between batches are picked up for free, and
    state size is bounded by the AGGREGATION keys (5 segments), not
    the join.

    Oracle: the identical batch join/rollup — unified batch/stream
    semantics proven by value equality, per this module's contract."""
    from ..io.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )

    # No broadcast hint: customer is an SF-scaling table (~1.5B rows
    # at 100-TB SF), the same derived-payload class as the r10/r11
    # forced-broadcast removals. Size-based planning still broadcasts
    # the static side at bench SFs (parquet stats are visible to each
    # micro-batch plan) and degrades to a shuffled stream-static join
    # when the dimension outgrows the threshold.
    def build(stream):
        return (
            stream.join(cust, "user_id")
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.max("user_id").cast("long").alias("max_user"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_value"),
            )
        )

    return _run_stream(spark, sf_dir, build, "engine_ssj")
