"""Event-sequence analytics: conversion funnel and cohort retention.

Standard event-pipeline operators the reference's dataset implies but
its code never computes (it only moves the events). Both are pure
multi-stage aggregations — sequence matching via ordered first-
occurrence timestamps, not per-row state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from ._util import t


@query(
    "q_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
        FROM events GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS c_ts
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'click' AND e.ts > s.s_ts
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        GROUP BY e.user_id
    )
    SELECT CAST(COUNT(s.s_ts) AS BIGINT) AS n_signup,
           CAST(COUNT(c.c_ts) AS BIGINT) AS n_click_after_signup,
           CAST(COUNT(p.p_ts) AS BIGINT) AS n_purchase_after_click
    FROM s LEFT JOIN c ON s.user_id = c.user_id
           LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def q_funnel(spark, sf_dir):
    """Ordered conversion funnel signup -> click -> purchase: each
    stage is the user's first qualifying event strictly after the
    previous stage. Three grouped aggregates + two shuffles on
    user_id — the reused key partitioning means AQE can pipeline the
    stages; no per-event state or window sort over the full stream."""
    e = t(spark, sf_dir, "events")
    s = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s_ts")
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(s, "user_id")
        .where(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("s_ts").alias("n_signup"),
            F.count("c_ts").alias("n_click_after_signup"),
            F.count("p_ts").alias("n_purchase_after_click"),
        )
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH firstseen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    )
    SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
           date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firstseen f ON e.user_id = f.user_id
    WHERE date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) IN (0, 1, 7, 14)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-seen day, distinct
    activity at offsets 0/1/7/14 days. First-seen is a grouped min
    (broadcastable user->cohort map), the retention matrix one
    distinct aggregate."""
    e = t(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("cohort_day"))
    return (
        e.join(F.broadcast(first), "user_id")
        .withColumn("day_offset", F.datediff(F.col("ts").cast("date"), F.col("cohort_day")))
        .where(F.col("day_offset").isin(0, 1, 7, 14))
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"), "day_offset"
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
