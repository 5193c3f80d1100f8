"""Event-time windowing operators over the ``events`` table.

The reference has NO streaming operators (SURVEY §2.9 "absent") — its
nearest constructs are the incremental high-watermark sync
(`tap_mysql/sync_strategies/incremental.py:57-66`) and the unconfigured
binlog CDC path (`binlog.py:17-37`). These queries are the batch face
of the rebuild's streaming surface: the SAME ``F.window`` /
``F.session_window`` expressions run unchanged under Structured
Streaming (see ``s3_rds_bq_airflow_spark.streaming``), which is the
point of Spark's unified batch/stream model.

Scale: event-time windowing is a single hash shuffle on
(window, keys); sliding windows fan each row out to length/slide
window instances *before* the partial aggregate, so state is
O(windows x keys), never O(rows). Session windows shuffle on the
user key and merge per-key sorted runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from ._util import t, ts_str


@query(
    "q_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour event-time window per event type. Runs
    identically as a streaming groupBy under a watermark."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_sliding_window",
    oracle="""
    WITH b AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS b30, event_type, value FROM events
    ), w AS (
        SELECT b30 AS ws, event_type, value FROM b
        UNION ALL
        SELECT b30 - INTERVAL '30 minutes' AS ws, event_type, value FROM b
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM w
    GROUP BY 1, 2
    """,
)
def q_sliding_window(spark, sf_dir):
    """Sliding (hopping) window: 1-hour length, 30-minute slide. Each
    event lands in exactly length/slide = 2 window instances; Spark
    expands rows to instances BEFORE the partial aggregate, so shuffle
    volume is 2x rows of pre-aggregated partials, not raw events."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_session_window",
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
           strftime(MAX(ts) + INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def q_session_window(spark, sf_dir):
    """Session windows: per-user activity sessions closed by a 15-minute
    inactivity gap (Spark semantics: a gap of exactly >= 15 min starts a
    new session; window end = last event + gap). The oracle reproduces
    this with gaps-and-islands SQL — in Spark it is ONE built-in
    expression, and the same expression sessionizes an unbounded stream
    with state cleanup under a watermark."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "15 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            ts_str(F.col("w.start")).alias("session_start"),
            ts_str(F.col("w.end")).alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q_watermark_finality",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS max_ts FROM events)
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           CAST(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
                <= (SELECT max_ts FROM mx) - INTERVAL '2 hours' AS BOOLEAN) AS is_final
    FROM events
    GROUP BY time_bucket(INTERVAL '1 hour', ts)
    """,
)
def q_watermark_finality(spark, sf_dir):
    """Watermark semantics, batch face: with watermark = max event time
    minus a 2-hour allowed lateness, a tumbling window is FINAL (would
    have been emitted and its state dropped by the streaming engine)
    iff window.end <= watermark. The scalar max joins back via a
    broadcast of one row — no second scan shuffle."""
    e = t(spark, sf_dir, "events")
    agg = e.groupBy(F.window("ts", "1 hour").alias("w")).agg(F.count(F.lit(1)).alias("n_events"))
    mx = e.agg(F.max("ts").alias("max_ts"))
    return (
        agg.crossJoin(F.broadcast(mx))
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "n_events",
            (F.col("w.end") <= F.col("max_ts") - F.expr("INTERVAL 2 HOURS")).alias("is_final"),
        )
    )


@query(
    "q_pivot_event_type",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY 1
    """,
)
def q_pivot_event_type(spark, sf_dir):
    """PIVOT: daily counts with one column per event type. Explicit
    value list keeps the plan a single pass (no distinct-values
    pre-query) — mandatory at scale."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("ts").cast("date").cast("string").alias("event_date"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "error", "purchase", "signup", "view"])
    )


@query(
    "q_event_rate_per_user",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span_micros,
           CAST(COUNT(*) AS DOUBLE)
             / GREATEST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 3600000000.0, 1.0)
             AS events_per_hour
    FROM events
    GROUP BY user_id
    """,
)
def q_event_rate_per_user(spark, sf_dir):
    """Per-user activity rate (throughput metric A6 generalized from
    the reference's rows/sec logging, `s3-to-rds.py:239-243`). The
    span is exact integer microseconds so both engines derive the
    identical IEEE-754 rate."""
    e = t(spark, sf_dir, "events")
    micros = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .select(
            "user_id",
            "n_events",
            (micros("max_ts") - micros("min_ts")).alias("span_micros"),
            (
                F.col("n_events").cast("double")
                / F.greatest(
                    (micros("max_ts") - micros("min_ts")) / F.lit(3600000000.0), F.lit(1.0)
                )
            ).alias("events_per_hour"),
        )
    )


@query(
    "q_variant_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_extract(spark, sf_dir):
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` turns the props JSON into a variant value and
    ``variant_get`` path-extracts with a target type — the
    binary-encoded, shredding-ready representation that replaces
    per-query string re-parsing at scale (parse once, extract many;
    columnar shredded storage when written). Aggregates per event
    type verify the extraction against DuckDB's json_extract on the
    same paths. All-integer outputs, no float risk."""
    ev = t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
    )


_ISLANDS_ORACLE = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
anchored AS (
    SELECT user_id, day,
           day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
               AS anchor
    FROM days
),
islands AS (
    SELECT user_id, anchor,
           COUNT(*) AS n_days,
           MIN(day) AS start_day
    FROM anchored GROUP BY user_id, anchor
),
marked AS (
    SELECT user_id, n_days, start_day,
           MAX(n_days) OVER (PARTITION BY user_id) AS mx
    FROM islands
)
SELECT user_id,
       CAST(SUM(n_days) AS BIGINT) AS n_active_days,
       COUNT(*) AS n_islands,
       CAST(MAX(n_days) AS BIGINT) AS longest_run_days,
       CAST(MIN(CASE WHEN n_days = mx THEN start_day END) AS VARCHAR)
           AS longest_run_start
FROM marked
GROUP BY user_id
"""


@query("q_gaps_islands", oracle=_ISLANDS_ORACLE)
def q_gaps_islands(spark, sf_dir):
    """Gaps-and-islands: per user, runs of CONSECUTIVE active days
    (the classic row_number-difference idiom: day minus its per-user
    ordinal is constant exactly within a consecutive run) — activity
    streaks, the engagement-analytics counterpart of session windows
    (which group by time GAP, not calendar adjacency). Emits per user
    the active-day count, number of runs, longest run, and the
    earliest start among longest runs (deterministic tie-break).

    Scale: one distinct + two aggregations, all partitioned by
    user_id — a single shuffle key end-to-end, no joins; the
    windowed ordinal sorts only each user's own days."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = days.select(
        "user_id",
        "day",
        F.date_sub("day", F.row_number().over(w)).alias("anchor"),
    )
    islands = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min("day").alias("start_day"),
    )
    w_mx = Window.partitionBy("user_id")
    marked = islands.withColumn("mx", F.max("n_days").over(w_mx))
    return marked.groupBy("user_id").agg(
        F.sum("n_days").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_islands"),
        F.max("n_days").cast("long").alias("longest_run_days"),
        F.min(F.when(F.col("n_days") == F.col("mx"), F.col("start_day")))
        .cast("string")
        .alias("longest_run_start"),
    )


@query(
    "q_rolling_distinct_users",
    oracle="""
    WITH days AS (
        SELECT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    contrib AS (
        SELECT d + CAST(x AS INT) AS day, user_id
        FROM days, UNNEST(range(0, 7)) AS t(x)
    ),
    bounds AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
               FROM events)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users_7d
    FROM contrib, bounds
    WHERE day BETWEEN bounds.lo AND bounds.hi
    GROUP BY day
    """,
)
def q_rolling_distinct_users(spark, sf_dir):
    """Rolling 7-day distinct active users — the DAU/WAU engagement
    metric. COUNT(DISTINCT) over a sliding RANGE window is not
    directly computable by any engine's window operator (distinct
    state is not mergeable across frame slides), so the scalable
    rewrite is contribution-expansion: each event contributes its
    user to the 7 daily windows ending on day d..d+6, then one plain
    (day, user) distinct aggregation. Constant 7x fanout of
    day-grained pairs (pre-shrunk by a per-day dedup at 100 TB),
    never a per-window re-scan; the same shape computes any k-day
    window in one pass."""
    e = t(spark, sf_dir, "events")
    days = e.select(F.to_date("ts").alias("d"), "user_id")
    contrib = days.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("x"), "d", "user_id"
    ).select(F.date_add(F.col("d"), F.col("x")).alias("day"), "user_id")
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .where((F.col("day") >= F.col("lo")) & (F.col("day") <= F.col("hi")))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "active_users_7d"
        )
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    ),
    tot AS (SELECT prev_type, SUM(n) AS row_total FROM trans GROUP BY prev_type)
    SELECT t.prev_type, t.next_type, CAST(t.n AS BIGINT) AS n,
           CAST(t.n AS DOUBLE) / tot.row_total AS p
    FROM trans t JOIN tot USING (prev_type)
    """,
)
def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event-type
    sequences — the behavioral model behind next-action prediction
    and bot detection (bots have degenerate transition rows). LAG
    within (user, time) order pairs consecutive events; transition
    probability = exact count ratio (two integers, one division —
    bit-portable).

    Scale shape: one user_id shuffle for the lag window, then the
    transition rollup is event-type-squared-sized (tiny) with
    map-side combine; row totals join at that same tiny size."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    trans = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = trans.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return trans.join(tot, "prev_type").select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        (F.col("n").cast("double") / F.col("row_total")).alias("p"),
    )


@query(
    "q_interarrival_latency",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               date_diff('microsecond',
                         LAG(ts) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id),
                         ts) AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           quantile_cont(gap_us, 0.50) AS p50_us,
           quantile_cont(gap_us, 0.95) AS p95_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def q_interarrival_latency(spark, sf_dir):
    """Inter-arrival latency distribution per event type — the SLA /
    engagement-cadence metric: exact integer microsecond gaps between
    a user's consecutive events of the same type (LAG within one
    (user,type) shuffle), then exact interpolated p50/p95 over those
    integers (portable per the q_percentiles precedent; the
    percentile inputs are exact BIGINTs, so interpolation operands
    are bit-identical cross-engine).

    Scale shape: one shuffle for the lag window, one event-type-keyed
    percentile aggregate; at 100 TB the percentile gear swaps to the
    mergeable histogram sketch (q_histogram_quantiles) with the same
    query shape."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = t(spark, sf_dir, "events").select(
        "event_type",
        F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts")).alias(
            "gap_us"
        ),
    )
    return (
        gaps.where(F.col("gap_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.expr("percentile(gap_us, 0.50)").alias("p50_us"),
            F.expr("percentile(gap_us, 0.95)").alias("p95_us"),
        )
    )


@query(
    "q_lateness_histogram",
    oracle="""
    WITH arr AS (
        SELECT user_id, ts,
               MAX(ts) OVER (PARTITION BY user_id
                             ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                             ROWS UNBOUNDED PRECEDING) AS high_water
        FROM events
    ),
    lat AS (
        SELECT LEAST(date_diff('microsecond', ts, high_water)
                     // 86400000000, 30) AS late_days
        FROM arr
    )
    SELECT CAST(late_days AS BIGINT) AS late_days,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM lat GROUP BY late_days
    """,
)
def q_lateness_histogram(spark, sf_dir):
    """Event-lateness histogram — the measurement that SIZES a
    streaming watermark (too tight drops data, too loose bloats
    state): per user stream, each event's lateness is the gap
    between its event time and the high-water mark of everything
    that ARRIVED before it, bucketed in whole DAYS and capped at
    30+ (the table spans a month). The synthetic table is already time-ordered (bucket 0 only),
    so arrival is REPLAYED under a deterministic md5(event_id)
    shuffle — the adversarial-arrival schedule — and the mass above
    bucket k is exactly what a k-day watermark would drop.

    Numeric gear: exact integer microsecond gaps floor-divided to
    days (the portable diff granularity — see q_time_to_convert);
    the running max is a per-user window (one shuffle), never a
    global arrival sort."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.md5(F.col("event_id").cast("string")), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    arr = t(spark, sf_dir, "events").select(
        "ts", F.max("ts").over(w).alias("high_water")
    )
    late_days = F.least(
        F.floor(
            F.timestamp_diff("MICROSECOND", F.col("ts"), F.col("high_water"))
            / 86400000000
        ),
        F.lit(30),
    )
    return (
        arr.select(late_days.cast("long").alias("late_days"))
        .groupBy("late_days")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def cap_recent_items(purchases, recent_n):
    """Per-user recent-N ownership cap — the scale gear for item-item
    CF pairing (Linden/Smith/York §'scalability': bound the per-user
    history before the quadratic pairing step).

    ``purchases`` is (user_id, item, ts) with duplicates allowed; the
    result is one row per (user_id, item) keeping only each user's
    ``recent_n`` most recently purchased distinct items (latest ts per
    item; (ts DESC, item) tiebreak). ``recent_n=None`` is the uncapped
    exact mode. The cap bounds the co-occurrence self-join's fanout at
    recent_n*(recent_n-1) pairs per user regardless of how degenerate
    a power user's history is — without it, one 10^5-item user on a
    100 TB event log emits 10^10 pairs from a single key.
    """
    from pyspark.sql import Window as W

    owned = purchases.groupBy("user_id", "item").agg(F.max("ts").alias("_last_ts"))
    if recent_n is not None:
        w = W.partitionBy("user_id").orderBy(
            F.col("_last_ts").desc(), F.col("item")
        )
        owned = (
            owned.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= recent_n)
            .drop("_rn")
        )
    return owned.drop("_last_ts")


def cooccurrence_recommendations(purchases, targets, recent_n=50):
    """Item-item CF core: co-occurrence matrix from per-user ownership
    pairs, candidate generation by equi-joining target users' items
    against it, ownership anti-joined out BEFORE ranking, top-5 per
    user on (score DESC, item).

    ``recent_n`` (default 50) applies the recent-N cap to the PAIRING
    and candidate-SEEDING sides only — the quadratic/fanout stages;
    ``None`` is the uncapped exact mode that the DuckDB oracle
    replays. Ownership EXCLUSION always anti-joins against the FULL
    distinct per-user ownership: it is an equi-join bounded linearly
    by distinct (user, item) rows, so capping it would buy no scale
    headroom while changing the semantics — a power user with >N
    items must never be recommended something they already own just
    because the purchase fell outside their recent N (round-7 advisor
    finding). The two gears agree whenever every user owns at most
    ``recent_n`` distinct items (true of every verification fixture:
    max 25 at sf0.1).
    """
    from pyspark.sql import Window as W

    owned = cap_recent_items(purchases, recent_n)
    owned_full = purchases.select("user_id", "item").distinct()
    a, b = owned.alias("a"), owned.alias("b")
    cooc = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") != F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("item"), F.col("b.item").alias("rec_item"))
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    cand = (
        owned.join(targets, "user_id")
        .join(cooc, "item")
        .join(
            owned_full.select(
                F.col("user_id").alias("user_id"),
                F.col("item").alias("rec_item"),
            ),
            ["user_id", "rec_item"],
            "left_anti",
        )
        .groupBy("user_id", "rec_item")
        .agg(F.sum("n_co").cast("long").alias("score"))
    )
    w = W.partitionBy("user_id").orderBy(F.col("score").desc(), F.col("rec_item"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("user_id", "rec_item", "score", "rank")
    )


@query(
    "q_cooccurrence_recs",
    oracle="""
    WITH owned AS (
        SELECT DISTINCT user_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS item
        FROM events WHERE event_type = 'purchase'
    ),
    cooc AS (
        SELECT a.item AS item, b.item AS rec_item, COUNT(*) AS n_co
        FROM owned a JOIN owned b
          ON a.user_id = b.user_id AND a.item <> b.item
        GROUP BY 1, 2
    ),
    targets AS (SELECT DISTINCT user_id FROM owned WHERE user_id < 3),
    cand AS (
        SELECT o.user_id, c.rec_item, CAST(SUM(c.n_co) AS BIGINT) AS score
        FROM owned o
        JOIN targets t ON o.user_id = t.user_id
        JOIN cooc c ON c.item = o.item
        LEFT JOIN owned h ON h.user_id = o.user_id AND h.item = c.rec_item
        WHERE h.item IS NULL
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT user_id, rec_item, score,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY score DESC, rec_item) AS rn
        FROM cand
    )
    SELECT user_id, rec_item, score, rn AS rank FROM ranked WHERE rn <= 5
    """,
)
def q_cooccurrence_recs(spark, sf_dir):
    """Item-to-item collaborative filtering (Linden/Smith/York, the
    Amazon item-item paper, IEEE Internet Computing 2003): items
    co-purchased by the same user form a co-occurrence matrix;
    recommendations for a user = unowned items ranked by summed
    co-occurrence with what they own. Top-5 per target user, integer
    scores, (score DESC, item) tiebreak.

    Scale shape: the co-occurrence self-join is keyed on user_id and
    its fanout is quadratic in ITEMS PER USER, so the default gear
    applies the per-user recent-N cap (:func:`cap_recent_items`,
    N=50, one window on the user key) BEFORE pairing — pair output is
    bounded at N*(N-1) per user no matter how degenerate a power
    user's history is. The uncapped exact mode (``recent_n=None``) is
    what the DuckDB oracle replays; the gears agree because every
    fixture user owns at most 25 distinct items (driver SFs and the
    stride-shifted sf1/sf10 replicas alike — the stride shift
    preserves per-user cardinality). The matrix itself is
    item-pair-sized (vocabulary^2 worst case, co-occurrence-sparse in
    practice); candidate generation is an equi-join of the target
    users' items against it, ownership excluded BEFORE ranking with
    an anti-join against the FULL distinct ownership (linear, so the
    cap never re-recommends an owned-but-not-recent item)."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        "ts",
    )
    targets = (
        purchases.where(F.col("user_id") < 3).select("user_id").distinct()
    )
    return cooccurrence_recommendations(purchases, targets, recent_n=50)
