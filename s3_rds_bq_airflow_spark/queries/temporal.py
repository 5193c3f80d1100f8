"""Declared queries for the temporal join operators (as-of, range).

DuckDB has native ASOF JOIN, which makes a sharp oracle: the Spark
implementation is a composition (union + carry-forward window / binned
equi-join), the oracle is the primitive — matching values prove the
composition's semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from ._util import t, ts_str
from ..operators.temporal import asof_join, epoch_seconds, range_join_binned


@query(
    "q_asof_join",
    oracle="""
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS prior_purchase_ts,
           p.value AS prior_purchase_value
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts > p.ts
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join: every event gets the user's most recent STRICTLY
    prior purchase (left-outer; null when none). Spark composition:
    tag+union both sides, one hash shuffle on user_id, sort within
    partition, carry the last purchase payload forward — never the
    naive join-explode-prune. Oracle: DuckDB's native ASOF JOIN."""
    e = t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = asof_join(
        e.select("event_id", "user_id", "ts"),
        purchases,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_values=["ts", "value"],
        strict=True,
    )
    return out.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("ts"),
        ts_str(F.col("asof_ts")).alias("prior_purchase_ts"),
        F.col("asof_value").alias("prior_purchase_value"),
    )


@query(
    "q_range_join",
    oracle="""
    SELECT s.event_id AS signup_event_id, s.user_id,
           strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
           COUNT(c.ts) AS n_clicks_2h,
           CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(18,2))), 0) AS DOUBLE) AS click_value_2h
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
      ON s.user_id = c.user_id AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL '2 hours'
    GROUP BY s.event_id, s.user_id, s.ts
    """,
)
def q_range_join(spark, sf_dir):
    """Range join: per signup, that user's clicks in the following two
    hours. Spark composition: explode each signup interval onto
    fixed 2h buckets and hash-join on (user, bucket) + residual range
    predicate — an O(n+m) shuffle join with constant fanout instead of
    a nested-loop. Zero-click signups are restored by a left join of
    the counts back onto signups."""
    e = t(spark, sf_dir, "events")
    signups = e.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"), "user_id", F.col("ts").alias("signup_ts")
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    start = epoch_seconds("signup_ts")
    paired = range_join_binned(
        signups,
        clicks,
        on="user_id",
        left_start=start,
        left_end=start + F.lit(7200.0),
        right_time=epoch_seconds("click_ts"),
        bucket_seconds=7200,
    )
    counts = paired.groupBy("signup_event_id").agg(
        F.count(F.lit(1)).alias("n_clicks_2h"),
        F.sum(F.col("click_value").cast("decimal(18,2)")).alias("click_value_dec"),
    )
    return (
        signups.join(counts, on="signup_event_id", how="left")
        .select(
            "signup_event_id",
            "user_id",
            ts_str(F.col("signup_ts")).alias("signup_ts"),
            F.coalesce(F.col("n_clicks_2h"), F.lit(0)).alias("n_clicks_2h"),
            F.coalesce(F.col("click_value_dec"), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("click_value_2h"),
        )
    )


@query(
    "q_resample_ffill",
    oracle="""
    WITH e AS (
        SELECT user_id, DATE_TRUNC('hour', ts) AS grid_ts,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS hourly_value
        FROM events WHERE user_id % 50 = 0
        GROUP BY user_id, DATE_TRUNC('hour', ts)
    ),
    bounds AS (
        SELECT user_id, MIN(grid_ts) AS mn, MAX(grid_ts) AS mx FROM e GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS grid_ts
        FROM bounds
    )
    SELECT g.user_id,
           STRFTIME(g.grid_ts, '%Y-%m-%d %H:%M:%S') AS grid_hour,
           LAST_VALUE(e.hourly_value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.grid_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_ffill,
           CAST(e.user_id IS NULL AS BIGINT) AS was_gap
    FROM grid g LEFT JOIN e ON g.user_id = e.user_id AND g.grid_ts = e.grid_ts
    """,
)
def q_resample_ffill(spark, sf_dir):
    """Time-series regularization: per-user hourly resample of the
    event stream with forward fill across gaps — the temporal twin of
    schema evolution (irregular arrivals -> a dense analysis grid).
    ``sequence()`` generates each user's grid (no driver loop),
    exact-decimal hourly means, and carry-forward is one
    ``last(ignorenulls)`` running window. Mirrored in DuckDB via
    generate_series + LAST_VALUE IGNORE NULLS."""
    e = (
        t(spark, sf_dir, "events")
        .where(F.col("user_id") % 50 == 0)
        .groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("grid_ts")
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
             / F.count(F.lit(1))).alias("hourly_value")
        )
    )
    bounds = e.groupBy("user_id").agg(
        F.min("grid_ts").alias("mn"), F.max("grid_ts").alias("mx")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("grid_ts"),
    )
    joined = grid.join(
        e.withColumnRenamed("user_id", "e_user"),
        (grid["user_id"] == F.col("e_user")) & (grid["grid_ts"] == e["grid_ts"]),
        "left",
    ).select(
        grid["user_id"], grid["grid_ts"], "hourly_value", F.col("e_user")
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("grid_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("grid_ts", "yyyy-MM-dd HH:mm:ss").alias("grid_hour"),
        F.last("hourly_value", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("e_user").isNull().cast("long").alias("was_gap"),
    )


@query(
    "q_asof_tolerance",
    oracle="""
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CASE WHEN p.ts IS NOT NULL AND e.ts - p.ts <= INTERVAL 6 HOURS
                THEN strftime(p.ts, '%Y-%m-%d %H:%M:%S') END AS prior_purchase_ts,
           CASE WHEN p.ts IS NOT NULL AND e.ts - p.ts <= INTERVAL 6 HOURS
                THEN p.value END AS prior_purchase_value
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts > p.ts
    """,
)
def q_asof_tolerance(spark, sf_dir):
    """As-of join with a STALENESS TOLERANCE (pandas
    ``merge_asof(tolerance=...)``): the most recent strictly-prior
    purchase counts only if it is at most 6 hours old — older matches
    null out, exactly as if no prior row existed. The engine applies
    tolerance as a per-row post filter on the carried right time
    (``operators/temporal.asof_join(tolerance_seconds=...)``), so the
    plan is the SAME single-shuffle union + carry-forward as
    q_asof_join; the oracle is DuckDB's native ASOF JOIN with the
    equivalent CASE — primitive vs composition, one answer."""
    e = t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        e.select("event_id", "user_id", "ts"),
        purchases,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_values=["ts", "value"],
        strict=True,
        tolerance_seconds=6 * 3600,
    )
    return out.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("ts"),
        ts_str(F.col("asof_ts")).alias("prior_purchase_ts"),
        F.col("asof_value").alias("prior_purchase_value"),
    )


@query(
    "q_interval_overlap",
    oracle="""
    WITH spans AS (
        SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               MIN(ts) AS s, MAX(ts) + INTERVAL 60 SECONDS AS e
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    incidents AS (
        SELECT event_id AS incident_id, ts AS s, ts + INTERVAL 2 HOURS AS e
        FROM events WHERE event_type = 'error'
    )
    SELECT spans.user_id, spans.day,
           COUNT(incidents.incident_id) AS n_overlapping_incidents
    FROM spans LEFT JOIN incidents
      ON spans.s < incidents.e AND incidents.s < spans.e
    GROUP BY spans.user_id, spans.day
    """,
)
def q_interval_overlap(spark, sf_dir):
    """Interval x interval overlap COUNT (`operators/temporal.
    interval_overlap_count_rank`): per-user daily activity spans
    [first event, last event + 60 s) against global error-incident
    windows [error ts, +2 h), counting incidents each user-day
    overlapped.

    Round-9 scale rewrite (full-catalog sf10 campaign finding): the
    original plan paired spans with incidents through the binned
    overlap JOIN and counted the pairs — but the incidents are
    GLOBAL, so every span joins all concurrent incidents and the
    intermediate pair stream grows ~SF^2 while the output stays
    linear (engine side alone ran 15+ min at sf10). The count
    decomposes into two sorted-merge RANK lookups instead —
    |incident starts < span end| − |incident ends <= span start| —
    two bin-shuffled running-sum windows, zero pairs materialized;
    zero-count spans fall out naturally (no zero-union pass). The
    bounded cross-bin prefix sum is a calendar-domain single-
    partition window (SINGLE_PARTITION_WINDOW_OK). The pair-producing
    operator (`interval_overlap_join_binned`) remains the right gear
    when the pairs ARE the output; its semantics stay pinned by
    tests/test_temporal_ops.py. The oracle is the direct
    overlap-predicate join, unchanged — equality proves the rank
    decomposition."""
    from ..operators.temporal import interval_overlap_count_rank

    e = t(spark, sf_dir, "events")
    spans = e.groupBy(
        "user_id", F.col("ts").cast("date").cast("string").alias("day")
    ).agg(
        epoch_seconds(F.min("ts")).alias("s0"),
        (epoch_seconds(F.max("ts")) + F.lit(60.0)).alias("e0"),
    )
    incidents = e.where(F.col("event_type") == "error").select(
        epoch_seconds("ts").alias("is0"),
        (epoch_seconds("ts") + F.lit(7200.0)).alias("ie0"),
    )
    return interval_overlap_count_rank(
        spans,
        incidents,
        left_start=F.col("s0"),
        left_end=F.col("e0"),
        right_start=F.col("is0"),
        right_end=F.col("ie0"),
        key_cols=("user_id", "day"),
        count_col="n_overlapping_incidents",
    )


# EWMA tail depth and the quantization scale of the int3 gear.
_EWMA_K = 20
_EWMA_SCALE = 1000


@query(
    "q_ewma_per_user",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id,
               CAST(FLOOR(value * {_EWMA_SCALE} + 0.5) AS BIGINT) AS v,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_tail,
           CAST(SUM(v * (CAST(1 AS BIGINT) << ({_EWMA_K} - rn))) AS DOUBLE)
               / SUM(CAST(1 AS BIGINT) << ({_EWMA_K} - rn)) AS ewma
    FROM ranked WHERE rn <= {_EWMA_K}
    GROUP BY user_id
    """,
)
def q_ewma_per_user(spark, sf_dir):
    """Per-user exponentially weighted moving average (half-life = 1
    observation) over the trailing 20 events — the streaming-feature
    shape behind rate limiters, anomaly scores, and engagement decay.

    Numeric gear: alpha = 1/2 makes every weight an exact power of
    two, so the weighted sum is EXACT 64-bit integer arithmetic over
    int3-quantized values (floor(value*1000 + 0.5)); the single final
    division of two exact integers is correctly rounded IEEE — bit-
    identical cross-engine, no transcendentals, no float summation
    order. Bound: |v| < 2^21, tail 20, top weight 2^19 -> |S| <
    20 * 2^40 << 2^53.

    Scale shape: one shuffle on user_id for the row_number window,
    then the rollup reuses that partitioning (no second exchange);
    the trailing-K cut happens BEFORE aggregation so per-user state
    is bounded at K rows regardless of history length — the same
    posture a 100 TB event store needs."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = (
        t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id",
            F.floor(F.col("value") * _EWMA_SCALE + F.lit(0.5))
            .cast("long")
            .alias("v"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= _EWMA_K)
    )
    weight = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_EWMA_K} - rn)")
    return ranked.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_tail"),
        (F.sum(F.col("v") * weight).cast("double") / F.sum(weight)).alias("ewma"),
    )


@query(
    "q_asof_nearest",
    oracle="""
    WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    pr AS (
        SELECT e.event_id, e.user_id, e.ts, pp.ts AS prior_ts
        FROM events e ASOF LEFT JOIN p pp
          ON e.user_id = pp.user_id AND e.ts >= pp.ts
    ),
    nx AS (
        SELECT e.event_id, pn.ts AS next_ts
        FROM events e ASOF LEFT JOIN p pn
          ON e.user_id = pn.user_id AND e.ts <= pn.ts
    ),
    j AS (SELECT pr.*, nx.next_ts FROM pr JOIN nx USING (event_id))
    SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CASE WHEN prior_ts IS NULL AND next_ts IS NULL THEN 'none'
                WHEN next_ts IS NULL THEN 'prior'
                WHEN prior_ts IS NULL THEN 'next'
                WHEN date_diff('microsecond', prior_ts, ts)
                     <= date_diff('microsecond', ts, next_ts) THEN 'prior'
                ELSE 'next' END AS direction,
           strftime(CASE WHEN prior_ts IS NULL AND next_ts IS NULL THEN NULL
                WHEN next_ts IS NULL THEN prior_ts
                WHEN prior_ts IS NULL THEN next_ts
                WHEN date_diff('microsecond', prior_ts, ts)
                     <= date_diff('microsecond', ts, next_ts) THEN prior_ts
                ELSE next_ts END, '%Y-%m-%d %H:%M:%S') AS nearest_purchase_ts,
           CAST(CASE WHEN prior_ts IS NULL AND next_ts IS NULL THEN NULL
                WHEN next_ts IS NULL THEN date_diff('microsecond', prior_ts, ts)
                WHEN prior_ts IS NULL THEN date_diff('microsecond', ts, next_ts)
                WHEN date_diff('microsecond', prior_ts, ts)
                     <= date_diff('microsecond', ts, next_ts)
                     THEN date_diff('microsecond', prior_ts, ts)
                ELSE date_diff('microsecond', ts, next_ts) END AS BIGINT) AS delta_us
    FROM j
    """,
)
def q_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of join (pandas merge_asof
    direction='nearest'): each event matches the user's purchase with
    the smallest |time delta|, looking BOTH backward and forward; ties
    prefer the prior side. The backward-only variant is q_asof_join.

    Spark composition: union events+purchases, ONE hash shuffle on
    user_id, then two windows over the SAME partitioning (ascending
    carry-forward for the prior purchase, descending for the next) —
    the second window re-sorts in place without a second exchange.
    Purchases order before events at equal ts in both directions, so
    an exact-ts purchase yields delta 0 on both sides and the tie
    rule picks 'prior'. Oracle: two native DuckDB ASOF joins (>= and
    <=) plus the same tie arithmetic, exact integer microseconds."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    ev = e.select("event_id", "user_id", "ts", F.lit(0).alias("is_p"))
    p = e.where(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(1).alias("is_p"),
    )
    u = ev.unionByName(p)
    p_ts = F.when(F.col("is_p") == 1, F.col("ts"))
    w_asc = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("is_p"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_desc = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("is_p"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = u.select(
        "event_id",
        "user_id",
        "ts",
        "is_p",
        F.last(p_ts, ignorenulls=True).over(w_asc).alias("prior_ts"),
        F.last(p_ts, ignorenulls=True).over(w_desc).alias("next_ts"),
    ).where(F.col("is_p") == 0)
    d_prior = F.timestamp_diff("MICROSECOND", F.col("prior_ts"), F.col("ts"))
    d_next = F.timestamp_diff("MICROSECOND", F.col("ts"), F.col("next_ts"))
    prefer_prior = F.col("next_ts").isNull() | (
        F.col("prior_ts").isNotNull() & (d_prior <= d_next)
    )
    return marked.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("ts"),
        F.when(F.col("prior_ts").isNull() & F.col("next_ts").isNull(), "none")
        .when(prefer_prior, "prior")
        .otherwise("next")
        .alias("direction"),
        ts_str(F.when(prefer_prior, F.col("prior_ts")).otherwise(F.col("next_ts")))
        .alias("nearest_purchase_ts"),
        F.when(prefer_prior, d_prior)
        .otherwise(d_next)
        .cast("long")
        .alias("delta_us"),
    )


@query(
    "q_interpolate_linear",
    oracle="""
    WITH base AS (
        SELECT user_id, event_id, ts,
               CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v,
               (event_id % 7 = 0) AS masked
        FROM events WHERE value IS NOT NULL
    ),
    carried AS (
        SELECT user_id, event_id, ts, v, masked,
               LAST_VALUE(CASE WHEN NOT masked THEN v END IGNORE NULLS)
                   OVER w_asc AS prev_v,
               LAST_VALUE(CASE WHEN NOT masked THEN epoch_us(ts) // 1000000 END
                          IGNORE NULLS) OVER w_asc AS prev_t,
               LAST_VALUE(CASE WHEN NOT masked THEN v END IGNORE NULLS)
                   OVER w_desc AS next_v,
               LAST_VALUE(CASE WHEN NOT masked THEN epoch_us(ts) // 1000000 END
                          IGNORE NULLS) OVER w_desc AS next_t
        FROM base
        WINDOW
          w_asc AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          w_desc AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(v AS BIGINT) AS true_milli,
           CASE
             WHEN prev_v IS NULL AND next_v IS NULL THEN NULL
             WHEN prev_v IS NULL THEN CAST(next_v AS DOUBLE)
             WHEN next_v IS NULL THEN CAST(prev_v AS DOUBLE)
             WHEN next_t = prev_t THEN CAST(prev_v AS DOUBLE)
             ELSE CAST(prev_v * (next_t - epoch_us(ts) // 1000000)
                       + next_v * (epoch_us(ts) // 1000000 - prev_t) AS DOUBLE)
                  / CAST(next_t - prev_t AS BIGINT)
           END AS interp_milli
    FROM carried WHERE masked
    """,
)
def q_interpolate_linear(spark, sf_dir):
    """Linear interpolation of masked time-series points — the gap-
    fill beside forward-fill (q_resample_ffill): every 7th
    observation is masked, then reconstructed from its nearest
    unmasked neighbors on each side, weighted by time distance. The
    masked rows keep their true value in the output, so the row set
    doubles as an imputation-error fixture.

    Numeric gear: neighbor values are int3-quantized BIGINTs and time
    distances exact integer SECONDS (epoch_us//1e6 == truncating
    timestamp_diff, identical on both engines), so the interpolation numerator
    prev*(tn-t) + next*(t-tp) stays an exact integer (< 2^53:
    ~2.6e6 s span x 1e6 milli-units) and ONE double division ends the
    computation — bit-identical cross-engine. Edge policy: no left
    neighbor -> backward fill, no right -> forward fill, zero-width
    -> left value.

    Scale shape: the same single-shuffle two-window composition as
    q_asof_nearest (asc carry for prev, desc carry for next over one
    user_id partitioning); per-row O(1) state, no joins."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    base = e.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
        (F.col("event_id") % 7 == 0).alias("masked"),
    )
    sec = F.timestamp_diff(
        "SECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col("ts").cast("timestamp_ntz"),
    ).cast("long")
    base = base.withColumn("t_s", sec)
    unmasked_v = F.when(~F.col("masked"), F.col("v"))
    unmasked_t = F.when(~F.col("masked"), F.col("t_s"))
    w_asc = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_desc = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = base.select(
        "user_id",
        "event_id",
        "ts",
        "v",
        "t_s",
        "masked",
        F.last(unmasked_v, ignorenulls=True).over(w_asc).alias("prev_v"),
        F.last(unmasked_t, ignorenulls=True).over(w_asc).alias("prev_t"),
        F.last(unmasked_v, ignorenulls=True).over(w_desc).alias("next_v"),
        F.last(unmasked_t, ignorenulls=True).over(w_desc).alias("next_t"),
    )
    interp = (
        F.when(F.col("prev_v").isNull() & F.col("next_v").isNull(), F.lit(None))
        .when(F.col("prev_v").isNull(), F.col("next_v").cast("double"))
        .when(F.col("next_v").isNull(), F.col("prev_v").cast("double"))
        .when(F.col("next_t") == F.col("prev_t"), F.col("prev_v").cast("double"))
        .otherwise(
            (
                F.col("prev_v") * (F.col("next_t") - F.col("t_s"))
                + F.col("next_v") * (F.col("t_s") - F.col("prev_t"))
            ).cast("double")
            / (F.col("next_t") - F.col("prev_t"))
        )
    )
    return (
        carried.where(F.col("masked"))
        .select(
            "user_id",
            "event_id",
            ts_str("ts").alias("ts"),
            F.col("v").cast("long").alias("true_milli"),
            interp.alias("interp_milli"),
        )
    )


@query(
    "q_twap_per_user",
    oracle="""
    WITH base AS (
        SELECT user_id, ts,
               CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v,
               epoch_us(ts) // 1000000 AS t_s
        FROM events WHERE value IS NOT NULL
    ),
    stepped AS (
        SELECT user_id, v, t_s,
               LEAD(t_s) OVER (PARTITION BY user_id
                               ORDER BY ts, v) AS next_t
        FROM base
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(SUM(CASE WHEN next_t IS NOT NULL
                         THEN v * (next_t - t_s) END) AS DOUBLE)
             / SUM(CASE WHEN next_t IS NOT NULL THEN next_t - t_s END)
             AS twap_milli
    FROM stepped
    GROUP BY user_id
    """,
)
def q_twap_per_user(spark, sf_dir):
    """Time-weighted average (TWAP) over each user's irregular value
    series — the finance/sensor companion to the event-weighted EWMA
    (q_ewma_per_user): each observation holds until the next one, so
    its weight is its HOLDING TIME, and the average is the exact
    integral of the step function divided by the covered span.

    Numeric gear: int3 values x exact integer epoch seconds
    (epoch_us//1e6, the q_interpolate_linear convention) keep the
    integral an exact 64-bit integer (|v| < 2^20, spans < 2^22 s,
    ~10^3 obs -> < 2^53); ONE double division at the end. The last
    observation has no holding interval and is excluded from the
    integral on both engines.

    Scale shape: one user_id shuffle for the LEAD window, rollup on
    the same partitioning — the q_asof_join posture."""
    from pyspark.sql import Window

    base = (
        t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id",
            "ts",
            F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
            F.timestamp_diff(
                "SECOND",
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
                F.col("ts").cast("timestamp_ntz"),
            ).cast("long").alias("t_s"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "v")
    stepped = base.withColumn("next_t", F.lead("t_s").over(w))
    dt = F.col("next_t") - F.col("t_s")
    return stepped.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        (
            F.sum(F.when(F.col("next_t").isNotNull(), F.col("v") * dt))
            .cast("double")
            / F.sum(F.when(F.col("next_t").isNotNull(), dt))
        ).alias("twap_milli"),
    )
