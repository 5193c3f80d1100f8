"""Temporal join operators Spark SQL lacks as primitives: as-of join
and range join. Neither exists in the reference (its only join is a
key-equality MERGE, SURVEY §2.3); both are table stakes for an
event/time-series surface, so they're built Spark-first from
shuffle-friendly primitives — no UDFs, no driver loops.

As-of join — union + carry-forward:
    Tag right rows 0 and left rows 1, union on (key, time, tag),
    window-sort per key, carry the last non-null right payload
    forward, keep left rows. ONE shuffle of each input on the key —
    versus the naive equi-join + filter + row_number, which explodes
    every left row by all earlier right rows before pruning.

Range join — bucketed equi-join:
    Map right times to fixed buckets; explode each left interval to
    the buckets it covers; equi-join on (key, bucket) + residual
    range predicate. Turns an O(n*m) nested-loop into a hash join
    whose fanout is interval_len/bucket ≈ small constant.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    strict: bool = True,
    suffix: str = "asof_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_time <= left_time`` (``<`` when ``strict``) and the same
    ``on`` key. Right payload columns come back as ``{suffix}{col}``
    (null when no prior right row exists — left-outer semantics).

    ``tolerance_seconds`` (pandas ``merge_asof(tolerance=...)``
    semantics): a match older than the tolerance is treated as no
    match — the payload nulls out. Implemented as a per-row post
    filter on the carried right TIME, so the plan is unchanged (one
    shuffle per input); staleness never creates extra join work.
    """
    from pyspark.sql.types import StructField, StructType, TimestampNTZType, TimestampType

    # tag: right rows sort before left rows at equal time for
    # inclusive (<=) semantics, after them for strict (<).
    right_tag, left_tag = (1, 0) if strict else (0, 1)
    # The whole right payload travels as ONE struct so a single
    # last(ignorenulls=True) carries the latest right row atomically
    # — per-column carries would stitch fields from DIFFERENT right
    # rows whenever the most recent row holds a NULL in one payload
    # column (DuckDB ASOF JOIN takes the matched row as-is, NULLs
    # included).
    rv_type = StructType(
        [StructField("__rt", right.schema[right_time].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in right_values]
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(right_tag).alias("__tag"),
        F.struct(
            F.col(right_time).alias("__rt"), *[F.col(c) for c in right_values]
        ).alias("__rv"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(  # noqa: E741
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(left_tag).alias("__tag"),
        F.lit(None).cast(rv_type).alias("__rv"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # The tag ordering encodes the inequality: for strict (<) a right
    # row at the same __t sorts AFTER the left row and falls outside
    # the frame; for inclusive (<=) it sorts before and is carried.
    w = W.partitionBy("__k").orderBy("__t", "__tag").rowsBetween(W.unboundedPreceding, 0)
    combined = l.unionByName(r).withColumn(
        "__rv", F.last("__rv", ignorenulls=True).over(w)
    )
    out = combined.where(F.col("__tag") == left_tag)
    if tolerance_seconds is not None:
        t_type = right.schema[right_time].dataType
        if isinstance(t_type, (TimestampType, TimestampNTZType)):
            # WALL-CLOCK age (timestampdiff over NTZ), not instant
            # difference: converting NTZ through the session zone
            # would shrink/stretch ages across DST transitions and
            # diverge from the naive subtraction pandas merge_asof
            # and the DuckDB oracle perform.
            age = F.timestamp_diff(
                "MICROSECOND",
                F.col("__rv.__rt").cast("timestamp_ntz"),
                F.col("__t").cast("timestamp_ntz"),
            ).cast("double") / F.lit(1e6)
        else:
            age = (F.col("__t") - F.col("__rv.__rt")).cast("double")
        out = out.withColumn(
            "__rv", F.when(age <= F.lit(float(tolerance_seconds)), F.col("__rv"))
        )
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col(f"__rv.{c}").alias(f"{suffix}{c}") for c in right_values],
    )


def epoch_seconds(col: str | Column) -> Column:
    """Timestamp/NTZ -> WALL-CLOCK seconds since the naive epoch
    (timestampdiff over NTZ, double). Deliberately NOT an instant
    conversion: mapping naive wall times through the session zone is
    non-monotonic inside DST gaps (02:30 on a spring-forward day maps
    past 03:15), which could flip range/overlap predicates against
    the oracles' naive comparisons. Wall-clock arithmetic is
    timezone-independent and order-isomorphic to the naive timestamps
    themselves, under ANY driver session zone — including half-hour
    offsets (the tz2 robustness probe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    ).cast("double") / F.lit(1e6)


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_start: Column,
    left_end: Column,
    right_time: Column,
    bucket_seconds: int,
) -> DataFrame:
    """Equi-key + time-range join: pairs each left row with every
    right row where ``left_start <= right_time < left_end`` and keys
    match. Time expressions are epoch seconds (``epoch_seconds``).
    ``bucket_seconds`` should be on the order of the typical interval
    length (fanout = interval/bucket + 1 per left row).
    """
    lb = F.floor(left_start / bucket_seconds).cast("long")
    ub = F.floor(left_end / bucket_seconds).cast("long")
    lx = (
        left.withColumn("__ls", left_start)
        .withColumn("__le", left_end)
        .withColumn("__b", F.explode(F.sequence(lb, ub)))
    )
    rx = right.withColumn("__rt", right_time).withColumn(
        "__b", F.floor(F.col("__rt") / bucket_seconds).cast("long")
    )
    joined = lx.join(rx, on=[on, "__b"]).where(
        (F.col("__rt") >= F.col("__ls")) & (F.col("__rt") < F.col("__le"))
    )
    return joined.drop("__b", "__ls", "__le", "__rt")


def interval_overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: Column,
    left_end: Column,
    right_start: Column,
    right_end: Column,
    bucket_seconds: int,
    on: str | None = None,
    max_fanout: int | None = None,
) -> DataFrame:
    """Interval x interval OVERLAP join: pairs every left interval
    with every right interval satisfying
    ``left_start < right_end AND right_start < left_end``
    (the half-open overlap predicate), optionally also equi-keyed on
    ``on``. The interval generalization of ``range_join_binned``:
    BOTH sides explode to the fixed time buckets they cover, the join
    is an equi-join on (key, bucket) with the residual overlap
    predicate, and each pair is emitted exactly once by keeping only
    the first bucket the two intervals share (no distinct — duplicate
    input rows are preserved as distinct pairs). Fanout per row is
    interval_len/bucket + 1 — a constant when ``bucket_seconds`` is
    chosen near the typical interval length — so the nested-loop
    O(n*m) never materializes at any scale.

    Times are epoch-second expressions (``epoch_seconds``). Start/end
    land in output as ``__ls/__le/__rs/__re`` for downstream use.

    Malformed intervals (``end < start``) raise at execution rather
    than silently producing a descending ``F.sequence`` bucket list
    (which would bucket the pair wrongly and drop overlaps).

    This is the catalog's only DATA-dependent explode fanout (the
    round-10 `EXPLODE_SEQUENCE_OK` audit): one corrupt interval — an
    epoch-zero start against a current-day end is ~56 years, ~2M
    buckets at 900 s — explodes a single task. ``max_fanout`` guards
    it: any interval covering more than that many buckets raises at
    execution (same folded-into-the-used-expression discipline as the
    malformed check), so callers can pin 'no interval is longer than
    N buckets' as an executable assumption instead of a comment.
    """

    def _checked_lo(start: Column, end: Column, side: str) -> Column:
        # Folded into the USED bucket expression (not a dropped audit
        # column) so column pruning cannot optimize the check away.
        lo = F.floor(start / bucket_seconds).cast("long")
        hi = F.floor(end / bucket_seconds).cast("long")
        ok = start <= end
        why = "end < start"
        if max_fanout is not None:
            ok = ok & (hi - lo + 1 <= max_fanout)
            why = f"end < start or bucket fanout > {max_fanout}"
        return F.when(ok, lo).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_overlap_join_binned: {side} interval has "
                        f"{why} (start="
                    ),
                    F.coalesce(start.cast("string"), F.lit("NULL")),
                    F.lit(", end="),
                    F.coalesce(end.cast("string"), F.lit("NULL")),
                    F.lit(")"),
                )
            )
        )

    lb = _checked_lo(left_start, left_end, "left")
    ub = F.floor(left_end / bucket_seconds).cast("long")
    lx = (
        left.withColumn("__ls", left_start)
        .withColumn("__le", left_end)
        .withColumn("__b", F.explode(F.sequence(lb, ub)))
    )
    rb = _checked_lo(right_start, right_end, "right")
    rub = F.floor(right_end / bucket_seconds).cast("long")
    rx = (
        right.withColumn("__rs", right_start)
        .withColumn("__re", right_end)
        .withColumn("__b", F.explode(F.sequence(rb, rub)))
    )
    keys = ["__b"] if on is None else [on, "__b"]
    # A pair overlapping k buckets would emit k times; keep only the
    # FIRST bucket both intervals cover — floor(max(start,start)/b) —
    # so each pair emits exactly once. This replaces a full-row
    # distinct(), which would both shuffle every carried column over
    # the fanned-out join output AND silently collapse genuinely
    # duplicate input rows (two identical measurement intervals must
    # yield two pairs).
    first_common = F.floor(
        F.greatest(F.col("__ls"), F.col("__rs")) / bucket_seconds
    ).cast("long")
    joined = (
        lx.join(rx, on=keys)
        .where((F.col("__ls") < F.col("__re")) & (F.col("__rs") < F.col("__le")))
        .where(F.col("__b") == first_common)
        .drop("__b")
    )
    return joined


def _merge_count(
    queries: DataFrame,
    q_value: Column,
    points: DataFrame,
    p_value: Column,
    *,
    key_cols: Sequence[str],
    count_col: str,
    ties_count: bool,
    bin_seconds: int,
) -> DataFrame:
    """Per query row, |{p in points : p_value < q_value}| (or <= when
    ``ties_count``) — the sorted-merge rank count, distributed.

    Shape: both sides land in fixed time bins; a per-bin running sum
    over the unioned (value, flag) stream counts same-bin points, and
    a prefix sum over the (bounded, calendar-sized) per-bin totals
    adds the earlier bins. Two shuffles on the bin, ZERO
    query x point pairs. Tie handling is the flag's sort position:
    points sort after queries at equal value for strict <, before for
    <=; among themselves, equal-value rows are order-free (points all
    increment, queries all read the same running value).

    NULL handling (round-9 advisor catch): a NULL value floors into a
    NULL bin that sorts FIRST under the cross-bin prefix's ascending
    order, so its weight would silently inflate EVERY real bin's
    prefix. NULL points are therefore dropped (a point with no value
    can never satisfy ``p < q``), and a NULL query value raises at
    execution — a rank query without a value has no defined answer,
    and raising beats returning a poisoned count (the
    interval_overlap_join_binned malformed-input convention).
    """
    checked_q = F.when(q_value.isNotNull(), q_value.cast("double")).otherwise(
        F.raise_error(F.lit("_merge_count: query value is NULL"))
    )
    qrows = queries.select(
        *key_cols, checked_q.alias("__v"), F.lit(0).alias("__w")
    )
    prows = points.where(p_value.isNotNull()).select(
        *[F.lit(None).cast(queries.schema[c].dataType).alias(c) for c in key_cols],
        p_value.cast("double").alias("__v"),
        F.lit(1).alias("__w"),
    )
    u = qrows.unionByName(prows).withColumn(
        "__bin", F.floor(F.col("__v") / bin_seconds).cast("long")
    )
    order_w = F.col("__w").desc() if ties_count else F.col("__w").asc()
    within = F.sum("__w").over(
        W.partitionBy("__bin")
        .orderBy(F.col("__v").asc(), order_w)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    counted = u.withColumn("__within", within).where(F.col("__w") == 0)
    # Cross-bin prefix: totals per bin (one row per OCCUPIED bin — a
    # calendar/bin_seconds-bounded domain, not a row count), running
    # sum over the bin order, shifted so a bin sees only EARLIER
    # bins. Every query row's bin is present by construction (its own
    # union row occupies it), so the equi-join below never misses.
    prefix = (
        u.groupBy("__bin")
        .agg(F.sum("__w").alias("__bin_cnt"))
        .withColumn(
            "__before",
            F.coalesce(
                F.sum("__bin_cnt").over(
                    W.orderBy("__bin").rowsBetween(
                        W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__bin", "__before")
    )
    return (
        counted.join(F.broadcast(prefix), "__bin")
        .select(
            *key_cols,
            (F.col("__within") + F.col("__before")).cast("long").alias(count_col),
        )
    )


def interval_overlap_count_rank(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: Column,
    left_end: Column,
    right_start: Column,
    right_end: Column,
    key_cols: Sequence[str],
    count_col: str = "n_overlaps",
    bin_seconds: int = 900,
) -> DataFrame:
    """Per left interval, the COUNT of right intervals it overlaps
    (``left_start < right_end AND right_start < left_end``) — without
    materializing a single (left, right) pair.

    `interval_overlap_join_binned` is the right operator when the
    PAIRS are the output; for a pure count it is quadratic in effect
    whenever the right side is global/hot — every left interval
    joins all concurrent right intervals, so the intermediate pair
    stream grows ~SF^2 even though the counted output is linear
    (found by the round-9 full-catalog sf10 campaign: the engine side
    of q_interval_overlap ran 15+ minutes at sf10). The count
    decomposes into two RANK lookups instead:

        overlaps(L) = |{R : R.start < L.end}| - |{R : R.end <= L.start}|

    (the second set is a subset of the first — R.end <= L.start with
    R.start <= R.end <= L.start <= L.end can only violate
    R.start < L.end when ALL FOUR endpoints are equal, i.e. a
    zero-length right interval sitting exactly on a zero-length left
    interval; that one case is repaired by an exact correction term
    below, so the difference is exactly the overlap count for every
    well-formed input including degenerate intervals — found by the
    round-10 hypothesis law, invisible to the lattice unit test and
    every tested SF.)
    Each lookup is a `_merge_count`: two bin-shuffles + per-bin
    running sums, O((n+m) log) work, zero pairs. ``bin_seconds`` is a
    pure parallelism grain (finer bins = smaller window partitions),
    decoupled from any interval length — unlike the pair join's
    bucket, which trades fanout against bucket occupancy.

    ``key_cols`` must uniquely key ``left``. Zero-count intervals
    come out naturally (both ranks equal) — no zero-union pass.

    PRECONDITION (round-9 advisor catch): the rank decomposition's
    subset argument requires well-formed intervals on BOTH sides —
    ``R.end <= L.start`` is a subset of ``R.start < L.end`` only when
    ``R.start <= R.end``, so a malformed right interval would make
    the difference silently wrong (even negative). Both sides now
    raise at execution on ``end < start`` or NULL endpoints, folded
    into the USED value expressions so column pruning cannot drop the
    check — the same convention (and failure mode rationale) as
    `interval_overlap_join_binned`.

    The validated left projection is persisted inside the operator:
    both rank lookups scan it, and without the persist the caller's
    upstream plan (e.g. q_interval_overlap's spans groupBy over the
    full events table) executes twice (the semantic_dedup_keep_one
    persist rationale; the handful-of-columns projection is tiny
    relative to recomputing the upstream plan).

    Cache lifetime (the similarity.py persist convention): the
    operator returns a LAZY frame, so it cannot unpersist at the
    right moment itself — the blocks stay registered until the
    session ends or the block manager LRU-evicts them (the default
    MEMORY_AND_DISK level is evictable; an evicted block recomputes,
    it does not fail). Callers looping this operator over many
    inputs and needing deterministic release can
    ``spark.catalog.clearCache()`` between calls."""

    def _checked(primary: Column, start: Column, end: Column, side: str) -> Column:
        # NULL start/end fails the <= and lands in the raise branch;
        # the message coalesces NULL casts so concat can't null the
        # whole error string away.
        return F.when(start <= end, primary).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_overlap_count_rank: {side} interval has "
                        "end < start or NULL endpoint (start="
                    ),
                    F.coalesce(start.cast("string"), F.lit("NULL")),
                    F.lit(", end="),
                    F.coalesce(end.cast("string"), F.lit("NULL")),
                    F.lit(")"),
                )
            )
        )

    lv = left.select(
        *key_cols,
        _checked(left_start, left_start, left_end, "left").alias("__l_start"),
        _checked(left_end, left_start, left_end, "left").alias("__l_end"),
    ).persist()
    rv = right.select(
        _checked(right_start, right_start, right_end, "right").alias("__r_start"),
        _checked(right_end, right_start, right_end, "right").alias("__r_end"),
    )
    starts = _merge_count(
        lv,
        F.col("__l_end"),
        rv.select(F.col("__r_start").alias("__p")),
        F.col("__p"),
        key_cols=key_cols,
        count_col="__lt_end",
        ties_count=False,
        bin_seconds=bin_seconds,
    )
    ends = _merge_count(
        lv,
        F.col("__l_start"),
        rv.select(F.col("__r_end").alias("__p")),
        F.col("__p"),
        key_cols=key_cols,
        count_col="__le_start",
        ties_count=True,
        bin_seconds=bin_seconds,
    )
    # Degenerate-coincidence correction: a zero-length right at point
    # p is counted by the <=-rank but not the <-rank when the left is
    # ALSO zero-length at exactly p (see docstring) — add those back.
    # Pair-free: degenerate rights aggregate to one count per distinct
    # point (empty on typical data), then equi-join on the point
    # against the (usually tiny) degenerate-left slice.
    deg_r = (
        rv.where(F.col("__r_start") == F.col("__r_end"))
        .groupBy(F.col("__r_start").cast("double").alias("__p"))
        .agg(F.count(F.lit(1)).alias("__deg_cnt"))
    )
    deg_l = lv.where(F.col("__l_start") == F.col("__l_end")).select(
        *key_cols, F.col("__l_start").cast("double").alias("__p")
    )
    # Size-planned join (no broadcast hint — deg_r is data-dependent;
    # on typical data both slices are empty and AQE collapses this).
    corr = deg_l.join(deg_r, "__p").select(*key_cols, F.col("__deg_cnt"))
    return (
        starts.join(ends, list(key_cols))
        .join(corr, list(key_cols), "left")
        .select(
            *key_cols,
            (
                F.col("__lt_end")
                - F.col("__le_start")
                + F.coalesce(F.col("__deg_cnt"), F.lit(0))
            )
            .cast("long")
            .alias(count_col),
        )
    )
