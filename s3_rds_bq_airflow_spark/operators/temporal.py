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
            age = (
                F.unix_micros(F.col("__t").cast("timestamp"))
                - F.unix_micros(F.col("__rv.__rt").cast("timestamp"))
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
    """Timestamp/NTZ -> exact epoch seconds (double). NTZ values are
    pinned through the session zone identically on both sides of a
    join, so bucket arithmetic stays consistent under any timezone."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp")).cast("double") / F.lit(1e6)


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
) -> DataFrame:
    """Interval x interval OVERLAP join: pairs every left interval
    with every right interval satisfying
    ``left_start < right_end AND right_start < left_end``
    (the half-open overlap predicate), optionally also equi-keyed on
    ``on``. The interval generalization of ``range_join_binned``:
    BOTH sides explode to the fixed time buckets they cover, the join
    is an equi-join on (key, bucket) with the residual overlap
    predicate, and pairs sharing several buckets are deduplicated by
    a distinct on the carried columns. Fanout per row is
    interval_len/bucket + 1 — a constant when ``bucket_seconds`` is
    chosen near the typical interval length — so the nested-loop
    O(n*m) never materializes at any scale.

    Times are epoch-second expressions (``epoch_seconds``). Start/end
    land in output as ``__ls/__le/__rs/__re`` for downstream use.
    """
    lb = F.floor(left_start / bucket_seconds).cast("long")
    ub = F.floor(left_end / bucket_seconds).cast("long")
    lx = (
        left.withColumn("__ls", left_start)
        .withColumn("__le", left_end)
        .withColumn("__b", F.explode(F.sequence(lb, ub)))
    )
    rb = F.floor(right_start / bucket_seconds).cast("long")
    rub = F.floor(right_end / bucket_seconds).cast("long")
    rx = (
        right.withColumn("__rs", right_start)
        .withColumn("__re", right_end)
        .withColumn("__b", F.explode(F.sequence(rb, rub)))
    )
    keys = ["__b"] if on is None else [on, "__b"]
    joined = (
        lx.join(rx, on=keys)
        .where((F.col("__ls") < F.col("__re")) & (F.col("__rs") < F.col("__le")))
        .drop("__b")
        .distinct()  # a pair overlaps in interval_len/bucket buckets
    )
    return joined
