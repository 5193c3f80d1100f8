"""Exact distributed running totals / global ranks without a
single-partition window.

``ORDER BY value`` windows with no PARTITION BY (cumulative revenue,
global rank) plan as ``Exchange SinglePartition -> Sort -> Window``:
the entire relation funnels through ONE task, so the operator stops
being distributed regardless of cluster size. At fact-linked
dimension cardinality (~10^9 customers behind a 100 TB order log)
that one task is the job.

This operator computes the SAME exact values with a two-level
range-bucket plan — the ``operators/curriculum`` discipline, upgraded
from approximate bins to exact global order statistics:

1. ONE aggregate sketches ``n_buckets-1`` approx-percentile split
   points of the order value (config-sized scalar array, broadcast).
2. Each row is assigned a bucket by counting boundaries below its
   value — a per-row array scan in codegen. Equal values always land
   in the same bucket, so buckets partition the total order into
   contiguous ranges: every row of bucket k precedes every row of
   bucket k+1 in ASC order (resp. follows, in DESC order).
3. Per-bucket SUM/COUNT roll up (bucket-count-sized relation); each
   bucket's prefix offset = the triangular sum of the buckets before
   it in iteration order — a broadcast self-join over <= n_buckets
   rows, no window, no collect.
4. A window PARTITIONED BY bucket (parallel across buckets) ranks
   within each range; global cum / index = broadcast offset +
   within-bucket running value.

Sketch error only skews bucket SIZES, never correctness: boundaries
are just split points and the within-bucket order completes the exact
total order. ``n_buckets`` is the scale knob — it bounds per-task sort
size at roughly ``rows / n_buckets`` and should grow with the data
(64 here; thousands on a real cluster).

Reference scope note: the reference pipeline has no ranking stage at
all; this is scale posture for the rebuild's own analytic surface
(ABC/Pareto, Gini/Lorenz).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["ordered_running"]


def ordered_running(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    *,
    descending: bool = False,
    n_buckets: int = 64,
    accuracy: int = 10_000,
    cum_col: str | None = None,
    index_col: str | None = None,
    cum_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Return ``df`` plus exact global order statistics over
    ``ORDER BY value_col {ASC|DESC}, tiebreak_col ASC``:

    - ``cum_col``: running SUM(value_col) as DECIMAL(38,0) (inclusive
      of the current row) — exact for integer-valued columns.
    - ``index_col``: 1-based global ROW_NUMBER.
    - ``cum_cols``: ``{output: source}`` running sums of OTHER columns
      along the same global order (e.g. the two per-sample counters of
      a KS ECDF) — same exactness, one shared bucket pipeline.

    Values are bit-identical to the single-partition
    ``Window.orderBy(...)`` plan; the physical plan is not — no
    ``Exchange SinglePartition`` feeds any Window (pinned by
    ``plans.assert_no_single_partition_window``).
    """
    sums: dict[str, str] = dict(cum_cols or {})
    if cum_col is not None:
        sums[cum_col] = value_col
    if not sums and index_col is None:
        raise ValueError("request at least one of cum_col / index_col / cum_cols")
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2: {n_buckets}")

    v = F.col(value_col)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        F.percentile_approx(value_col, probs, accuracy).alias("_rb_bounds")
    )
    # Ascending bucket id: #{boundary b : value > b}. Equal values can
    # never straddle a boundary, so (value ASC) == (_bkt ASC) up to
    # within-bucket order. NULL-safe coalesce covers the empty-input
    # sketch (NULL boundary array -> bucket 0).
    bucketed = (
        df.join(F.broadcast(bounds))
        .withColumn(
            "_bkt",
            F.coalesce(
                F.aggregate(
                    F.col("_rb_bounds"),
                    F.lit(0),
                    lambda acc, b: acc + F.when(v > b, 1).otherwise(0),
                ),
                F.lit(0),
            ),
        )
        .drop("_rb_bounds")
    )
    btot = bucketed.groupBy("_bkt").agg(
        F.count(F.lit(1)).alias("_bcnt"),
        *[
            F.sum(F.col(src).cast("decimal(38,0)")).alias(f"_bsum_{out}")
            for out, src in sums.items()
        ],
    )
    # Prefix offsets: buckets strictly BEFORE this one in iteration
    # order (DESC iterates high buckets first). Triangular broadcast
    # self-join over <= n_buckets rows — config-sized by construction.
    left, right = btot.alias("l"), btot.alias("r")
    before = (
        F.col("r._bkt") > F.col("l._bkt")
        if descending
        else F.col("r._bkt") < F.col("l._bkt")
    )
    off = (
        left.join(F.broadcast(right), before, "left")
        .groupBy(F.col("l._bkt").alias("_bkt"))
        .agg(
            F.coalesce(F.sum("r._bcnt"), F.lit(0)).cast("long").alias("_cnt_off"),
            *[
                F.coalesce(
                    F.sum(f"r._bsum_{out}"), F.lit(0).cast("decimal(38,0)")
                ).alias(f"_sum_off_{out}")
                for out in sums
            ],
        )
    )
    order = [v.desc() if descending else v.asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy("_bkt").orderBy(*order)
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    out = bucketed.join(F.broadcast(off), "_bkt")
    for out_col, src in sums.items():
        out = out.withColumn(
            out_col,
            (
                F.col(f"_sum_off_{out_col}")
                + F.sum(F.col(src).cast("decimal(38,0)")).over(running)
            ).cast("decimal(38,0)"),
        )
    if index_col is not None:
        out = out.withColumn(
            index_col, F.col("_cnt_off") + F.row_number().over(w)
        )
    return out.drop(
        "_bkt", "_cnt_off", *[f"_sum_off_{out_col}" for out_col in sums]
    )
