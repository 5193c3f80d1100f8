"""Curriculum bucketing (difficulty-ordered training-data bins).

Curriculum learning orders training data by a difficulty/quality
proxy and feeds it to the model in bins. The engine ships two gears
(same pattern as ``operators/dedup``'s exact/throughput modes):

- **exact** (``exact=True``): per-split ``NTILE(n)`` with an id
  tie-break — deterministic equal-count bins an external SQL oracle
  can replay bit-for-bit. A per-split total-order sort: fine at
  verification scale, a scale-killer at 100 TB (every split's rows
  funnel through one ranking sort).
- **range-bucketed** (``exact=False``, the 100 TB path): ONE
  aggregate computes per-split ``percentile_approx`` boundaries
  (n_bins-1 scalars per split — config-sized), broadcast-joins them
  back, and assigns bins with a per-row array scan. No Window, no
  sort, no per-split total order: the plan is scan -> partial agg ->
  broadcast join -> project, and the only shuffle is the
  boundary aggregate (output rows = number of splits). The trade is
  approximate bin edges: bins are equal-count only up to sketch
  accuracy, and heavily-tied quality values land in one bin.

Reference scope note: the reference pipeline (s3-rds-bq-airflow) has
no curriculum stage; this is part of the training-data extension
surface alongside mixing/packing/contamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["curriculum_buckets"]


def curriculum_buckets(
    df: DataFrame,
    *,
    quality_col: str,
    split_col: str,
    id_col: str,
    n_bins: int = 5,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Return ``df`` plus a ``difficulty_bin`` column in 1..n_bins.

    ``exact=True``: NTILE(n_bins) over (PARTITION BY split ORDER BY
    quality, id) — exact equal counts, oracle-replayable, needs a
    per-split sort.

    ``exact=False``: range-bucket on per-split ``percentile_approx``
    boundaries. bin = 1 + #{boundary b : quality > b}, so rows at or
    below the p(1/n) boundary get bin 1, etc. NULL quality rows get
    bin 1 (comparisons against NULL contribute 0). ``accuracy`` is
    the sketch knob (higher = tighter edges, more sketch memory).
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1: {n_bins}")
    if exact:
        w = Window.partitionBy(split_col).orderBy(F.col(quality_col), F.col(id_col))
        return df.withColumn("difficulty_bin", F.ntile(n_bins).over(w))

    probs = [i / n_bins for i in range(1, n_bins)]
    if not probs:  # n_bins == 1
        return df.withColumn("difficulty_bin", F.lit(1))
    bounds = df.groupBy(split_col).agg(
        F.percentile_approx(quality_col, probs, accuracy).alias("_bin_bounds")
    )
    q = F.col(quality_col)
    assigned = (
        df.join(F.broadcast(bounds), on=split_col, how="left")
        .withColumn(
            "difficulty_bin",
            F.lit(1)
            + F.aggregate(
                F.col("_bin_bounds"),
                F.lit(0),
                lambda acc, b: acc + F.when(q > b, 1).otherwise(0),
            ),
        )
        .drop("_bin_bounds")
    )
    return assigned
