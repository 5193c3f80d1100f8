"""Mergeable histogram quantile state (the sketch tier of
``incremental_agg``).

Percentiles don't decompose like sum/min/max, so a materialized
rollup that needs p50/p95 must carry a MERGEABLE sketch as state.
The classic choice is a t-digest; this engine deliberately uses a
fixed-range equi-width histogram instead, because the engine's
contract is bit-stable results under any partitioning — t-digest
centroids depend on merge order (partial merges are not associative
in the value), while histogram bin counts are plain sums: exactly
associative, exactly commutative, and — unlike a t-digest — the
whole estimator is SQL-expressible, so the driver's DuckDB oracle
can check it value-for-value.

State per key: ``array<long>`` of ``n_bins + 2`` counts
(index 0 = underflow, 1..n_bins = [lo, hi) equi-width bins,
n_bins+1 = overflow). Estimates are lower bin edges — deterministic,
with error bounded by one bin width (pin ``(hi-lo)/n_bins`` to the
precision the dashboard needs). Everything is JVM column
expressions; merging ships n_bins+2 longs per key, never raw values
— at 100 TB the state is key-count-sized, history-independent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

__all__ = [
    "histogram_state",
    "merge_histogram_states",
    "histogram_quantiles",
    "incremental_histogram",
]


def _bin_expr(value: Column, *, lo: float, hi: float, n_bins: int) -> Column:
    width = (hi - lo) / n_bins
    return (
        F.when(value < F.lit(lo), F.lit(0))
        .when(value >= F.lit(hi), F.lit(n_bins + 1))
        .otherwise((F.floor((value - F.lit(lo)) / F.lit(width)) + 1).cast("int"))
    )


def histogram_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Build per-key histogram state: (keys..., hist array<long>).

    One groupBy shuffle of (keys, bin) pairs; NULL values are ignored
    (like every SQL aggregate). The dense array is assembled from the
    sparse (bin, count) map per key — map order is irrelevant, so the
    result is partitioning-independent.
    """
    counts = df.where(F.col(value_col).isNotNull()).groupBy(
        *keys, _bin_expr(F.col(value_col), lo=lo, hi=hi, n_bins=n_bins).alias("__bin")
    ).agg(F.count(F.lit(1)).alias("__cnt"))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_bins + 1)),
        lambda i: F.coalesce(F.element_at("__m", i), F.lit(0).cast("long")),
    )
    return (
        counts.groupBy(*keys)
        .agg(
            F.map_from_entries(F.collect_list(F.struct("__bin", "__cnt"))).alias("__m")
        )
        .select(*keys, dense.alias("hist"))
    )


def merge_histogram_states(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Merge any number of compatible states: element-wise sum of the
    count arrays per key. Exactly associative/commutative — merge
    order can never change a count. Implemented as posexplode +
    re-assemble so the shuffle payload is (key, bin) rows, not whole
    arrays through a reduce."""
    if not states:
        raise ValueError("no states to merge")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    exploded = unioned.select(*keys, F.posexplode("hist").alias("__bin", "__cnt"))
    summed = exploded.groupBy(*keys, "__bin").agg(F.sum("__cnt").alias("__cnt"))
    # Rebuild preserving the original array length (max bin index + 1;
    # posexplode emits every index, zeros included, so this is exact).
    return (
        summed.groupBy(*keys)
        .agg(
            F.map_from_entries(F.collect_list(F.struct("__bin", "__cnt"))).alias("__m0"),
            (F.max("__bin") + 1).alias("__n"),
        )
        .select(
            *keys,
            F.transform(
                F.sequence(F.lit(0), F.col("__n") - 1),
                lambda i: F.coalesce(F.element_at("__m0", i), F.lit(0).cast("long")),
            ).alias("hist"),
        )
    )


def histogram_quantiles(
    state: DataFrame,
    keys: Sequence[str],
    quantiles: Sequence[float],
    *,
    lo: float,
    hi: float,
) -> DataFrame:
    """Quantile estimates from histogram state: for each q, the lower
    edge of the first bin whose cumulative count reaches
    ``ceil(q * total)``. Deterministic; error <= one bin width.
    Underflow resolves to ``lo`` minus one width (callers with
    in-range data never see it); overflow to ``hi``."""
    exploded = state.select(*keys, F.posexplode("hist").alias("__bin", "__cnt"))
    wk = W.partitionBy(*keys)
    cum = exploded.withColumn(
        "__cum", F.sum("__cnt").over(wk.orderBy("__bin"))
    ).withColumn("__total", F.sum("__cnt").over(wk)).withColumn(
        "__width", (F.lit(hi) - F.lit(lo)) / (F.max("__bin").over(wk) - 1)
    )
    edge = F.lit(lo) + (F.col("__bin") - 1) * F.col("__width")
    aggs = [
        F.min(
            F.when(
                F.col("__cum") >= F.ceil(F.lit(float(q)) * F.col("__total")),
                F.least(edge, F.lit(hi)),
            )
        ).alias(f"p{str(q).replace('0.', '').ljust(2, '0')}_est")
        for q in quantiles
    ]
    return cum.groupBy(*keys).agg(*aggs)


def incremental_histogram(
    spark,
    state_path: str,
    batch: DataFrame,
    *,
    keys: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Fold one batch into persisted histogram state (the sketch tier
    of ``incremental_agg.incremental_aggregate``): read state, merge
    the batch's partial, atomically swap. Each refresh costs
    O(|batch| + |state|) — percentile dashboards over unbounded
    history without ever re-scanning it. Also the foreachBatch body
    for the streaming path (see tests/test_histogram.py)."""
    import os

    from ..io.atomic import swap_directory

    update = histogram_state(batch, keys, value_col, lo=lo, hi=hi, n_bins=n_bins)
    if os.path.exists(state_path):
        state = spark.read.parquet(state_path)
        merged = merge_histogram_states([state, update], keys)
    else:
        merged = update
    tmp = state_path.rstrip("/") + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    swap_directory(tmp, state_path)
    return spark.read.parquet(state_path)
