"""AQE skew-join demonstration: the BUILT-IN runtime skew split is the
third gear of the skew toolkit, complementing the semantics-preserving
manual rewrites (`operators/skew.salted_groupby` / `salted_join` — the
plan-from-the-start gears) with Spark's adaptive post-shuffle split:
at 100 TB a hot key discovered only at runtime is exactly what
`spark.sql.adaptive.skewJoin` exists for, and this test proves the
engine's data shapes trigger it and that the split preserves results.

Planted shape: one key owning ~95% of the probe side, thresholds
lowered so the local fixture crosses the same relative bars a real
hot partition crosses in production. Assertions: (1) the executed
plan actually took the skew split (`skew=true` on the sort-merge
join), (2) the joined aggregate is bit-identical to the same join
with AQE skew handling off — the split is a physical rewrite only.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, pairs):
    old = {}
    for k, v in pairs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_frames(spark):
    # Probe side: 190k rows on key 0, 10k spread over keys 1..1000.
    hot = spark.range(190_000).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(10_000).select(
        (F.col("id") % 1000 + 1).alias("k"), F.col("id").alias("payload")
    )
    left = hot.unionByName(cold)
    right = spark.range(1001).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("dim")
    )
    return left, right


def _run(spark, skew_enabled):
    left, right = _skewed_frames(spark)
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": str(skew_enabled).lower(),
        # Lower the bars so the ~190k-row hot partition is "skewed"
        # relative to its siblings exactly as a hot TB-scale partition
        # is relative to a healthy shuffle target.
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        # Force the sort-merge path: a broadcast would dissolve the
        # skew instead of demonstrating the split.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # Keep coalescing from re-merging the split partitions.
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    with _confs(spark, confs):
        joined = left.join(right, "k").select(
            "k", (F.col("payload") + F.col("dim")).alias("v")
        )
        # Global (keyless) aggregate: partial-aggregates map-side with
        # no required hash distribution on k, so OptimizeSkewedJoin is
        # free to split the hot partition (a keyed groupBy on k right
        # above the join would suppress the split — it would invalidate
        # the reusable partitioning without forceOptimizeSkewedJoin).
        res = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.when(F.col("k") == 0, 1).otherwise(0)).alias("n_hot"),
        )
        row = tuple(res.collect()[0])
        plan = res._jdf.queryExecution().executedPlan().toString()
    return row, plan


def test_aqe_skew_join_fires_and_preserves_results(spark):
    row_split, plan_split = _run(spark, skew_enabled=True)
    row_plain, plan_plain = _run(spark, skew_enabled=False)
    assert "isFinalPlan=true" in plan_split
    assert "skew=true" in plan_split, plan_split[:2000]
    assert "skew=true" not in plan_plain
    assert row_split == row_plain
    # Sanity on the planted shape itself: the hot key really is ~95%.
    assert row_split[2] == 190_000
