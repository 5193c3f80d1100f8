"""Two-pass Misra-Gries heavy hitters: exactness under any
partitioning, the candidate superset guarantee, and parameter
validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators.heavyhitters import heavy_hitters_two_pass


def _exact_heavies(df, inv_phi):
    total = df.count()
    return {
        (r["item"], r["n"])
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["n"] * inv_phi > total
    }


@pytest.fixture(scope="module")
def skewed(spark):
    """Skewed synthetic items: item_i appears 2i+1 times (i =
    floor(sqrt(id)), N=1000), so items i >= 25 are true heavy
    hitters above 1/20 and the rest a long tail below."""
    return spark.range(0, 1000).select(
        F.concat(
            F.lit("item_"),
            F.floor(F.sqrt(F.col("id").cast("double"))).cast("long").cast("string"),
        ).alias("item")
    )


def test_matches_exact_computation(skewed):
    got = {
        (r["item"], r["n"])
        for r in heavy_hitters_two_pass(skewed, "item", inv_phi=20).collect()
    }
    assert got == _exact_heavies(skewed, 20)
    assert got, "fixture must contain true heavy hitters"


def test_partitioning_invariance(skewed):
    """The sketch pass is partitioning-dependent; the OUTPUT must not
    be. Repartitioning (including pathological single/many-partition
    layouts) cannot change the result set."""
    base = {
        (r["item"], r["n"])
        for r in heavy_hitters_two_pass(skewed, "item", inv_phi=20).collect()
    }
    for parts in (1, 7, 64):
        got = {
            (r["item"], r["n"])
            for r in heavy_hitters_two_pass(
                skewed.repartition(parts), "item", inv_phi=20
            ).collect()
        }
        assert got == base, parts


def test_tight_counter_budget_still_exact(skewed):
    """k at the guarantee floor (k == inv_phi) must still return the
    exact answer — the superset shrinks, never below the truth."""
    got = {
        (r["item"], r["n"])
        for r in heavy_hitters_two_pass(skewed, "item", inv_phi=20, k=20).collect()
    }
    assert got == _exact_heavies(skewed, 20)


def test_k_below_inv_phi_rejected(skewed):
    with pytest.raises(ValueError):
        heavy_hitters_two_pass(skewed, "item", inv_phi=20, k=10)


def test_threshold_is_strict_integer_comparison(spark):
    """n * inv_phi > total — an item at EXACTLY total/inv_phi is NOT
    a heavy hitter (strict), decided in integers with no float phi."""
    df = spark.range(0, 100).select(
        F.when(F.col("id") < 5, "edge").otherwise(F.concat(F.lit("t"), F.col("id").cast("string"))).alias("item")
    )
    # "edge" has n=5, total=100, inv_phi=20: 5*20 = 100, not > 100
    got = {r["item"] for r in heavy_hitters_two_pass(df, "item", inv_phi=20).collect()}
    assert "edge" not in got
