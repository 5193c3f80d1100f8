"""Grouped applyInPandas UDAF: the pandas-side OLS must agree with
the closed-form JVM computation from exact sums."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.io.tables import load_table
from s3_rds_bq_airflow_spark.operators.pandas_udaf import grouped_ols


def test_grouped_ols_matches_jvm_closed_form(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r["l_returnflag"]: r
        for r in grouped_ols(
            li, group_col="l_returnflag", x_col="l_quantity", y_col="l_extendedprice"
        ).collect()
    }
    want = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("sx"),
            F.sum("l_extendedprice").alias("sy"),
            F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
            F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for flag, w in want.items():
        g = got[flag]
        n, sx, sy, sxx, sxy = w["n"], w["sx"], w["sy"], w["sxx"], w["sxy"]
        slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
        intercept = sy / n - slope * sx / n
        assert g["n"] == n
        assert math.isclose(g["slope"], slope, rel_tol=1e-9)
        assert math.isclose(g["intercept"], intercept, rel_tol=1e-9)
        assert 0.0 <= g["r2"] <= 1.0


def test_grouped_ols_moments_equals_pandas_gear(spark, sf_dir):
    """The distributed-moments scale gear and the pandas surface gear
    must agree numerically on the same (bounded) input — two
    algebraically equivalent forms of the same fit."""
    from s3_rds_bq_airflow_spark.operators.pandas_udaf import grouped_ols_moments

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    got = {
        r["l_returnflag"]: r
        for r in grouped_ols_moments(
            li, group_col="l_returnflag", x_col="x", y_col="y",
            sum_type="decimal(18,6)",
        ).collect()
    }
    want = {
        r["l_returnflag"]: r
        for r in grouped_ols(li, group_col="l_returnflag", x_col="x", y_col="y").collect()
    }
    assert set(got) == set(want)
    for flag, w in want.items():
        g = got[flag]
        assert g["n"] == w["n"]
        assert math.isclose(g["slope"], w["slope"], rel_tol=1e-9)
        assert math.isclose(g["intercept"], w["intercept"], rel_tol=1e-9)
        assert math.isclose(g["r2"], w["r2"], rel_tol=1e-9)


def test_grouped_ols_moments_degenerate_groups(spark):
    """Zero x-variance -> slope 0 / intercept mean(y); zero
    y-variance too -> R^2 1 (the grouped_ols conventions)."""
    from s3_rds_bq_airflow_spark.operators.pandas_udaf import grouped_ols_moments

    df = spark.createDataFrame(
        [("a", 5.0, 1.0), ("a", 5.0, 3.0), ("b", 2.0, 9.0), ("b", 2.0, 9.0)],
        ["g", "x", "y"],
    )
    got = {
        r["g"]: r
        for r in grouped_ols_moments(df, group_col="g", x_col="x", y_col="y").collect()
    }
    assert got["a"]["slope"] == 0.0 and math.isclose(got["a"]["intercept"], 2.0)
    assert got["a"]["r2"] == 0.0  # constant x, varying y: explains nothing
    assert got["b"]["slope"] == 0.0 and math.isclose(got["b"]["intercept"], 9.0)
    assert got["b"]["r2"] == 1.0  # constant y: trivially explained


def test_bottom_k_by_md5_salt_invariant(spark):
    """The two-phase cap equals the plain single-sort bottom-k for
    ANY salt width — the property that lets a SQL oracle replay it as
    one ROW_NUMBER() <= k."""
    from pyspark.sql import Window as W

    from s3_rds_bq_airflow_spark.queries._util import bottom_k_by_md5

    df = spark.createDataFrame(
        [(i % 3, i) for i in range(500)], ["g", "rid"]
    )
    plain = W.partitionBy("g").orderBy(
        F.md5(F.col("rid").cast("string")).asc(), F.col("rid").asc()
    )
    want = sorted(
        map(
            tuple,
            df.withColumn("rk", F.row_number().over(plain))
            .where(F.col("rk") <= 40)
            .drop("rk")
            .collect(),
        )
    )
    for width in (1, 4, 16):
        got = sorted(
            map(
                tuple,
                bottom_k_by_md5(
                    df, group_cols=("g",), id_col="rid", k=40, salt_width=width
                ).collect(),
            )
        )
        assert got == want, f"salt width {width} changed the capped set"


def test_cogrouped_asof_equals_jvm_asof(spark, sf_dir):
    """cogroup().applyInPandas(merge_asof) must equal the JVM
    union+carry-forward as-of join on the events/purchases pairing."""
    from s3_rds_bq_airflow_spark.operators.pandas_udaf import cogrouped_asof_merge
    from s3_rds_bq_airflow_spark.operators.temporal import asof_join

    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    purchases = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("timestamp").alias("pts"), "value")
    )
    got = (
        cogrouped_asof_merge(
            events, purchases,
            key_col="user_id", left_time="ts", right_time="pts", right_value="value",
        )
        .toPandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    want = (
        asof_join(
            events,
            purchases.select("user_id", F.col("pts").alias("rts"), "value"),
            on="user_id", left_time="ts", right_time="rts",
            right_values=["value"], strict=True,
        )
        .select("user_id", "ts", F.col("asof_value").cast("double").alias("asof_value"))
        .toPandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    import pandas as _pd

    _pd.testing.assert_frame_equal(got, want, check_like=True)


def test_grouped_ols_moments_raises_on_null_input(spark):
    """n counts every group row while F.sum skips NULLs — a NULL x/y
    would silently fit a line over inconsistent moments, so the
    folded check raises instead (round-10 advisor note; the temporal
    operators' convention)."""
    import pytest

    from s3_rds_bq_airflow_spark.operators.pandas_udaf import grouped_ols_moments

    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", None, 4.0)], "g string, x double, y double"
    )
    with pytest.raises(Exception, match="NULL in column 'x'"):
        grouped_ols_moments(df, group_col="g", x_col="x", y_col="y").collect()

    df2 = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 3.0, None)], "g string, x double, y double"
    )
    with pytest.raises(Exception, match="NULL in column 'y'"):
        grouped_ols_moments(df2, group_col="g", x_col="x", y_col="y").collect()
