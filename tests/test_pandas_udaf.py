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
