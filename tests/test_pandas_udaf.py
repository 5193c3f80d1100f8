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
