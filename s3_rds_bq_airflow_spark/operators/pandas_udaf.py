"""Grouped pandas UDAF surface (``applyInPandas``).

Policy (SURVEY §2.10 + SCALE.md): aggregations stay JVM-side unless
the per-group logic genuinely needs a numerical library. This module
is the template for that case — each group arrives as ONE Arrow-backed
pandas DataFrame, runs vectorized numpy, and returns a typed result
frame. Shuffle is by group key (same as groupBy); memory needs one
group per task, so keys must be reasonably sized or pre-salted.

The example computes a per-group OLS fit — the kind of per-entity
model step a training-data pipeline runs after the relational heavy
lifting.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_ols(
    df: DataFrame,
    *,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group least-squares line y = slope*x + intercept (plus n
    and R^2), one Arrow batch per group."""
    out_schema = T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("slope", T.DoubleType()),
            T.StructField("intercept", T.DoubleType()),
            T.StructField("r2", T.DoubleType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        n = len(x)
        mx, my = x.mean(), y.mean()
        sxx = ((x - mx) ** 2).sum()
        sxy = ((x - mx) * (y - my)).sum()
        slope = sxy / sxx if sxx else 0.0
        intercept = my - slope * mx
        ss_res = ((y - (slope * x + intercept)) ** 2).sum()
        ss_tot = ((y - my) ** 2).sum()
        r2 = 1.0 - ss_res / ss_tot if ss_tot else 1.0
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [n],
                "slope": [slope],
                "intercept": [intercept],
                "r2": [r2],
            }
        )

    return df.select(group_col, x_col, y_col).groupBy(group_col).applyInPandas(fit, out_schema)


def cogrouped_asof_merge(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str,
    left_time: str,
    right_time: str,
    right_value: str,
) -> DataFrame:
    """Cogrouped-map surface (``cogroup().applyInPandas``): both
    inputs shuffle on the key once; each key's pair of pandas frames
    meets in one Python worker — here running ``pd.merge_asof``
    (backward, strict) as the pandas twin of
    ``operators/temporal.asof_join``. Use the JVM as-of for scale;
    this is the template for per-key logic that genuinely needs
    pandas (and the test pins the two implementations equal).
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField(left_time, T.TimestampType()),
            T.StructField(f"asof_{right_value}", T.DoubleType()),
        ]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_time)
        if rpdf.empty:
            out = lpdf[[key_col, left_time]].copy()
            out[f"asof_{right_value}"] = None
            return out
        rpdf = rpdf.sort_values(right_time)
        merged = pd.merge_asof(
            lpdf[[key_col, left_time]],
            rpdf[[right_time, right_value]],
            left_on=left_time,
            right_on=right_time,
            direction="backward",
            allow_exact_matches=False,
        )
        return pd.DataFrame(
            {
                key_col: merged[key_col],
                left_time: merged[left_time],
                f"asof_{right_value}": merged[right_value],
            }
        )

    return (
        left.groupBy(key_col)
        .cogroup(right.groupBy(key_col))
        .applyInPandas(merge, out_schema)
    )
