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
