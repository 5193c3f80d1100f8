"""Per-group model fitting: a distributed-moments scale gear plus the
grouped pandas UDAF surface (``applyInPandas``).

Policy (SURVEY §2.10 + SCALE.md): aggregations stay JVM-side unless
the per-group logic genuinely needs a numerical library. OLS does
NOT — it decomposes into six moment sums, so the scale gear
(`grouped_ols_moments`) is a plain codegen groupBy/agg with finish
expressions: map-side partial aggregation, no Python, group payload
one accumulator row regardless of group size. The pandas surface
(`grouped_ols`) remains as the TEMPLATE for per-group logic that
genuinely needs a library — but ``applyInPandas`` materializes each
group as ONE Arrow-backed pandas frame in one Python worker, so its
callers MUST bound group payloads (a config-sized key, or a
deterministic cap like `queries/_util.bottom_k_by_md5`) — enforced
catalog-wide by the grouped-pandas audit in
tests/test_collect_audit.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def grouped_ols_moments(
    df: DataFrame,
    *,
    group_col: str,
    x_col: str,
    y_col: str,
    sum_type: str = "decimal(18,6)",
) -> DataFrame:
    """Per-group OLS as DISTRIBUTED moment aggregates — the scale
    gear for `grouped_ols`: slope, intercept and R^2 all derive from
    {n, Σx, Σy, Σxy, Σx², Σy²}, which partial-aggregate map-side and
    shuffle ONE row per group, so a 3-value group key over a 100 TB
    fact table is three accumulator rows, not three whole-table
    pandas frames.

    Determinism (the _util.py convention): inputs are cast to
    ``sum_type`` decimals so every sum is EXACT and order-independent
    (products at scale 12 stay within decimal(38)); only the final
    sums are cast to double, and the closed-form expressions below
    are plain IEEE scalar ops — bit-replayable by a SQL oracle that
    mirrors the same expression tree. Degenerate groups follow
    `grouped_ols`: zero x-variance -> slope 0, intercept = mean(y);
    zero y-variance (given slope 0) -> R^2 1.

    NULL x/y raises (the temporal operators' folded-check
    convention): ``n`` counts every group row while ``F.sum`` skips
    NULLs, so a NULL input would silently fit a line over
    INCONSISTENT moments (n includes rows the sums exclude) — the
    check rides the used cast expression so column pruning can't
    drop it."""

    def _d(c: str) -> Column:
        # Folded into the USED sum input (not a dropped audit column):
        # a NULL would desynchronize n from the moment sums.
        return (
            F.when(
                F.col(c).isNotNull(), F.col(c).cast(sum_type)
            ).otherwise(
                F.raise_error(
                    F.lit(f"grouped_ols_moments: NULL in column {c!r}")
                ).cast(sum_type)
            )
        )

    m = (
        df.select(F.col(group_col), _d(x_col).alias("__x"), _d(y_col).alias("__y"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__x").cast("double").alias("__sx"),
            F.sum("__y").cast("double").alias("__sy"),
            F.sum(F.col("__x") * F.col("__y")).cast("double").alias("__sxy"),
            F.sum(F.col("__x") * F.col("__x")).cast("double").alias("__sxx"),
            F.sum(F.col("__y") * F.col("__y")).cast("double").alias("__syy"),
        )
    )
    n = F.col("n").cast("double")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    slope = F.when(vx != 0, cov / vx).otherwise(F.lit(0.0))
    return (
        m.withColumn("slope", slope)
        .withColumn("intercept", (F.col("__sy") - F.col("slope") * F.col("__sx")) / n)
        .withColumn(
            "r2",
            F.when(
                vy != 0, (F.col("slope") * cov) / vy
            ).otherwise(F.lit(1.0)),
        )
        .select(group_col, "n", "slope", "intercept", "r2")
    )


def grouped_ols(
    df: DataFrame,
    *,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group least-squares line y = slope*x + intercept (plus n
    and R^2), one Arrow batch per group.

    SURFACE template, not the scale gear: the whole group lands as
    one pandas frame in one Python worker, so callers must bound the
    group payload (cap or config-sized key) — use
    `grouped_ols_moments` for real OLS at scale. See the module
    docstring and the grouped-pandas audit."""
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
