"""Rule-based data-quality expectations with quarantine split.

Generalizes the reference's verification tier (V1-V4: existence,
counts, sampling) into row-level contracts: each expectation is a
named boolean column expression; rows failing ANY expectation are
quarantined with the list of failed rule names (dead-letter shape),
passing rows flow on. One pass over the data — the violation flags
are plain column expressions, evaluated together, never one scan per
rule.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def apply_expectations(
    df: DataFrame, expectations: Mapping[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (passed, quarantined).

    ``expectations`` maps rule name -> boolean Column that must be
    TRUE for a healthy row (NULL counts as failure — three-valued
    logic never hides a violation). The quarantine frame carries
    ``_failed_rules`` (array of rule names).
    """
    failed = F.array_compact(
        F.array(
            *[
                F.when(~cond.eqNullSafe(F.lit(True)), F.lit(name))
                for name, cond in expectations.items()
            ]
        )
    )
    flagged = df.withColumn("_failed_rules", failed)
    passed = flagged.where(F.size("_failed_rules") == 0).drop("_failed_rules")
    quarantined = flagged.where(F.size("_failed_rules") > 0)
    return passed, quarantined


def expectation_report(df: DataFrame, expectations: Mapping[str, Column]) -> DataFrame:
    """Per-rule violation counts + rates in ONE aggregate pass."""
    aggs = [F.count(F.lit(1)).alias("__total")]
    for name, cond in expectations.items():
        aggs.append(
            F.sum(F.when(~cond.eqNullSafe(F.lit(True)), 1).otherwise(0)).alias(f"__v_{name}")
        )
    wide = df.agg(*aggs)
    names = list(expectations)
    stack = ", ".join(f"'{n}', __v_{n}" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {stack}) AS (rule, n_violations)", "__total AS n_rows"
    ).select(
        "rule",
        "n_violations",
        "n_rows",
        (F.col("n_violations") / F.col("n_rows")).alias("violation_rate"),
    )
