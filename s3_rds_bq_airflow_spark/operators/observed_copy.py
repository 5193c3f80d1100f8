"""Zero-extra-pass load verification via ``DataFrame.observe``.

The reference verifies every load with follow-up queries — count the
destination, compare to the source count, spot-check sums
(``bec-aws-bq/rds-to-bq.py`` re-queries BigQuery after each table
load; the V1-V4 verification tier in SURVEY §2). That is a SECOND
scan of data that was just streamed through the writer. Spark's
observation API attaches named aggregate metrics to the plan itself:
the metrics are accumulated BY THE WRITE JOB as rows flow to the
sink, so row counts / null counts / control sums come back with the
job at zero additional I/O — the 100 TB-honest form of post-load
verification (a verification re-scan of 100 TB costs as much as the
load).

Exact-sum discipline: control totals accumulate in DECIMAL via the
same ``dec()`` cast the query layer uses, so the observed sum equals
the re-scan sum bit-for-bit, not merely approximately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def copy_with_metrics(
    df: DataFrame,
    dest_path: str,
    *,
    fmt: str = "parquet",
    count_col: str | None = None,
    sum_col: str | None = None,
) -> dict:
    """Write ``df`` to ``dest_path`` (atomic overwrite) while
    observing in-flight metrics; returns the metrics dict:

    - ``n_rows``: rows that went through the writer,
    - ``n_null_<count_col>``: nulls seen in ``count_col`` (if given),
    - ``sum_<sum_col>``: exact DECIMAL control total (if given).

    The caller compares these against source-side expectations — the
    reference's verify-after-load contract without the second scan.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if count_col is not None:
        aggs.append(
            F.sum(F.col(count_col).isNull().cast("long")).alias(
                f"n_null_{count_col}"
            )
        )
    if sum_col is not None:
        aggs.append(
            F.sum(F.col(sum_col).cast("decimal(28,2)")).alias(f"sum_{sum_col}")
        )
    obs = Observation()
    df.observe(obs, *aggs).write.mode("overwrite").format(fmt).save(dest_path)
    return dict(obs.get)
