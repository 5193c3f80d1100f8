"""Table movement: full copy with atomic overwrite + incremental
watermark copy (reference S14/S15/M8).

The reference moves tables with resumable keyset chunking
(`tap_mysql/sync_strategies/full_table.py:92-179`) and a high-
watermark incremental mode (`incremental.py:57-66`), landing with an
atomic temp-table swap (`target_bigquery/core.py:576-588`).

Spark-first: a full copy is a partitioned read + ``mode("overwrite")``
write — idempotent re-run replaces row-level bookmarks (SURVEY §7.3);
the watermark is a pushed-down predicate, not an ORDER BY loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def full_copy(
    df: DataFrame,
    dest_path: str,
    *,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Copy ``df`` to ``dest_path`` with atomic overwrite semantics
    (Spark stages to ``_temporary`` and commits — the reference's
    temp-table + swap collapses to ``mode('overwrite')``). Returns the
    re-read destination for verification."""
    writer = df.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(dest_path)
    return df.sparkSession.read.format(fmt).load(dest_path)


def incremental_since(
    df: DataFrame,
    watermark_col: str,
    watermark: str | Column,
) -> DataFrame:
    """High-watermark incremental slice: ``col >= watermark``
    (inclusive, matching the reference's at-least-once re-read,
    `incremental.py:57-66`). The predicate pushes down to the scan —
    with date/time-partitioned storage this prunes whole partitions."""
    wm = F.lit(watermark).cast("timestamp") if isinstance(watermark, str) else watermark
    return df.where(F.col(watermark_col) >= wm)


def next_watermark(df: DataFrame, watermark_col: str):
    """Max watermark value to persist for the next incremental run
    (the reference's bookmark, advanced per-batch not per-row)."""
    return df.agg(F.max(watermark_col).alias("wm")).collect()[0]["wm"]
