"""Physical-layout operators: bucketing and small-file compaction.

The reference's only layout controls are BigQuery-side clustering and
time-partitioning options (`target_bigquery/core.py:468-487`, M7).
Spark-side the equivalents are:

- **Bucketing**: pre-shuffle a table ONCE at write time
  (``bucketBy(n, key)``); any later equi-join or aggregation on the
  bucket key between tables with compatible bucketing runs with ZERO
  exchanges. At 100 TB this converts every recurring fact-fact join
  from a per-query shuffle into a one-time layout cost.

- **Compaction**: streaming/incremental ingests accumulate small
  files; scans then pay per-file open cost and lose split planning.
  Periodic compaction rewrites a directory to ~target-sized files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    *,
    n_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed (and optionally per-bucket-sorted)
    catalog table. Sorting by the join key additionally removes the
    per-query sort under sort-merge joins."""
    writer = df.write.mode("overwrite").format(fmt).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~target-sized files. Returns
    the output file count. Uses the source's on-disk byte size (not
    row counts) to pick the file count — mirrors how a table service
    (OPTIMIZE/rewrite_data_files) sizes outputs."""
    total = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, -(-total // target_file_bytes))
    spark.read.parquet(src_dir).repartition(n_files).write.mode("overwrite").parquet(dest_dir)
    return sum(
        1
        for _root, _dirs, files in os.walk(dest_dir)
        for f in files
        if f.endswith(".parquet")
    )
