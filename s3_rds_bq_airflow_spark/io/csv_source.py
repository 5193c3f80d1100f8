"""CSV source with the reference's ingestion semantics (S1-S6).

The reference's CSV path: list a directory (`csv-to-s3.py:62-80`),
probe headers from the first 8 KB (`s3-to-rds.py:122-162`), read the
whole file BOM-aware (`s3-to-rds.py:199-224`), sanitize column names
(`:204-218`), stage every column as TEXT plus a `CREATED_DATE` audit
column (`:164-183`, `:226-229`).

Spark-first: one ``spark.read.csv`` call replaces the probe + read
(header handling, BOM stripping, and parallel splitting are built into
the datasource); the all-TEXT staging contract is an explicit
all-string schema (bronze), and typing is a separate, declarative
silver cast — not load-time sniffing. The same call reads
``s3a://bucket/prefix/*.csv`` on a cluster; only the path changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ingest.audit import with_audit_column
from ..ingest.sanitize import sanitize_columns


def read_csv_bronze(
    spark: SparkSession,
    path: str,
    *,
    delimiter: str = ",",
    audit: bool = True,
    include_source_file: bool = False,
) -> DataFrame:
    """Read CSV(s) into the bronze (all-string) staging shape.

    - header row from the file, every column ``string`` (the
      reference's all-TEXT staging schema, `s3-to-rds.py:178`)
    - UTF-8 BOM tolerated (`encoding='UTF-8'` + the sanitizer strips
      a BOM that survives into the first header)
    - sanitized snake_case column names
    - ``created_date`` audit timestamp when ``audit``
    - ``_source_file`` lineage column when ``include_source_file``
      (replaces the reference's per-file loop identity, S3's
      ``input_file_name``)
    """
    df = (
        spark.read.option("header", True)
        .option("delimiter", delimiter)
        .option("encoding", "UTF-8")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    df = sanitize_columns(df)
    if include_source_file:
        df = df.withColumn("_source_file", F.input_file_name())
    if audit:
        df = with_audit_column(df)
    return df


def write_csv(df: DataFrame, path: str, *, header: bool = True, mode: str = "overwrite") -> None:
    """CSV sink (reference S2's upload step — Spark writes one file
    per partition directly to the destination filesystem)."""
    df.write.mode(mode).option("header", header).csv(path)
