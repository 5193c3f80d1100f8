"""Audit / lineage column injection (reference operator P2).

The reference stamps every ingested row with ``CREATED_DATE`` =
wall-clock ingest time (``s3-to-rds.py:226-229``) and, on the Meltano
path, the Singer ``_sdc_*`` metadata family
(``target_bigquery/core.py:455-464``). Spark equivalents are pure
column expressions — evaluated per-partition on executors, no driver
round-trip, constant-folded per batch where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

AUDIT_COLUMN = "created_date"


def with_audit_column(df: DataFrame, name: str = AUDIT_COLUMN) -> DataFrame:
    """Add the ingest-timestamp audit column.

    ``current_timestamp()`` is fixed per query execution, so all rows
    of one ingest batch share one stamp — same observable semantics as
    the reference's single ``datetime.now()`` per file.
    """
    return df.withColumn(name, F.current_timestamp())


def with_lineage_columns(
    df: DataFrame,
    *,
    batch_id: str | None = None,
    table_version: int = 0,
    include_file: bool = True,
) -> DataFrame:
    """Add the ``_sdc_*`` lineage family (extracted/received/batched
    timestamps, sequence, table version, soft-delete marker) plus the
    source file path when reading from files."""
    out = (
        df.withColumn("_sdc_extracted_at", F.current_timestamp())
        .withColumn("_sdc_received_at", F.current_timestamp())
        .withColumn("_sdc_batched_at", F.current_timestamp())
        .withColumn("_sdc_deleted_at", F.lit(None).cast("timestamp"))
        .withColumn("_sdc_sequence", F.monotonically_increasing_id())
        .withColumn("_sdc_table_version", F.lit(table_version))
    )
    if batch_id is not None:
        out = out.withColumn("_sdc_batch_id", F.lit(batch_id))
    if include_file:
        out = out.withColumn("_sdc_source_file", F.input_file_name())
    return out
