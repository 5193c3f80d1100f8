"""Exactly-once file ingestion via a processed-file ledger (S8).

The reference gets exactly-once by MUTATING the source: after a
successful load it copies each S3 object to an ``imported/`` prefix
and deletes the original (`s3-to-rds.py:253-279`). That pattern
doesn't scale (object-store copies of ingested data, no audit of when
what was processed, races under concurrent ingests).

Spark-first (SURVEY §4.3): the source stays immutable; a small
parquet ledger records processed file paths. Each ingest round:

    list source files -> anti-join against the ledger -> process only
    the new ones -> append them to the ledger

The anti-join runs on the driver-side file LISTING (thousands of
entries), never on data. Structured Streaming's file source does the
same thing with its checkpoint log — this is the batch face of it,
and ``streaming/source.py`` the streaming face.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType(), False),
        T.StructField("ingested_at", T.TimestampType(), False),
        T.StructField("batch_id", T.StringType(), False),
    ]
)


def list_source_files(spark: SparkSession, directory: str, *, suffix: str = "") -> list[str]:
    """List candidate files (sorted, stable). Local filesystem walk
    here; object-store paths would swap in a Hadoop FileSystem
    ``globStatus`` listing — the ledger logic above it is unchanged."""
    out = []
    for root, _dirs, files in os.walk(directory):
        for f in files:
            if f.endswith(suffix) and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return sorted(out)


def read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    if os.path.exists(ledger_path):
        return spark.read.schema(_LEDGER_SCHEMA).parquet(ledger_path)
    return spark.createDataFrame([], _LEDGER_SCHEMA)


def unprocessed_files(spark: SparkSession, files: list[str], ledger_path: str) -> list[str]:
    """Anti-join the candidate listing against the ledger."""
    seen = {
        r["file_path"]
        for r in read_ledger(spark, ledger_path).select("file_path").collect()
    }
    return [f for f in files if f not in seen]


def commit_to_ledger(
    spark: SparkSession, files: list[str], ledger_path: str, *, batch_id: str
) -> None:
    if not files:
        return
    rows = spark.createDataFrame(
        [(f, batch_id) for f in files], ["file_path", "batch_id"]
    ).select("file_path", F.current_timestamp().alias("ingested_at"), "batch_id")
    rows.write.mode("append").parquet(ledger_path)


def ingest_new_files(
    spark: SparkSession,
    directory: str,
    ledger_path: str,
    process: Callable[[list[str]], None],
    *,
    suffix: str = "",
    batch_id: str = "batch",
) -> list[str]:
    """One ingest round: discover -> filter by ledger -> process ->
    commit. ``process`` receives the new file paths (read them with
    one ``spark.read`` call — Spark parallelizes across files).
    Returns the list of newly processed files.

    Crash semantics: the ledger commit happens AFTER ``process``
    succeeds; a crash in between re-processes those files next round
    (at-least-once). Pair with idempotent sinks (atomic overwrite or
    merge-by-key) for effective exactly-once — the same contract as
    the reference's move-after-load, without mutating the source.
    """
    fresh = unprocessed_files(spark, list_source_files(spark, directory, suffix=suffix), ledger_path)
    if not fresh:
        return []
    process(fresh)
    commit_to_ledger(spark, fresh, ledger_path, batch_id=batch_id)
    return fresh
