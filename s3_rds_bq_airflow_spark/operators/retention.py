"""Partition retention / expiration (SURVEY §2.11 M7 tail).

The reference expires warehouse partitions by policy: time
partitioning on ``_sdc_batched_at`` with
``expiration_ms = partition_expiration_days * 86400e3`` and a
granularity from DAY/HOUR/MONTH/YEAR (``target_bigquery/
core.py:468-487``). BigQuery then drops whole partitions as they age
out — never row-level deletes.

Spark-native equivalent over a ``partitionBy`` parquet/Delta layout:
drop (or archive) the partition DIRECTORIES whose partition value is
older than the cutoff. The unit of work is a directory rename/delete
— no data files are read, no rows rewritten, which is the only form
of retention that works at 100 TB (a row-level ``DELETE WHERE ts <
cutoff`` would rewrite the whole table). Count verification follows
the M4/M5 pattern: the decision record carries rows-to-drop vs
rows-retained so callers can gate on it, and ``dry_run`` reports
without touching storage.

Crash safety: each partition is dropped independently and the
operation is idempotent — a crash mid-expiry leaves a table that is
simply not fully expired yet; re-running converges. Archival moves
the directory aside first (rename within the filesystem), so an
archived partition is never half-deleted.
"""

from __future__ import annotations

import datetime
import os
import shutil

from pyspark.sql import SparkSession, functions as F

__all__ = ["expire_partitions", "list_partitions"]

_GRAIN_FMT = {
    "day": "%Y-%m-%d",
    "hour": "%Y-%m-%d-%H",
    "month": "%Y-%m",
    "year": "%Y",
}


def _parse_value(value: str, granularity: str) -> datetime.datetime:
    return datetime.datetime.strptime(value, _GRAIN_FMT[granularity])


def list_partitions(table_dir: str, partition_col: str) -> list[str]:
    """Partition values present on disk, from directory names only
    (``<col>=<value>``) — the same metadata partition pruning uses;
    zero data files opened."""
    prefix = f"{partition_col}="
    return sorted(
        d[len(prefix) :]
        for d in os.listdir(table_dir)
        if d.startswith(prefix)
        and os.path.isdir(os.path.join(table_dir, d))
    )


def expire_partitions(
    spark: SparkSession,
    table_dir: str,
    partition_col: str,
    *,
    expiration_days: int | None = None,
    cutoff: str | datetime.datetime | None = None,
    granularity: str = "day",
    archive_dir: str | None = None,
    dry_run: bool = False,
) -> dict:
    """Drop partitions strictly older than the cutoff.

    Policy mirrors the reference: either ``expiration_days`` (age
    relative to now, core.py:481 semantics) or an explicit ``cutoff``
    (deterministic — what tests and replayable jobs should use).
    ``granularity`` names the partition-value encoding (day/hour/
    month/year, the reference's PARTITION_STRATEGY grains). With
    ``archive_dir`` the partitions are moved, not deleted (rename —
    atomic per partition on a real filesystem). Returns a decision
    record with per-partition row counts read from parquet metadata.
    """
    if (expiration_days is None) == (cutoff is None):
        raise ValueError("exactly one of expiration_days / cutoff required")
    if granularity not in _GRAIN_FMT:
        raise ValueError(f"unknown granularity: {granularity!r}")
    if cutoff is None:
        cutoff_dt = datetime.datetime.now() - datetime.timedelta(days=expiration_days)
    elif isinstance(cutoff, str):
        cutoff_dt = _parse_value(cutoff, granularity)
    else:
        cutoff_dt = cutoff

    values = list_partitions(table_dir, partition_col)
    expired = [v for v in values if _parse_value(v, granularity) < cutoff_dt]
    retained = [v for v in values if v not in set(expired)]

    # Row counts from footer metadata only (spark count on a partition
    # directory is a metadata-only scan for parquet).
    def _count(vals: list[str]) -> int:
        if not vals:
            return 0
        paths = [os.path.join(table_dir, f"{partition_col}={v}") for v in vals]
        return spark.read.parquet(*paths).count()

    dropped_rows = _count(expired)
    record = {
        "table_dir": table_dir,
        "partition_col": partition_col,
        "cutoff": cutoff_dt.strftime(_GRAIN_FMT[granularity]),
        "n_partitions": len(values),
        "expired_partitions": expired,
        "n_expired": len(expired),
        "dropped_rows": dropped_rows,
        "retained_rows": _count(retained),
        "archived": archive_dir is not None,
        "dry_run": dry_run,
    }
    if dry_run:
        return record
    for v in expired:
        src = os.path.join(table_dir, f"{partition_col}={v}")
        if archive_dir is not None:
            os.makedirs(archive_dir, exist_ok=True)
            os.replace(src, os.path.join(archive_dir, f"{partition_col}={v}"))
        else:
            shutil.rmtree(src)
    return record
