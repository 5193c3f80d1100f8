"""Maintenance / lifecycle operators (SURVEY §2.11, M1-M9).

The reference's lifecycle tier: idempotent database create
(`setup-database.py:66-103`), a smoke-test round trip
(`:202-245`), verified DELETE/TRUNCATE of staging after the load is
confirmed (`rds-to-bq.py:389-437`, `delete-rds-after-load.py:209-249`
behind the >=90% gate at `:310-314`), database teardown
(`drop-database.py:20-26`), and a last-modified metadata table
upserted per run (`supabase-bq.py:216-235`, M9).

Spark-first equivalents over a file/catalog world: databases are
catalog namespaces; staging "tables" are parquet directories whose
TRUNCATE is a verified directory delete; the metadata watermark table
is a tiny parquet upserted via the engine's own merge operator.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .merge import merge_upsert
from .reconcile import verified_cleanup_gate


def create_database(spark: SparkSession, name: str, *, location: str | None = None) -> None:
    """Idempotent namespace create (M1)."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}{loc}")


def drop_database(spark: SparkSession, name: str) -> None:
    """Teardown (M6)."""
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def smoke_test_roundtrip(spark: SparkSession, scratch_dir: str) -> bool:
    """M3: tiny write -> read -> count -> cleanup, proving the session
    and storage path work before a real run."""
    path = os.path.join(scratch_dir, "__engine_smoke_test")
    df = spark.range(3).select(F.col("id"), F.lit("ok").alias("status"))
    df.write.mode("overwrite").parquet(path)
    ok = spark.read.parquet(path).count() == 3
    shutil.rmtree(path, ignore_errors=True)
    return ok


def verified_truncate(
    spark: SparkSession,
    staging_path: str,
    warehouse_df: DataFrame,
    *,
    tolerance: float = 0.9,
    dry_run: bool = False,
) -> dict:
    """M4/M5 + V4: delete a staging directory ONLY after the
    destination verifiably holds its rows (>= tolerance). Returns the
    decision record; ``dry_run`` reports without deleting (the
    reference's --dry-run/--verify-only modes)."""
    staged = spark.read.parquet(staging_path)
    src_cnt = staged.count()
    ok = verified_cleanup_gate(staged, warehouse_df, tolerance=tolerance)
    deleted = False
    if ok and not dry_run:
        shutil.rmtree(staging_path)
        deleted = True
    return {
        "staging_path": staging_path,
        "src_rows": src_cnt,
        "gate_passed": ok,
        "deleted": deleted,
        "dry_run": dry_run,
    }


_WATERMARK_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType(), False),
        T.StructField("modified_date", T.TimestampType(), False),
    ]
)


def upsert_watermark(spark: SparkSession, ledger_path: str, table_name: str) -> DataFrame:
    """M9: per-table last-modified metadata upsert (the reference's
    `olist_lmod_tables`): update the row if present, insert if not —
    the engine's merge operator on a one-row source."""
    update = spark.createDataFrame([(table_name,)], ["table_name"]).select(
        "table_name", F.current_timestamp().alias("modified_date")
    )
    if os.path.exists(ledger_path):
        target = spark.read.schema(_WATERMARK_SCHEMA).parquet(ledger_path)
        merged = merge_upsert(target, update, ["table_name"])
    else:
        merged = update
    tmp = ledger_path.rstrip("/") + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(ledger_path):
        shutil.rmtree(ledger_path)
    os.replace(tmp, ledger_path)
    return spark.read.schema(_WATERMARK_SCHEMA).parquet(ledger_path)
