"""Partition retention/expiration operator (M7 tail,
`target_bigquery/core.py:468-487` partition_expiration_days)."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators.retention import (
    expire_partitions,
    list_partitions,
)


@pytest.fixture()
def day_table(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    df = spark.createDataFrame(
        [(i, f"2026-01-{d:02d}") for d in range(1, 6) for i in range(d)],
        ["id", "p_date"],
    )
    df.write.partitionBy("p_date").parquet(path)
    return path


def test_list_partitions_metadata_only(day_table):
    assert list_partitions(day_table, "p_date") == [
        f"2026-01-{d:02d}" for d in range(1, 6)
    ]


def test_expire_drops_strictly_older(spark, day_table):
    rec = expire_partitions(
        spark, day_table, "p_date", cutoff="2026-01-03", granularity="day"
    )
    assert rec["expired_partitions"] == ["2026-01-01", "2026-01-02"]
    # 1+2 rows dropped, 3+4+5 retained — count-verified like M4/M5.
    assert rec["dropped_rows"] == 3 and rec["retained_rows"] == 12
    assert list_partitions(day_table, "p_date") == [
        "2026-01-03", "2026-01-04", "2026-01-05"
    ]
    assert spark.read.parquet(day_table).count() == 12
    # Idempotent: re-running expires nothing.
    again = expire_partitions(
        spark, day_table, "p_date", cutoff="2026-01-03", granularity="day"
    )
    assert again["n_expired"] == 0 and again["dropped_rows"] == 0


def test_dry_run_reports_without_deleting(spark, day_table):
    rec = expire_partitions(
        spark, day_table, "p_date", cutoff="2026-01-04", granularity="day",
        dry_run=True,
    )
    assert rec["n_expired"] == 3 and rec["dry_run"]
    assert len(list_partitions(day_table, "p_date")) == 5


def test_archive_moves_partitions_aside(spark, day_table, tmp_path):
    archive = str(tmp_path / "archive")
    rec = expire_partitions(
        spark, day_table, "p_date", cutoff="2026-01-02", granularity="day",
        archive_dir=archive,
    )
    assert rec["archived"] and rec["expired_partitions"] == ["2026-01-01"]
    # Archived partition is intact and readable, not deleted.
    assert spark.read.parquet(os.path.join(archive, "p_date=2026-01-01")).count() == 1
    assert spark.read.parquet(day_table).count() == 14


def test_expiration_days_relative_to_now(spark, tmp_path):
    path = str(tmp_path / "t")
    old = (datetime.datetime.now() - datetime.timedelta(days=10)).strftime("%Y-%m-%d")
    new = datetime.datetime.now().strftime("%Y-%m-%d")
    spark.createDataFrame([(1, old), (2, new)], ["id", "p_date"]).write.partitionBy(
        "p_date"
    ).parquet(path)
    rec = expire_partitions(spark, path, "p_date", expiration_days=7)
    assert rec["expired_partitions"] == [old]
    assert list_partitions(path, "p_date") == [new]


def test_argument_validation(spark, day_table):
    with pytest.raises(ValueError, match="exactly one"):
        expire_partitions(spark, day_table, "p_date")
    with pytest.raises(ValueError, match="exactly one"):
        expire_partitions(
            spark, day_table, "p_date", expiration_days=1, cutoff="2026-01-01"
        )
    with pytest.raises(ValueError, match="granularity"):
        expire_partitions(
            spark, day_table, "p_date", cutoff="2026-01-01", granularity="week"
        )


def test_month_granularity(spark, tmp_path):
    path = str(tmp_path / "m")
    spark.createDataFrame(
        [(1, "2025-11"), (2, "2025-12"), (3, "2026-01")], ["id", "p_month"]
    ).write.partitionBy("p_month").parquet(path)
    rec = expire_partitions(
        spark, path, "p_month", cutoff="2025-12", granularity="month"
    )
    assert rec["expired_partitions"] == ["2025-11"]
    assert list_partitions(path, "p_month") == ["2025-12", "2026-01"]
