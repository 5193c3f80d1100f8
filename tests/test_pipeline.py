"""End-to-end pipeline integration: the reference's four stages
(`main.py:157-196` — setup, CSV->landing, landing->staging,
staging->warehouse with verification and cleanup) as ONE Spark driver
program composed from engine operators. External-system handoff
(S3/RDS/BigQuery) becomes DataFrame lineage over staged directories.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.ingest import derive_table_name
from s3_rds_bq_airflow_spark.io.csv_source import read_csv_bronze
from s3_rds_bq_airflow_spark.io.ledger import ingest_new_files
from s3_rds_bq_airflow_spark.ingest.bronze_silver import to_silver
from s3_rds_bq_airflow_spark.operators.copy import full_copy
from s3_rds_bq_airflow_spark.operators.maintenance import (
    smoke_test_roundtrip,
    upsert_watermark,
    verified_truncate,
)
from s3_rds_bq_airflow_spark.operators.reconcile import count_reconciliation


CSV_BODY = (
    "﻿Order ID,Order-Status,total Price,Order Date\n"
    "1,OPEN,10.50,2024-01-01 10:00:00\n"
    "2,CLOSED,3.25,2024-01-02 11:30:00\n"
    "3,OPEN,99.99,2024-01-03 12:45:00\n"
)


def test_full_pipeline(spark, tmp_path):
    landing = tmp_path / "landing"
    staging = tmp_path / "staging"
    warehouse = tmp_path / "warehouse"
    meta = str(tmp_path / "meta_lmod")
    ledger = str(tmp_path / "ingest_ledger")
    for d in (landing, staging, warehouse):
        os.makedirs(d)

    # STAGE 1 — setup + smoke test (setup-database.py:202-245)
    assert smoke_test_roundtrip(spark, str(tmp_path))

    # STAGE 2 — CSV arrives in the landing zone
    src_csv = landing / "olist-orders-dataset.csv"
    src_csv.write_bytes(CSV_BODY.encode("utf-8"))
    table = derive_table_name(src_csv.name)
    assert table == "olist_orders_dataset"

    # STAGE 3 — landing -> bronze staging, exactly-once via ledger
    staging_path = str(staging / table)

    def load_to_staging(files):
        df = read_csv_bronze(spark, files[0])
        df.write.mode("overwrite").parquet(staging_path)

    processed = ingest_new_files(spark, str(landing), ledger, load_to_staging, suffix=".csv")
    assert len(processed) == 1
    bronze = spark.read.parquet(staging_path)
    # all-TEXT staging + audit column (s3-to-rds.py:164-183,226-229)
    assert dict(bronze.dtypes)["total_price"] == "string"
    assert "created_date" in bronze.columns

    # re-running the round ingests nothing (exactly-once)
    assert ingest_new_files(spark, str(landing), ledger, load_to_staging, suffix=".csv") == []

    # STAGE 4 — staging -> typed warehouse with source-prefix rename
    silver = to_silver(
        bronze,
        {"order_id": "integer", "total_price": "number", "order_date": "date-time"},
    )
    wh_path = str(warehouse / f"rds_{table}")  # rds_ prefix, rds-to-bq.py:479
    warehouse_df = full_copy(silver, wh_path)
    assert dict(warehouse_df.dtypes)["total_price"] == "double"
    assert warehouse_df.where(F.col("order_date").isNull()).count() == 0

    # verification: per-table count reconciliation (A2/J2)
    recon = count_reconciliation({table: (bronze, warehouse_df)}).collect()[0]
    assert recon["match"] and recon["difference"] == 0

    # metadata watermark upsert (M9) — second upsert keeps one row
    assert upsert_watermark(spark, meta, table).count() == 1
    assert upsert_watermark(spark, meta, table).count() == 1

    # verified cleanup of staging (M4/M5 behind the V4 gate)
    dry = verified_truncate(spark, staging_path, warehouse_df, dry_run=True)
    assert dry["gate_passed"] and not dry["deleted"]
    res = verified_truncate(spark, staging_path, warehouse_df)
    assert res["deleted"]
    assert not os.path.exists(staging_path)
    # warehouse survives, data intact
    assert spark.read.parquet(wh_path).count() == 3


def test_verified_truncate_refuses_on_short_destination(spark, tmp_path):
    staging_path = str(tmp_path / "stage_t")
    spark.range(100).write.parquet(staging_path)
    short_dest = spark.range(50)  # only half made it
    res = verified_truncate(spark, staging_path, short_dest)
    assert not res["gate_passed"] and not res["deleted"]
    assert os.path.exists(staging_path)
