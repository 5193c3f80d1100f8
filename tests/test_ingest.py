"""Unit tests for the ingestion kit (sanitize / audit / bronze-silver)."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from s3_rds_bq_airflow_spark.ingest import (
    clean_column_name,
    derive_table_name,
    sanitize_columns,
    to_bronze,
    to_silver,
    with_audit_column,
    with_lineage_columns,
)
from s3_rds_bq_airflow_spark.ingest.sanitize import dedupe_names


def test_clean_column_name():
    assert clean_column_name("﻿Order ID") == "order_id"
    assert clean_column_name('"price"') == "price"
    assert clean_column_name("customerCityName") == "customer_city_name"
    assert clean_column_name("123abc") == "col_123abc"
    assert clean_column_name("___") == "col"
    assert clean_column_name("Lat./Lng.") == "lat_lng"
    assert clean_column_name("a--b") == "a_b"


def test_dedupe_names():
    assert dedupe_names(["a", "a", "b", "a"]) == ["a", "a_2", "b", "a_3"]


def test_derive_table_name():
    assert derive_table_name("olist-orders-dataset.csv") == "olist_orders_dataset"
    assert derive_table_name("/x/y/My File!.CSV".lower()) == "myfile"


def test_sanitize_columns(spark):
    df = spark.createDataFrame([(1, "x")], ["Order ID", "﻿ city-Name "])
    out = sanitize_columns(df)
    assert out.columns == ["order_id", "city_name"]
    assert out.collect()[0][0] == 1


def test_audit_and_lineage(spark):
    df = spark.range(5)
    stamped = with_audit_column(df)
    assert stamped.where(F.col("created_date").isNull()).count() == 0
    lineage = with_lineage_columns(df, batch_id="b1", include_file=False)
    row = lineage.limit(1).collect()[0]
    assert row["_sdc_batch_id"] == "b1"
    assert row["_sdc_deleted_at"] is None
    assert lineage.select("_sdc_sequence").distinct().count() == 5


def test_bronze_silver_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "2024-01-01 10:00:00")], ["id", "val", "ts"]
    ).select("id", "val", F.col("ts").cast("timestamp").alias("ts"))
    bronze = to_bronze(df)
    assert all(t == "string" for _, t in bronze.dtypes)
    silver = to_silver(
        bronze, {"id": T.LongType(), "val": "number", "ts": "date-time"}
    )
    row = silver.collect()[0]
    assert row["id"] == 1 and row["val"] == 2.5
    assert str(row["ts"]) == "2024-01-01 10:00:00"


def test_silver_bad_cast_yields_null(spark):
    bronze = spark.createDataFrame([("abc",)], ["n"])
    silver = to_silver(bronze, {"n": "integer"})
    assert silver.collect()[0]["n"] is None
