"""Sources layer: CSV bronze semantics, ledger exactly-once ingest,
JDBC partitioned-scan planning."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.io.csv_source import read_csv_bronze, write_csv
from s3_rds_bq_airflow_spark.io.jdbc import (
    bounds_probe_query,
    count_probe_query,
    partitioned_scan_options,
)
from s3_rds_bq_airflow_spark.io.ledger import (
    ingest_new_files,
    read_ledger,
    unprocessed_files,
)


def _write_bom_csv(path: str) -> None:
    # BOM + quoted header + mixed-case/dashed names + a numeric-as-text
    # column: the exact shapes the reference's sanitizer handles
    # (s3-to-rds.py:147-157,199-224).
    with open(path, "wb") as f:
        f.write("﻿Order ID,\"customer-City\",price\n1,ACME town,10.50\n2,Beta,3.25\n".encode("utf-8"))


def test_csv_bronze_read(spark, tmp_path):
    p = str(tmp_path / "olist-orders.csv")
    _write_bom_csv(p)
    df = read_csv_bronze(spark, p, include_source_file=True)
    assert df.columns == ["order_id", "customer_city", "price", "_source_file", "created_date"]
    # bronze contract: every source column is a string
    for name in ("order_id", "customer_city", "price"):
        assert dict(df.dtypes)[name] == "string"
    rows = df.orderBy("order_id").collect()
    assert rows[0]["order_id"] == "1" and rows[0]["price"] == "10.50"
    assert rows[0]["created_date"] is not None
    assert rows[0]["_source_file"].endswith("olist-orders.csv")


def test_csv_roundtrip(spark, tmp_path):
    src = str(tmp_path / "in.csv")
    _write_bom_csv(src)
    df = read_csv_bronze(spark, src, audit=False)
    out = str(tmp_path / "out_csv")
    write_csv(df, out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 2
    assert set(back.columns) == {"order_id", "customer_city", "price"}


def test_ledger_ingest_exactly_once(spark, tmp_path):
    src = str(tmp_path / "landing")
    os.makedirs(src)
    ledger = str(tmp_path / "ledger")
    for i in range(3):
        _write_bom_csv(os.path.join(src, f"f{i}.csv"))

    processed_batches: list[list[str]] = []

    def process(files):
        processed_batches.append(sorted(files))

    first = ingest_new_files(spark, src, ledger, process, suffix=".csv", batch_id="b1")
    assert len(first) == 3
    # second round: nothing new
    second = ingest_new_files(spark, src, ledger, process, suffix=".csv", batch_id="b2")
    assert second == []
    # a new file arrives -> only it is processed
    _write_bom_csv(os.path.join(src, "f9.csv"))
    third = ingest_new_files(spark, src, ledger, process, suffix=".csv", batch_id="b3")
    assert [os.path.basename(f) for f in third] == ["f9.csv"]
    assert len(processed_batches) == 2  # empty round never called process
    led = read_ledger(spark, ledger)
    assert led.count() == 4
    assert led.where(F.col("batch_id") == "b3").count() == 1


def test_ledger_failed_process_not_committed(spark, tmp_path):
    src = str(tmp_path / "landing2")
    os.makedirs(src)
    ledger = str(tmp_path / "ledger2")
    _write_bom_csv(os.path.join(src, "a.csv"))

    with pytest.raises(RuntimeError):
        ingest_new_files(
            spark, src, ledger, lambda fs: (_ for _ in ()).throw(RuntimeError("boom")), suffix=".csv"
        )
    # crash before commit -> file still pending (at-least-once)
    assert len(unprocessed_files(spark, [os.path.join(src, "a.csv")], ledger)) == 1


def test_jdbc_option_planning():
    opts = partitioned_scan_options(
        table="orders", partition_column="o_orderkey",
        lower_bound=0, upper_bound=1_000_000, num_partitions=64,
    )
    assert opts["numPartitions"] == "64"
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["fetchsize"] == "10000"
    with pytest.raises(ValueError):
        partitioned_scan_options(
            table="t", partition_column="id", lower_bound=5, upper_bound=5, num_partitions=4
        )
    assert "MIN(o_orderkey)" in bounds_probe_query("orders", "o_orderkey")
    assert count_probe_query("orders", "o_totalprice > 0").startswith("(SELECT COUNT(*)")


def test_csv_malformed_rows_permissive(spark, tmp_path):
    """PERMISSIVE ingestion: a malformed line (missing fields) lands
    as nulls instead of failing the job — count it for quality
    reporting, don't die at row 3 of a 100 TB load."""
    p = str(tmp_path / "dirty.csv")
    with open(p, "w") as f:
        f.write("a,b,c\n1,x,2.5\nBADROW\n3,y,9.9\n")
    df = read_csv_bronze(spark, p, audit=False)
    assert df.count() == 3
    bad = df.where(F.col("b").isNull() & F.col("c").isNull())
    assert bad.count() == 1
    good = df.where(F.col("b").isNotNull())
    assert {r["a"] for r in good.collect()} == {"1", "3"}


def test_format_matrix_roundtrips(spark, tmp_path):
    from pyspark.sql import functions as F

    from s3_rds_bq_airflow_spark.io.formats import read_format, write_format

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("k")
    )
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / fmt)
        write_format(df, path, fmt)
        back = read_format(spark, path, fmt, schema=df.schema)
        assert back.count() == 100
        assert back.agg(F.sum("id")).collect()[0][0] == 4950


def test_row_formats_require_schema(spark, tmp_path):
    import pytest

    from s3_rds_bq_airflow_spark.io.formats import read_format, write_format

    df = spark.range(3)
    path = str(tmp_path / "j")
    write_format(df, path, "json")
    with pytest.raises(ValueError, match="explicit schema"):
        read_format(spark, path, "json")
    with pytest.raises(ValueError, match="unsupported format"):
        write_format(df, str(tmp_path / "x"), "avro")
