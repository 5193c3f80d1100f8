"""SCD Type 2 dimension lifecycle: init, change application, no-op
idempotence, point-in-time queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators.scd import scd2_apply, scd2_as_of, scd2_init


def _snap(spark, rows):
    return spark.createDataFrame(rows, ["cust_id", "segment", "city"])


def test_scd2_lifecycle(spark):
    dim = scd2_init(
        _snap(spark, [(1, "BUILDING", "Lyon"), (2, "AUTO", "Oslo")]),
        valid_from="2024-01-01 00:00:00",
    )
    assert dim.where(F.col("is_current")).count() == 2

    # day 2: customer 1 moves city; customer 3 appears; customer 2 unchanged
    dim2 = scd2_apply(
        dim,
        _snap(spark, [(1, "BUILDING", "Paris"), (2, "AUTO", "Oslo"), (3, "MACH", "Rome")]),
        key="cust_id",
        attrs=["segment", "city"],
        batch_ts="2024-01-02 00:00:00",
    )
    rows = {(r["cust_id"], r["city"], r["is_current"]) for r in dim2.collect()}
    assert (1, "Lyon", False) in rows and (1, "Paris", True) in rows
    assert (2, "Oslo", True) in rows
    assert (3, "Rome", True) in rows
    assert dim2.count() == 4  # 2 current originals -> 1 closed + 3 current

    # closed row carries the change timestamp
    closed = dim2.where((F.col("cust_id") == 1) & ~F.col("is_current")).collect()[0]
    assert str(closed["valid_to"]).startswith("2024-01-02")

    # idempotence: re-applying the same snapshot changes nothing
    dim3 = scd2_apply(
        dim2,
        _snap(spark, [(1, "BUILDING", "Paris"), (2, "AUTO", "Oslo"), (3, "MACH", "Rome")]),
        key="cust_id",
        attrs=["segment", "city"],
        batch_ts="2024-01-03 00:00:00",
    )
    assert sorted(map(tuple, dim3.collect())) == sorted(map(tuple, dim2.collect()))

    # point-in-time views
    asof_day1 = {(r["cust_id"], r["city"]) for r in scd2_as_of(dim2, "2024-01-01 12:00:00").collect()}
    assert asof_day1 == {(1, "Lyon"), (2, "Oslo")}
    asof_day2 = {(r["cust_id"], r["city"]) for r in scd2_as_of(dim2, "2024-01-02 12:00:00").collect()}
    assert asof_day2 == {(1, "Paris"), (2, "Oslo"), (3, "Rome")}


def test_scd2_delete_semantics_keeps_unmatched_current(spark):
    """Keys absent from an update snapshot stay current (the engine
    treats snapshots as upserts, not full-state; deletions are closed
    explicitly upstream via tombstones if needed)."""
    dim = scd2_init(_snap(spark, [(1, "A", "X"), (2, "B", "Y")]), valid_from="2024-01-01 00:00:00")
    dim2 = scd2_apply(
        dim,
        _snap(spark, [(1, "A", "Z")]),
        key="cust_id",
        attrs=["segment", "city"],
        batch_ts="2024-01-05 00:00:00",
    )
    cur = {(r["cust_id"], r["city"]) for r in dim2.where(F.col("is_current")).collect()}
    assert cur == {(1, "Z"), (2, "Y")}
