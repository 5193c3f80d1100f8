"""Unit tests for merge / reconcile / copy operators."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators import (
    count_reconciliation,
    dedup_latest,
    merge_upsert,
    verified_cleanup_gate,
)
from s3_rds_bq_airflow_spark.operators.copy import full_copy, incremental_since, next_watermark


def test_dedup_latest(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")], ["k", "v", "tag"]
    )
    out = dedup_latest(df, ["k"], ["v"]).orderBy("k").collect()
    assert [(r["k"], r["tag"]) for r in out] == [(1, "new"), (2, "only")]


def test_merge_upsert(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    source = spark.createDataFrame([(2, "B"), (3, "C")], ["k", "v"])
    out = {r["k"]: r["v"] for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "C"}


def test_merge_upsert_dedups_source(spark):
    target = spark.createDataFrame([(1, "a", 0)], ["k", "v", "seq"])
    source = spark.createDataFrame([(1, "mid", 1), (1, "last", 2)], ["k", "v", "seq"])
    out = merge_upsert(target, source, ["k"], source_order=["seq"]).collect()
    assert len(out) == 1 and out[0]["v"] == "last"


def test_count_reconciliation(spark):
    a, b = spark.range(10), spark.range(8)
    rec = count_reconciliation({"t1": (a, a), "t2": (a, b)})
    rows = {r["table_name"]: r for r in rec.collect()}
    assert rows["t1"]["match"] is True and rows["t1"]["difference"] == 0
    assert rows["t2"]["match"] is False and rows["t2"]["difference"] == 2


def test_verified_cleanup_gate(spark):
    assert verified_cleanup_gate(spark.range(100), spark.range(95))
    assert not verified_cleanup_gate(spark.range(100), spark.range(80))
    assert verified_cleanup_gate(spark.range(0), spark.range(0))


def test_full_copy_and_watermark(spark):
    df = spark.range(100).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60)
    )
    dest = os.path.join(tempfile.mkdtemp(prefix="copy_test_"), "t")
    copied = full_copy(df, dest)
    assert copied.count() == 100
    # overwrite is idempotent
    copied = full_copy(df, dest)
    assert copied.count() == 100

    wm = next_watermark(df, "ts")
    sliced = incremental_since(df, "ts", str(wm))
    assert sliced.count() == 1  # inclusive watermark: at-least-once re-read
