"""Bucketed co-located joins (zero-exchange plan pin) and small-file
compaction."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.io.tables import load_table
from s3_rds_bq_airflow_spark.operators.storage import compact_parquet, write_bucketed
from s3_rds_bq_airflow_spark.plans.inspect import plan_nodes, shuffle_count


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucket_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    yield "bucketdb"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucket_db):
    """Two tables bucketed+sorted on the join key: the equi-join plans
    with ZERO exchanges (and no per-query sort) — the layout already
    co-located the keys. This is the recurring-join answer at scale."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, f"{bucket_db}.orders_b", ["o_custkey"], n_buckets=8, sort_cols=["o_custkey"])
    write_bucketed(cust, f"{bucket_db}.customer_b", ["c_custkey"], n_buckets=8, sort_cols=["c_custkey"])
    ob = spark.table(f"{bucket_db}.orders_b")
    cb = spark.table(f"{bucket_db}.customer_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the join to be a real sort-merge so the assertion is
        # about bucketing, not broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey).groupBy("c_mktsegment").count()
        nodes = plan_nodes(joined)
        assert "SortMergeJoin" in nodes
        # the final aggregate on a different key may exchange; the
        # JOIN INPUTS (everything up to the SortMergeJoin in the
        # bottom-up detail numbering) must not shuffle
        join_idx = nodes.index("SortMergeJoin")
        assert "Exchange" not in nodes[:join_idx], nodes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_shuffles_for_contrast(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
        assert shuffle_count(joined) == 2  # both sides shuffle on the key
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compact_parquet(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    load_table(spark, sf_dir, "orders").repartition(24).write.parquet(src)
    import os

    n_small = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_small == 24
    dest = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, src, dest, target_file_bytes=64 * 1024 * 1024)
    assert n_out < n_small
    assert (
        spark.read.parquet(dest).agg(F.sum("o_orderkey")).collect()[0][0]
        == load_table(spark, sf_dir, "orders").agg(F.sum("o_orderkey")).collect()[0][0]
    )
