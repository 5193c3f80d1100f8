"""operators/observed_copy: in-flight load verification metrics.

The observed metrics must equal a direct re-scan aggregate EXACTLY
(decimal control sums), while being produced by the write job itself
— verified by comparing against DuckDB over the written parquet.
"""

from __future__ import annotations

import tempfile

import duckdb
from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.io.tables import load_table
from s3_rds_bq_airflow_spark.operators.observed_copy import copy_with_metrics


def test_observed_metrics_match_rescan(spark, sf_dir):
    src = load_table(spark, sf_dir, "orders")
    dest = tempfile.mkdtemp(prefix="obscopy_")
    m = copy_with_metrics(
        src, dest, count_col="o_orderpriority", sum_col="o_totalprice"
    )
    got = duckdb.sql(
        f"""
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nn,
               SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS s
        FROM read_parquet('{dest}/*.parquet')
        """
    ).fetchone()
    assert m["n_rows"] == got[0]
    assert m["n_null_o_orderpriority"] == got[1]
    assert m["sum_o_totalprice"] == got[2]
    # and the write actually landed everything
    assert m["n_rows"] == src.count()


def test_observation_costs_no_second_scan(spark, sf_dir):
    """The metrics come from the SAME job as the write: one action.
    Pin by counting jobs via the status tracker."""
    src = load_table(spark, sf_dir, "region")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    dest = tempfile.mkdtemp(prefix="obscopy1_")
    copy_with_metrics(src, dest, sum_col="r_regionkey")
    after = len(tracker.getJobIdsForGroup(None) or [])
    # exactly one Spark job for write+metrics (no verification re-scan)
    assert after - before == 1
