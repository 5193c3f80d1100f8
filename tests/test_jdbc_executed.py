"""EXECUTED JDBC round trips over embedded Derby (ships in Spark's
jars for the Hive metastore — no install, same classpath a real
cluster would give a JDBC driver).

This closes the gap the option-planning tests in test_sources.py
leave open: real rows through `spark.read.jdbc` / `df.write.jdbc`,
matching the reference's RDS paths — batched INSERT chunks
(s3-to-rds.py:376-428) and paginated reads replaced by the
partitioned range scan (rds-to-bq.py:256-275).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.io.jdbc import (
    bounds_probe_query,
    count_probe_query,
    read_jdbc_partitioned,
    write_jdbc_batched,
)

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def url(tmp_path_factory):
    return f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"


@pytest.fixture(scope="module")
def loaded(spark, url):
    """1000 rows written through the batched JDBC sink once per module."""
    df = spark.range(1, 1001).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 2).cast("double").alias("v"),
    )
    write_jdbc_batched(
        df, url, table="people", mode="overwrite", batch_size=100, properties=DERBY
    )
    return df


def test_partitioned_read_round_trip(spark, url, loaded):
    got = read_jdbc_partitioned(
        spark,
        url,
        table="people",
        partition_column="k",
        lower_bound=1,
        upper_bound=1001,
        num_partitions=4,
        properties=DERBY,
    )
    assert got.rdd.getNumPartitions() == 4  # four parallel range queries
    assert sorted(got.collect()) == sorted(loaded.collect())


def test_stale_bounds_lose_no_rows(spark, url, loaded):
    """lower/upper only steer split points: rows OUTSIDE the bounds
    land in the unbounded first/last partition (the invariant that
    makes a stale max-PK probe safe, vs the reference's keyset
    resume)."""
    got = read_jdbc_partitioned(
        spark,
        url,
        table="people",
        partition_column="k",
        lower_bound=400,
        upper_bound=600,
        num_partitions=3,
        properties=DERBY,
    )
    assert got.count() == 1000


def test_bounds_probe_pushdown(spark, url, loaded):
    probe = spark.read.format("jdbc").option("url", url)
    for k, v in DERBY.items():
        probe = probe.option(k, v)
    row = probe.option("dbtable", bounds_probe_query("people", '"k"')).load().first()
    assert (row["LO"], row["HI"]) == (1, 1000)


def test_count_probe_pushdown(spark, url, loaded):
    probe = spark.read.format("jdbc").option("url", url)
    for k, v in DERBY.items():
        probe = probe.option(k, v)
    row = (
        probe.option("dbtable", count_probe_query("people", where='"k" <= 100'))
        .load()
        .first()
    )
    assert row["CNT"] == 100


def test_append_mode_accumulates(spark, url, loaded):
    extra = spark.range(1001, 1101).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 2).cast("double").alias("v"),
    )
    write_jdbc_batched(
        extra, url, table="people_app", mode="overwrite", batch_size=50, properties=DERBY
    )
    write_jdbc_batched(
        extra, url, table="people_app", mode="append", batch_size=50, properties=DERBY
    )
    got = spark.read.format("jdbc").options(url=url, dbtable="people_app", **DERBY).load()
    assert got.count() == 200
