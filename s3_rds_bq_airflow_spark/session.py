"""SparkSession factory.

Tuning here is cluster-portable: AQE (runtime re-planning, partition
coalescing, skew-join splitting), UTC session time, Arrow for any
pandas exchange. Local test runs use ``local[$SPARK_GRAFT_CPUS]``;
on a real cluster the same builder works with a cluster master.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "s3-rds-bq-airflow-spark",
    master: str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``spark.sql.shuffle.partitions`` defaults to the local core count —
    at cluster scale you would size it to ~2-3x total executor cores or
    simply rely on AQE coalescing, which is enabled.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # Keep auto-broadcast at Spark's stock 10m: true dimensions are
        # broadcast EXPLICITLY in queries; letting mid-size fact slices
        # auto-broadcast serializes the probe pipeline into the scan
        # stage (measured 1.4x slower on q3) and is exactly the plan
        # that breaks first at 100 TB.
        .config("spark.sql.autoBroadcastJoinThreshold", "10m")
        # Runtime bloom-filter join pruning: the probe side of a big
        # join is pre-filtered by a bloom filter built from the build
        # side's join keys — scan-side row-group skipping at 100 TB.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
