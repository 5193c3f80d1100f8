"""CDC delete-tombstone semantics (binlog-shaped feeds): merge and
streaming upsert must remove tombstoned keys, and an in-batch
delete-then-reinsert resolves to the latest row image."""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators.merge import merge_upsert
from s3_rds_bq_airflow_spark.streaming import stream_upsert_parquet
from s3_rds_bq_airflow_spark.streaming.source import event_schema  # noqa: F401  (schema shape reference)


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_merge_tombstone_deletes_and_reinserts(spark):
    target = _df(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "name", "v"])
    # key 2: plain delete. key 3: update. key 4: insert.
    # key 1: delete at seq 5 then re-insert at seq 6 -> survives as new row.
    source = _df(
        spark,
        [
            (2, None, None, 5, "2024-01-01"),
            (3, "c2", 33, 5, None),
            (4, "d", 40, 5, None),
            (1, None, None, 5, "2024-01-01"),
            (1, "a2", 11, 6, None),
        ],
        ["k", "name", "v", "seq", "_sdc_deleted_at"],
    )
    out = merge_upsert(
        target,
        source,
        ["k"],
        source_order=["seq"],
        tombstone_col="_sdc_deleted_at",
    )
    got = {r["k"]: (r["name"], r["v"]) for r in out.collect()}
    assert got == {1: ("a2", 11), 3: ("c2", 33), 4: ("d", 40)}  # 2 deleted


def test_stream_upsert_with_tombstones(spark, tmp_path):
    d = str(tmp_path / "cdc_landing")
    os.makedirs(d)

    def write(path, rows, mtime):
        tbl = pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "name": pa.array([r[1] for r in rows], pa.string()),
                "seq": pa.array([r[2] for r in rows], pa.int64()),
                "_sdc_deleted_at": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    now = time.time()
    write(os.path.join(d, "b0.parquet"), [(1, "a", 1, None), (2, "b", 1, None)], now)
    write(os.path.join(d, "b1.parquet"), [(1, None, 2, "2024-01-02"), (3, "c", 2, None)], now + 5)

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("_sdc_deleted_at", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(d)
    target = str(tmp_path / "cdc_target")
    q = stream_upsert_parquet(
        stream,
        target,
        keys=["k"],
        order_cols=["seq"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        tombstone_col="_sdc_deleted_at",
    )
    q.awaitTermination(120)
    got = {r["k"]: r["name"] for r in spark.read.parquet(target).collect()}
    assert got == {2: "b", 3: "c"}  # key 1 tombstoned in batch 1
