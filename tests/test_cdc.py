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


def test_stream_upsert_restart_from_checkpoint_mid_stream(spark, tmp_path):
    """End-to-end changefeed with a mid-stream kill (the engine's
    answer to a binlog sync restart, tap_mysql/sync_strategies/
    binlog.py:200-266): interleaved inserts/updates/deletes across 5
    micro-batch files, stop the query while it is draining, append
    more change files, restart from the SAME checkpoint, and the
    final parquet state must equal the one-shot batch oracle no
    matter where the kill landed. A third run with no new files must
    be a no-op (idempotent replay/exactly-once)."""
    d = str(tmp_path / "feed")
    os.makedirs(d)

    def write(name, rows, mtime):
        tbl = pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "name": pa.array([r[1] for r in rows], pa.string()),
                "seq": pa.array([r[2] for r in rows], pa.int64()),
                "_sdc_deleted_at": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        pq.write_table(tbl, os.path.join(d, name))
        os.utime(os.path.join(d, name), (mtime, mtime))

    D = "2024-01-01"
    batches = [
        [(1, "a", 1, None), (2, "b", 2, None)],
        [(3, "c", 3, None), (1, "a2", 4, None)],            # update 1
        [(2, None, 5, D), (4, "d", 6, None)],               # delete 2, insert 4
        [(4, None, 7, D), (4, "d2", 8, None), (5, "e", 9, None)],  # del+reinsert 4
        [(3, None, 10, D), (1, "a3", 11, None)],            # delete 3, update 1
    ]
    now = time.time()
    for i, rows in enumerate(batches[:3]):
        write(f"b{i}.parquet", rows, now + i)

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("_sdc_deleted_at", T.StringType()),
        ]
    )

    def start(available_now):
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(d)
        )
        return stream_upsert_parquet(
            stream,
            target,
            keys=["k"],
            order_cols=["seq"],
            checkpoint_dir=str(tmp_path / "ckpt"),
            tombstone_col="_sdc_deleted_at",
            available_now=available_now,
        )

    target = str(tmp_path / "tgt")
    # run 1: free-running; kill it somewhere mid-drain
    q = start(available_now=False)
    deadline = time.time() + 120
    while not os.path.exists(target) and time.time() < deadline:
        time.sleep(0.2)
    assert os.path.exists(target), "first micro-batch never landed"
    q.stop()
    q.awaitTermination(60)

    # feed keeps growing while the consumer is down
    for i, rows in enumerate(batches[3:], start=3):
        write(f"b{i}.parquet", rows, now + i)

    # run 2: restart from the same checkpoint, drain everything
    q2 = start(available_now=True)
    q2.awaitTermination(120)
    expected = {1: "a3", 4: "d2", 5: "e"}  # 2 and 3 tombstoned
    got = {r["k"]: r["name"] for r in spark.read.parquet(target).collect()}
    assert got == expected

    # run 3: no new files -> replay must not change state
    q3 = start(available_now=True)
    q3.awaitTermination(120)
    got3 = {r["k"]: r["name"] for r in spark.read.parquet(target).collect()}
    assert got3 == expected
