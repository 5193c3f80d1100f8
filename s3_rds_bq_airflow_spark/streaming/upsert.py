"""Streaming merge-upsert sink (the reference's CDC landing path).

The reference's Meltano target applies each Singer batch as a
ROW_NUMBER dedup + ``MERGE`` into the warehouse table
(`target_bigquery/core.py:536-563`); its binlog path would feed that
same merge from change events. Spark-native: ``foreachBatch`` gives
each micro-batch as a DataFrame plus a monotonically increasing
``batch_id`` — applying the engine's batch ``merge_upsert`` there,
with an atomic directory swap, yields an idempotent, effectively
exactly-once upsert sink on plain parquet (checkpoint replays rerun
the same batch_id; the swap makes the rerun a no-op overwrite).

On Delta/Iceberg the body of ``_apply_batch`` collapses to
``MERGE INTO`` and the swap disappears; the surface stays the same.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..io.atomic import swap_directory
from ..operators.merge import merge_upsert


def _apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    target_path: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    tombstone_col: str | None = None,
) -> None:
    if not batch.columns:
        return
    if os.path.exists(target_path):
        target = spark.read.parquet(target_path)
        merged = merge_upsert(
            target, batch, keys, source_order=order_cols, tombstone_col=tombstone_col
        )
    else:
        from ..operators.merge import dedup_latest

        merged = dedup_latest(batch, keys, order_cols)
        if tombstone_col is not None:
            merged = merged.where(F.col(tombstone_col).isNull()).drop(tombstone_col)
    tmp = target_path.rstrip("/") + "__sdc_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    swap_directory(tmp, target_path)


def stream_upsert_parquet(
    stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    *,
    checkpoint_dir: str,
    available_now: bool = True,
    tombstone_col: str | None = None,
) -> StreamingQuery:
    """Upsert a stream into a parquet target, latest-row-per-key.

    ``order_cols`` break ties within and across batches (end with a
    unique column, e.g. the event id). ``tombstone_col``: CDC delete
    marker — a non-null value removes the key (binlog-shaped feeds).
    """
    spark = stream.sparkSession

    def do_batch(batch: DataFrame, batch_id: int) -> None:
        _apply_batch(spark, batch, target_path, keys, order_cols, tombstone_col)

    writer = (
        stream.writeStream.foreachBatch(do_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
