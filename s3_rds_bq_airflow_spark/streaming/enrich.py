"""Stream-to-dimension enrichment with a refreshable dimension.

A plain stream-static join binds the dimension ONCE at plan time —
updates to the dimension table are invisible for the life of the
query on some sources, and never versioned. The robust pattern, used
by CDC consumers everywhere: re-read the CURRENT dimension inside
``foreachBatch`` and broadcast-join it to the micro-batch. Each batch
sees the dimension as of its own execution — the streaming face of a
lookup against an SCD's current slice (``operators/scd``).

Dimension reads are per-batch, so keep the dimension small/pruned
(current rows only) — exactly what broadcast requires anyway.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_enrich_parquet(
    stream: DataFrame,
    dim_path: str,
    out_path: str,
    *,
    on: Sequence[str],
    checkpoint_dir: str,
    how: str = "left",
    available_now: bool = True,
) -> StreamingQuery:
    """Enrich each micro-batch with the dimension AS OF that batch and
    append the result to a parquet sink."""
    spark = stream.sparkSession

    def do_batch(batch: DataFrame, batch_id: int) -> None:
        dim = F.broadcast(spark.read.parquet(dim_path))
        (
            batch.join(dim, on=list(on), how=how)
            .withColumn("_enriched_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    writer = (
        stream.writeStream.foreachBatch(do_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
