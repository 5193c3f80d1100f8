"""File-source event stream (micro-batch arrival simulation).

The reference tails a MySQL binlog for change events
(`binlog.py:200-266` turns row-images into Singer RECORDs); the
Spark-native equivalent surface is a directory that files land in —
each micro-batch picks up newly arrived files, exactly once, tracked
in the checkpoint log. The same code runs against S3/GCS paths on a
cluster; only the path string changes.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Streaming file sources require a user-supplied schema: no inference
# race with concurrently arriving files. Watermarks require TIMESTAMP
# (not NTZ) — the no-zone micros in the files are interpreted in the
# session timezone, which the engine pins to UTC (session.py), keeping
# wall-clock parity with the batch side.
def event_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_event_stream(
    spark: SparkSession,
    directory: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over a landing directory of event parquet files.

    ``max_files_per_trigger`` throttles micro-batch size (and, in
    tests, forces multi-batch execution so watermark advancement
    between batches is observable).
    """
    reader = spark.readStream.schema(event_schema()).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(directory)


def stage_as_files(
    src_parquet: str,
    out_dir: str,
    *,
    n_files: int = 4,
) -> list[str]:
    """Split one events parquet into ``n_files`` arrival files.

    Timestamps are truncated ns -> us (same truncation ``load_table``
    applies on the batch side) so the staged files match
    ``event_schema``. File modification times increase with file index
    — the streaming source processes oldest-first, making multi-batch
    runs deterministic.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(src_parquet)
    ts_idx = tbl.schema.get_field_index("ts")
    ts_type = tbl.schema.field("ts").type
    if pa.types.is_timestamp(ts_type) and ts_type.unit == "ns":
        tbl = tbl.set_column(
            ts_idx, "ts", tbl.column("ts").cast(pa.timestamp("us"), safe=False)
        )
    os.makedirs(out_dir, exist_ok=True)
    n_rows = tbl.num_rows
    chunk = (n_rows + n_files - 1) // n_files
    paths: list[str] = []
    now = time.time()
    for i in range(n_files):
        part = tbl.slice(i * chunk, chunk)
        if part.num_rows == 0:
            break
        path = os.path.join(out_dir, f"part-{i:04d}.parquet")
        pq.write_table(part, path)
        os.utime(path, (now + i, now + i))
        paths.append(path)
    return paths
