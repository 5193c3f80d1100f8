"""Streaming in-flight verification metrics: `DataFrame.observe` on a
streaming source surfaces per-micro-batch aggregates through
`StreamingQueryProgress.observedMetrics` — the zero-extra-pass
verification contract of `operators/observed_copy` extended to the
stream side. The summed per-batch observed rows/control total must
equal the batch-side truth over the same files.
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid

import duckdb
from pyspark.sql import functions as F


def test_streaming_observed_metrics_sum_to_batch_truth(spark, sf_dir):
    from s3_rds_bq_airflow_spark.streaming import read_event_stream, stage_as_files

    landing = tempfile.mkdtemp(prefix="obs_stream_")
    stage_as_files(os.path.join(sf_dir, "events.parquet"), landing, n_files=4)
    table = f"obs_stream_{uuid.uuid4().hex[:8]}"
    # Control total in INTEGER CENTS: observed metrics travel to the
    # listener through JSON, where a decimal becomes a float — longs
    # survive exactly (the same reason declared queries emit scaled
    # integers).
    stream = read_event_stream(spark, landing).observe(
        "load_metrics",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("value").cast("decimal(28,2)") * 100).cast("long")).alias(
            "sum_cents"
        ),
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # Per-batch observed metrics accumulate on the query's progress
    # events; availableNow has terminated, so recentProgress is final.
    n_rows = 0
    sum_cents = 0
    for p in q.recentProgress:
        m = (p.get("observedMetrics") or {}).get("load_metrics")
        if not m:
            continue
        n_rows += m["n_rows"]
        if m["sum_cents"] is not None:
            sum_cents += m["sum_cents"]
    truth = duckdb.sql(
        f"""
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(CAST(value AS DECIMAL(28,2)) * 100 AS BIGINT))
                    AS BIGINT) AS s_cents
        FROM read_parquet('{os.path.join(sf_dir, "events.parquet")}')
        """
    ).fetchone()
    assert n_rows == truth[0]
    assert sum_cents == truth[1]
    # and the sink actually landed the same row count
    assert spark.table(table).count() == truth[0]
