"""Mergeable histogram quantile state (operators/histogram.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators.histogram import (
    histogram_quantiles,
    histogram_state,
    merge_histogram_states,
)


@pytest.fixture()
def values(spark):
    # Two keys, values 1..100 (k=a) and 1..50 doubled (k=b).
    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", float(i)) for i in range(1, 51) for _ in range(2)
    ]
    return spark.createDataFrame(rows, ["k", "v"])


def test_state_shape_and_totals(values):
    st = histogram_state(values, ["k"], "v", lo=0.0, hi=128.0, n_bins=64)
    rows = {r["k"]: r["hist"] for r in st.collect()}
    assert all(len(h) == 66 for h in rows.values())
    assert sum(rows["a"]) == 100 and sum(rows["b"]) == 100
    # No under/overflow for in-range data.
    assert rows["a"][0] == 0 and rows["a"][65] == 0


def test_under_and_overflow_bins(spark):
    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.5), ("a", 99.0), ("a", 500.0)], ["k", "v"]
    )
    h = histogram_state(df, ["k"], "v", lo=0.0, hi=100.0, n_bins=10).collect()[0]["hist"]
    assert h[0] == 1 and h[11] == 1 and sum(h) == 4


def test_quantiles_within_one_bin_width(spark, values):
    st = histogram_state(values, ["k"], "v", lo=0.0, hi=128.0, n_bins=128)
    q = histogram_quantiles(st, ["k"], [0.5, 0.95], lo=0.0, hi=128.0)
    got = {r["k"]: (r["p50_est"], r["p95_est"]) for r in q.collect()}
    # width = 1: estimates are the exact lower edges of the value bins.
    assert got["a"] == (50.0, 95.0)
    assert got["b"] == (25.0, 48.0)  # ceil(.95*100)=95th of doubled 1..50


def test_merge_equals_single_pass(values):
    full = histogram_state(values, ["k"], "v", lo=0.0, hi=128.0, n_bins=64)
    part1 = histogram_state(
        values.where(F.col("v") <= 30), ["k"], "v", lo=0.0, hi=128.0, n_bins=64
    )
    part2 = histogram_state(
        values.where(F.col("v") > 30), ["k"], "v", lo=0.0, hi=128.0, n_bins=64
    )
    merged = merge_histogram_states([part1, part2], ["k"])
    a = {r["k"]: r["hist"] for r in full.collect()}
    b = {r["k"]: r["hist"] for r in merged.collect()}
    assert a == b
    # Merge is order-insensitive.
    rev = merge_histogram_states([part2, part1], ["k"])
    assert {r["k"]: r["hist"] for r in rev.collect()} == a


def test_nulls_ignored(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", None)], ["k", "v"])
    h = histogram_state(df, ["k"], "v", lo=0.0, hi=10.0, n_bins=5).collect()[0]["hist"]
    assert sum(h) == 1


def test_incremental_histogram_equals_single_pass(spark, tmp_path, values):
    from s3_rds_bq_airflow_spark.operators.histogram import incremental_histogram

    state_path = str(tmp_path / "hist_state")
    for lo_k, hi_k in ((0, 20), (20, 60), (60, 1000)):
        batch = values.where((F.col("v") > lo_k) & (F.col("v") <= hi_k))
        state = incremental_histogram(
            spark, state_path, batch,
            keys=["k"], value_col="v", lo=0.0, hi=128.0, n_bins=64,
        )
    single = histogram_state(values, ["k"], "v", lo=0.0, hi=128.0, n_bins=64)
    assert {r["k"]: r["hist"] for r in state.collect()} == {
        r["k"]: r["hist"] for r in single.collect()
    }
    # Quantiles from restored state match the single-pass answer.
    q1 = histogram_quantiles(state, ["k"], [0.5], lo=0.0, hi=128.0).collect()
    q2 = histogram_quantiles(single, ["k"], [0.5], lo=0.0, hi=128.0).collect()
    assert sorted(map(tuple, q1)) == sorted(map(tuple, q2))


def test_streaming_histogram_foreachbatch(spark, tmp_path):
    """The streaming tier: micro-batches folded via foreachBatch into
    the same persisted state the batch path uses."""
    import json
    import os

    from s3_rds_bq_airflow_spark.operators.histogram import incremental_histogram

    src = tmp_path / "stream_src"
    src.mkdir()
    for b in range(3):
        with open(src / f"b{b}.json", "w") as f:
            for i in range(1, 21):
                f.write(json.dumps({"k": "a", "v": float(b * 20 + i)}) + "\n")
    state_path = str(tmp_path / "stream_state")
    stream = (
        spark.readStream.schema("k STRING, v DOUBLE").json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, epoch: incremental_histogram(
                spark, state_path, df,
                keys=["k"], value_col="v", lo=0.0, hi=128.0, n_bins=64,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = spark.read.parquet(state_path)
    hist = final.collect()[0]["hist"]
    assert sum(hist) == 60  # every micro-batch row counted exactly once
