"""operators/rangebucket: exact global order statistics without a
single-partition window — values must be bit-identical to the
global-window truth, including under heavy ties, both directions, and
bucket counts that exceed the distinct-value count.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators.rangebucket import ordered_running
from s3_rds_bq_airflow_spark.plans import (
    assert_no_single_partition_window,
    single_partition_windows,
)

# (id, value): duplicates, a zero, and a dominant head — the shapes
# that break naive bucketing (ties straddling a boundary would split
# a value across buckets; the >boundary rule makes that impossible).
ROWS = [
    (1, 50),
    (2, 10),
    (3, 50),
    (4, 0),
    (5, 7),
    (6, 10),
    (7, 10),
    (8, 3),
    (9, 1000),
    (10, 50),
]


def _truth(descending):
    order = sorted(
        ROWS, key=lambda r: ((-r[1] if descending else r[1]), r[0])
    )
    cum, out = 0, {}
    for i, (rid, val) in enumerate(order, start=1):
        cum += val
        out[rid] = (cum, i)
    return out


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("n_buckets", [2, 4, 64])
def test_matches_global_window_truth(spark, descending, n_buckets):
    df = spark.createDataFrame(ROWS, "id long, v long")
    got = ordered_running(
        df,
        "v",
        "id",
        descending=descending,
        n_buckets=n_buckets,
        cum_col="cum",
        index_col="i",
    )
    truth = _truth(descending)
    for r in got.collect():
        assert (int(r["cum"]), r["i"]) == truth[r["id"]], (
            r["id"],
            descending,
            n_buckets,
        )


def test_plan_has_no_single_partition_window(spark):
    df = spark.createDataFrame(ROWS, "id long, v long")
    out = ordered_running(df, "v", "id", cum_col="cum", index_col="i")
    assert_no_single_partition_window(out)


def test_detector_flags_the_global_window(spark):
    """The pin's detector must actually fire on the plan shape the
    operator exists to avoid — otherwise the pin proves nothing."""
    from pyspark.sql import Window as W

    df = spark.createDataFrame(ROWS, "id long, v long")
    bad = df.withColumn(
        "i", F.row_number().over(W.orderBy(F.col("v"), F.col("id")))
    )
    assert single_partition_windows(bad)


def test_rejects_no_output_request(spark):
    df = spark.createDataFrame(ROWS, "id long, v long")
    with pytest.raises(ValueError):
        ordered_running(df, "v", "id")
    with pytest.raises(ValueError):
        ordered_running(df, "v", "id", n_buckets=1, cum_col="c")
