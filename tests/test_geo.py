"""Grid-bucketed exact nearest neighbor (operators/geo.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W, functions as F

from s3_rds_bq_airflow_spark.operators.geo import grid_nearest_neighbor


def _brute(left, right):
    w = W.partitionBy("lid").orderBy(F.col("d2"), F.col("rid"))
    d2 = (F.col("lx") - F.col("rx")) * (F.col("lx") - F.col("rx")) + (
        F.col("ly") - F.col("ry")
    ) * (F.col("ly") - F.col("ry"))
    return (
        left.crossJoin(right)
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("lid", F.col("rid").alias("nearest_rid"), F.col("d2").alias("dist2"))
    )


def _nn(left, right, cell):
    return grid_nearest_neighbor(
        left,
        right,
        left_key="lid",
        right_key="rid",
        left_coords=("lx", "ly"),
        right_coords=("rx", "ry"),
        cell=cell,
    ).withColumnRenamed("nearest_rid", "nearest_rid")


def test_matches_brute_force_dense(spark):
    left = spark.createDataFrame(
        [(i, float(i % 13), float((i * 7) % 17)) for i in range(60)],
        ["lid", "lx", "ly"],
    )
    right = spark.createDataFrame(
        [(j, float(j % 15), float((j * 3) % 19)) for j in range(40)],
        ["rid", "rx", "ry"],
    )
    got = sorted(_nn(left, right, cell=4.0).collect())
    want = sorted(_brute(left, right).collect())
    assert got == want


def test_sparse_region_falls_back_exactly(spark):
    # Right points clustered far from an isolated left point: its 3x3
    # neighborhood at cell=1 is empty, so only the brute-force residue
    # can answer — and it must, exactly.
    left = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 100.0, 100.0)], ["lid", "lx", "ly"]
    )
    right = spark.createDataFrame(
        [(10, 0.5, 0.5), (20, 90.0, 90.0)], ["rid", "rx", "ry"]
    )
    got = {r["lid"]: r["nearest_rid"] for r in _nn(left, right, cell=1.0).collect()}
    assert got == {1: 10, 2: 20}
    # One row per left point — no duplicates from the union.
    assert _nn(left, right, cell=1.0).count() == 2


def test_boundary_guarantee_ties(spark):
    # Two right points equidistant: tie-break must pick the lower key,
    # same as brute force, regardless of which path resolves it.
    left = spark.createDataFrame([(1, 0.0, 0.0)], ["lid", "lx", "ly"])
    right = spark.createDataFrame(
        [(7, 3.0, 0.0), (5, -3.0, 0.0)], ["rid", "rx", "ry"]
    )
    for cell in (1.0, 2.9, 3.0, 10.0):
        rows = _nn(left, right, cell).collect()
        assert len(rows) == 1 and rows[0]["nearest_rid"] == 5


def test_coord_name_collision_rejected(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], ["lid", "x", "y"])
    with pytest.raises(ValueError, match="must differ"):
        grid_nearest_neighbor(
            df,
            df.withColumnRenamed("lid", "rid"),
            left_key="lid",
            right_key="rid",
            left_coords=("x", "y"),
            right_coords=("x", "y"),
            cell=1.0,
        )
