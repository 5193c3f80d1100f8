"""PageRank power iteration: analytic values on known graphs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators.cluster import pagerank


def test_pagerank_symmetric_cycle(spark):
    """On a directed cycle every node has identical rank 1.0."""
    nodes = spark.range(4).select(F.col("id"))
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 0)], ["src", "dst"])
    ranks = {r["id"]: r["rank"] for r in pagerank(nodes, edges).collect()}
    for v in ranks.values():
        assert math.isclose(v, 1.0, rel_tol=1e-4)


def test_pagerank_star_hub(spark):
    """Spokes pointing at a hub: the hub accumulates rank; analytic
    fixpoint for 1 hub + k spokes (spokes dangling -> uniform
    redistribution) is solvable and the ranks must sum to n."""
    k = 4
    nodes = spark.range(k + 1).select(F.col("id"))  # 0 = hub
    edges = spark.createDataFrame([(i, 0) for i in range(1, k + 1)], ["src", "dst"])
    got = {r["id"]: r["rank"] for r in pagerank(nodes, edges, max_iterations=60, tol=1e-9).collect()}
    total = sum(got.values())
    assert math.isclose(total, k + 1, rel_tol=1e-3)
    assert got[0] > got[1]  # hub dominates
    for i in range(2, k + 1):
        assert math.isclose(got[i], got[1], rel_tol=1e-6)  # spokes symmetric
