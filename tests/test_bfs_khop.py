"""q_bfs_khop / operators/cluster.bfs_khop: minimum-hop BFS.
Replays the hop expansion in pure Python over the same stride graph
and checks exact (id, dist) equality, plus a crafted diamond graph
where a node is reachable at two different depths (min must win)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from s3_rds_bq_airflow_spark.operators.cluster import bfs_khop
from s3_rds_bq_airflow_spark.queries.clusterq import _BFS_K, _BFS_STRIDES


def test_matches_python_bfs_at_sf0001(spark):
    import duckdb

    ids = {
        r[0]
        for r in duckdb.sql(
            "SELECT c_custkey FROM read_parquet('/root/testdata/sf0.001/customer.parquet')"
        ).fetchall()
    }
    dist = {i: 0 for i in ids if i < 5}
    frontier = set(dist)
    for h in range(1, _BFS_K + 1):
        nxt = {
            v + s
            for v in frontier
            for s in _BFS_STRIDES
            if v + s in ids and v + s not in dist
        }
        for n in nxt:
            dist[n] = h
        frontier = nxt
    got = {
        r["id"]: r["dist"]
        for r in entrymod.queries()["q_bfs_khop"](spark, "/root/testdata/sf0.001").collect()
    }
    assert got == dist


def test_min_distance_wins_on_diamond(spark):
    # 0->1->2->3 and 0->3: node 3 is depth 1 and depth 3; BFS says 1
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3)], ["src", "dst"]
    )
    sources = spark.createDataFrame([(0,)], ["id"])
    got = {r["id"]: r["dist"] for r in bfs_khop(sources, edges, 4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1}


def test_labeled_bfs_matches_per_source_runs(spark):
    """bfs_khop_labeled == an independent bfs_khop per source: the
    labeled generalization must not let sources interfere (the
    visited anti-join is keyed on (src_id, id), not id alone)."""
    from pyspark.sql import functions as F

    from s3_rds_bq_airflow_spark.operators.cluster import bfs_khop_labeled

    nodes = spark.range(0, 60).select(F.col("id"))
    strides = F.array(F.lit(7), F.lit(13))
    edges = (
        nodes.select("id", F.explode(strides).alias("d"))
        .select(F.col("id").alias("src"), (F.col("id") + F.col("d")).alias("dst"))
        .join(nodes.withColumnRenamed("id", "dst"), "dst")
    )
    sources = nodes.where(F.col("id") < 3).select(
        F.col("id").alias("src_id"), "id"
    )
    got = {
        (r.src_id, r.id): r.dist
        for r in bfs_khop_labeled(sources, edges, 4).collect()
    }
    for s in range(3):
        single = nodes.where(F.col("id") == s)
        per_src = {
            r.id: r.dist for r in bfs_khop(single, edges, 4).collect()
        }
        labeled = {i: d for (src, i), d in got.items() if src == s}
        assert labeled == per_src, f"source {s} diverged"
