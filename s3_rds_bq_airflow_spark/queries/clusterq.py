"""Dedup clustering: connected components over duplicate CHAINS.

The corpus plants two twins per seed document (ids +1M and +2M) and
the edge set links only ADJACENT ids within a content group (a path
A-B-C, never the A-C closure edge) — so the expected clusters are
recoverable only by transitive label propagation, which is exactly
what the oracle's per-content grouping states declaratively.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from ..operators.cluster import connected_components
from ..operators.dedup import normalize_text
from .registry import query
from ._util import t
from .textops import NORMALIZE_SQL


@query(
    "q_dedup_clusters",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 17 = 0
        UNION ALL
        SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 17 = 0
    )
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY MD5({NORMALIZE_SQL})) AS cluster_id,
           COUNT(*)    OVER (PARTITION BY MD5({NORMALIZE_SQL})) AS cluster_size
    FROM corpus
    """,
)
def q_dedup_clusters(spark, sf_dir):
    """Iterative min-label connected components over a path-shaped
    duplicate graph; result must equal the declarative content-group
    clustering (proving 2-hop transitive closure actually happened)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = docs.where(F.col("doc_id") % 17 == 0)
    corpus = docs.unionByName(
        seeds.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    ).unionByName(seeds.select((F.col("doc_id") + 2000000).alias("doc_id"), "text"))
    fp = corpus.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("content_fp"))
    # path edges: adjacent ids within each content group
    w = W.partitionBy("content_fp").orderBy("doc_id")
    edges = (
        fp.withColumn("prev_id", F.lag("doc_id").over(w))
        .where(F.col("prev_id").isNotNull())
        .select(F.col("prev_id").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    nodes = fp.select(F.col("doc_id").alias("id"))
    labels = connected_components(nodes, edges)
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sizes, "cluster_id")
        .select(F.col("id").alias("doc_id"), "cluster_id", "cluster_size")
    )
