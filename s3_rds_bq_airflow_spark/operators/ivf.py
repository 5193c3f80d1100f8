"""IVF (inverted-file) approximate nearest neighbor search.

The second classic ANN family next to hyperplane LSH
(``similarity.py``): cluster the corpus into ``n_centroids`` coarse
cells (k-means), store each vector in its cell's inverted list, and
answer a query by scanning only the ``n_probe`` cells whose
centroids are closest to the query — exact re-rank inside the probed
cells. Versus LSH: buckets adapt to the data distribution (no empty/
overfull hyperplane cells), and the probe count directly trades
recall for scan fraction (~n_probe/n_centroids of the corpus).

Everything is DataFrame ops and deterministic:

- init: the ``n_centroids`` vectors with the smallest ``xxhash64(id)``
  — a seeded pseudo-random draw with no RNG state;
- Lloyd iterations: assign = broadcast-centroid join + per-vector
  top-1 window (centroid count is small by construction — broadcast
  is the right plan at any corpus size); update = element-wise mean
  via posexplode + (cid, pos) average + ordered rebuild. A FIXED
  iteration count, not a convergence probe: bit-stable plans, no
  driver round-trips;
- search: rank centroids by cosine to the query, scan the top
  ``n_probe`` inverted lists, exact cosine re-rank.

At 100 TB the assignment table is written ``partitionBy(cid)`` so a
probe reads only its cells' files (partition pruning); the per-round
shuffle is one (cid, pos) aggregate over dim-exploded rows.
Correctness anchor: probing ALL cells is exactly brute force —
pinned in tests; recall at small n_probe is pinned on planted
structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .similarity import cosine_exact, cosine_fast

__all__ = ["ivf_fit", "ivf_assign", "ivf_topk"]


def _rebuild(vec_struct_list):  # ordered array<float> from (pos, x) structs
    return F.transform(F.array_sort(vec_struct_list), lambda s: s["x"])


def ivf_fit(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iters: int = 2,
) -> DataFrame:
    """Fit coarse centroids; returns (cid int, cvec array)."""
    seed_rows = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
    )
    w = W.orderBy(F.col(id_col))
    centroids = seed_rows.select(
        (F.row_number().over(w) - 1).alias("cid"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    for _ in range(n_iters):
        assigned = ivf_assign(
            embeddings, centroids, id_col=id_col, vec_col=vec_col
        )
        means = (
            assigned.select("cid", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("x"))
        )
        new_means = means.groupBy("cid").agg(
            _rebuild(F.collect_list(F.struct("pos", "x"))).alias("cvec")
        )
        # A Lloyd round can leave a cell empty (no vector assigned);
        # dropping it would silently shrink the centroid set below
        # n_centroids and make n_probe cover a larger fraction than
        # callers expect. Keep the PRIOR centroid vector for any cell
        # the update produced no mean for.
        centroids = (
            centroids.alias("prev")
            .join(new_means.alias("new"), "cid", "left")
            .select(
                "cid",
                F.coalesce(F.col("new.cvec"), F.col("prev.cvec")).alias("cvec"),
            )
        )
    return centroids


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach each vector's nearest-centroid ``cid`` (cosine metric,
    ties to the smaller cid)."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim", cosine_fast(F.col(vec_col), F.col("cvec"))
    )
    w = W.partitionBy(id_col).orderBy(F.col("__sim").desc(), F.col("cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, vec_col, "cid")
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    query_vec: DataFrame,
    *,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Top-k by cosine: probe the ``n_probe`` best cells, exact
    re-rank inside them. ``assigned`` is ``ivf_assign`` output (at
    scale: persisted partitionBy(cid) so probes prune files).

    ``exact=True`` re-ranks candidates with the decimal-exact cosine
    (engine-portable ordering — with full probe the result is
    bit-identical to the brute-force oracle); cell selection stays on
    the fast double path either way."""
    q = query_vec.select(F.col(vec_col).alias("_qvec"))
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "cid", "_qvec", cosine_fast(F.col("cvec"), F.col("_qvec")).alias("__csim")
        )
        .orderBy(F.col("__csim").desc(), F.col("cid"))
        .limit(n_probe)
        .select("cid", "_qvec")
    )
    cands = assigned.join(F.broadcast(probe_cells), "cid")
    cos = (cosine_exact if exact else cosine_fast)(F.col(vec_col), F.col("_qvec"))
    return (
        cands.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
