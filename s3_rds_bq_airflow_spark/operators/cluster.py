"""Connected components over near-duplicate edges (entity/dedup
clustering).

Pairwise dedup (exact, MinHash, SimHash — ``operators/dedup.py``)
yields EDGES; collapsing a duplicate group needs the transitive
closure: A~B and B~C must land A, B, C in one cluster even if A~C was
never emitted as a pair. That closure is connected components —
computed here as iterative min-label propagation, pure DataFrame ops:

    label(n) <- min(label(n), min over neighbors m of label(m))

repeated to fixpoint. Each round is one shuffle join + one aggregate;
rounds needed = graph diameter (dedup clusters are shallow — near-dup
chains rarely exceed a handful of hops; a large-star/small-star
variant would cut worst cases to O(log n) rounds). Lineage is cut
every round with an eager localCheckpoint so the plan doesn't grow
exponentially — the standard Spark iterative-algorithm discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``nodes``: one column ``id_col``; ``edges``: undirected pairs
    (``src_col``, ``dst_col``). Returns (id, cluster_id). Converges
    when a full round changes no label; raises if ``max_iterations``
    rounds don't reach the fixpoint (pathological diameter — switch
    to star-contraction before raising the cap).
    """
    bidir = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        msgs = bidir.join(labels, bidir.src == labels.id).select(
            F.col("dst").alias("id"), "cluster_id"
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        # Fixpoint = no label changed this round. Counting changed
        # rows (capped at 1) works for ANY orderable id type — the
        # previous sum(cluster_id) probe returned NULL for string ids,
        # making round 1 look converged and silently emitting
        # non-transitive clusters.
        changed = (
            labels.withColumnRenamed("cluster_id", "__prev")
            .join(new_labels, "id")
            .where(~F.col("__prev").eqNullSafe(F.col("cluster_id")))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no fixpoint in {max_iterations} rounds")


def cluster_sizes(labels: DataFrame) -> DataFrame:
    """(cluster_id, cluster_size) from a component labeling."""
    return labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))


def star_contraction_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components by large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the scale path ``connected_components``'s docstring
    promises for pathological diameters: label propagation needs
    diameter-many rounds (a 10M-node chain = 10M shuffles), star
    contraction provably converges in O(log^2 n) rounds regardless
    of shape, each round two grouped aggregates + joins on edge
    keys. Same contract as ``connected_components``: returns
    (id, cluster_id) with cluster_id = min reachable id.

    - large-star: every neighbor LARGER than u re-parents to
      m(u) = min(neighbors(u) + {u}) — shrinks tall structures;
    - small-star: every neighbor SMALLER than u (and u itself)
      re-parents to the min smaller neighbor — flattens into stars.

    Fixpoint = the edge set stops changing, checked EXACTLY: a
    per-round count, and — only when counts match — an
    ``exceptAll``-emptiness probe (both sets are distinct, so equal
    cardinality + empty one-sided difference <=> set equality). No
    hash-collision risk; the extra difference job runs just on
    candidate-fixpoint rounds. The final edges are stars (child ->
    component min), so the labeling is a single left join,
    singletons labeling themselves.
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = e.count()
    for _ in range(max_iterations):
        bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
        # large-star
        mins = (
            bidir.groupBy("u")
            .agg(F.min("v").alias("__mn"))
            .select("u", F.least(F.col("__mn"), F.col("u")).alias("m"))
        )
        large = (
            bidir.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over the large-star output, edges directed big->small
        directed = large.select(
            F.greatest(F.col("u"), F.col("v")).alias("bu"),
            F.least(F.col("u"), F.col("v")).alias("bv"),
        ).distinct()
        mins2 = directed.groupBy("bu").agg(F.min("bv").alias("m"))
        e_new = (
            directed.join(mins2, "bu")
            .select(F.col("bv").alias("u"), F.col("m").alias("v"))
            .union(mins2.select(F.col("bu").alias("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_new = e_new.count()
        converged = n_new == n_prev and e_new.exceptAll(e).isEmpty()
        e, n_prev = e_new, n_new
        if converged:
            break
    else:
        raise RuntimeError(
            f"star_contraction_components: no fixpoint in {max_iterations} rounds"
        )
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(
            e.select(F.col("u").alias("id"), F.col("v").alias("cluster_id")),
            "id",
            "left",
        )
        .select("id", F.coalesce("cluster_id", "id").alias("cluster_id"))
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """PageRank by power iteration, pure DataFrame ops.

    Per round: contributions = rank/out_degree shipped along edges
    (one shuffle join + one aggregate), dangling mass redistributed
    uniformly, lineage cut with an eager localCheckpoint. Stops when
    the L1 rank delta drops under ``tol`` (sum of ranks stays ~n).
    Returns (id, rank).
    """
    n = nodes.count()
    out_deg = edges.groupBy(F.col(src_col).alias("id")).agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.select(F.col(id_col).alias("id"), F.lit(1.0).alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        with_deg = ranks.join(out_deg, "id", "left")
        contribs = (
            edges.join(
                with_deg.where(F.col("out_deg").isNotNull()).select(
                    F.col("id").alias(src_col), (F.col("rank") / F.col("out_deg")).alias("c")
                ),
                src_col,
            )
            .groupBy(F.col(dst_col).alias("id"))
            .agg(F.sum("c").alias("in_c"))
        )
        dangling = (
            with_deg.where(F.col("out_deg").isNull()).agg(F.sum("rank")).collect()[0][0] or 0.0
        )
        new_ranks = (
            ranks.select("id")
            .join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * (F.coalesce(F.col("in_c"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
        new_ranks = new_ranks.localCheckpoint(eager=True)
        delta = (
            ranks.join(new_ranks.withColumnRenamed("rank", "new_rank"), "id")
            .agg(F.sum(F.abs(F.col("rank") - F.col("new_rank"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol * n:
            break
    return ranks


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 10,
) -> DataFrame:
    """Community detection by synchronous label propagation.

    Connected components answers "what is transitively linked";
    label propagation answers the softer "what clusters DENSELY" —
    communities in co-occurrence / interaction graphs (the natural
    next step after dedup edges: near-dup families vs. topical
    groups). Each round every node adopts the most frequent label
    among its neighbors AND itself (the self-vote damps the classic
    synchronous-LPA oscillation on bipartite structures); ties break
    to the smallest label, so the whole algorithm is deterministic —
    no random visit order, unlike textbook asynchronous LPA.

    Per round: one shuffle join (ship labels along edges) + one
    (node, label) count + one per-node top-1 window — all key-
    partitioned, nothing collected to the driver except the 1-row
    convergence probe. Lineage cut per round with eager
    localCheckpoint. Returns (id, label) at fixpoint or after
    ``max_iterations`` rounds (LPA is not guaranteed to reach a
    fixpoint; the cap is part of the algorithm's contract, not an
    error — unlike connected_components which must converge).
    """
    from pyspark.sql import Window as W

    bidir = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        votes = bidir.join(labels, bidir.src == labels.id).select(
            F.col("dst").alias("id"), "label"
        )
        tally = (
            votes.unionByName(labels)  # self-vote
            .groupBy("id", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        w = W.partitionBy("id").orderBy(F.col("n").desc(), F.col("label").asc())
        new_labels = (
            tally.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("id", "label")
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            labels.withColumnRenamed("label", "__prev")
            .join(new_labels, "id")
            .where(~F.col("__prev").eqNullSafe(F.col("label")))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def bfs_khop(
    sources: DataFrame,
    edges: DataFrame,
    k: int,
    *,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Unweighted shortest-path (BFS) distances from a source set,
    bounded at ``k`` hops: (id, dist) for every node reachable within
    k edges, dist = MINIMUM hop count. The Pregel iteration pattern
    (one frontier-vs-edges equi-join + dedup per hop) expressed as
    plain DataFrame ops — the reachability primitive beside the
    components/PageRank/label-propagation family.

    Scale: per hop, only the FRONTIER (nodes first reached this hop —
    an anti-join against the visited set keeps it tight) joins the
    edge list; visited-set growth is the output itself. k is a fixed
    small constant so the loop unrolls into one DAG; lineage stays
    k-bounded (no checkpoint needed below ~10 hops)."""
    visited = sources.select(F.col(id_col).alias("id"), F.lit(0).alias("dist"))
    frontier = visited
    for hop in range(1, k + 1):
        nxt = (
            frontier.join(edges, frontier["id"] == edges[src_col])
            .select(F.col(dst_col).alias("id"), F.lit(hop).alias("dist"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    # the anti-join guarantees one row per node, already minimal; the
    # aggregate states the BFS invariant rather than trusting it
    return visited.groupBy("id").agg(F.min("dist").cast("long").alias("dist"))


def bfs_khop_labeled(
    sources: DataFrame,
    edges: DataFrame,
    k: int,
    *,
    id_col: str = "id",
    src_label: str = "src_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-source BFS distances, bounded at ``k`` hops: (src_id, id,
    dist) for every (source, node) pair with dist = minimum hop count
    FROM THAT SOURCE — the labeled generalization of ``bfs_khop``
    (which merges the source set into one min-dist field). This is
    the primitive under per-source centralities (harmonic/closeness)
    and landmark-distance sketches.

    Scale: identical shape to ``bfs_khop`` per source — the frontier
    carries the source label and the visited anti-join keys on
    (src_id, id), so the work is O(sum of per-source frontier sizes)
    per hop with the same single equi-join against the edge list; all
    sources advance in ONE join per hop, not one pass per source."""
    visited = sources.select(
        F.col(src_label).alias("src_id"),
        F.col(id_col).alias("id"),
        F.lit(0).alias("dist"),
    )
    frontier = visited
    for hop in range(1, k + 1):
        nxt = (
            frontier.join(edges, frontier["id"] == edges[src_col])
            .select(
                F.col("src_id"), F.col(dst_col).alias("id"), F.lit(hop).alias("dist")
            )
            .distinct()
            .join(visited.select("src_id", "id"), ["src_id", "id"], "left_anti")
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.groupBy("src_id", "id").agg(
        F.min("dist").cast("long").alias("dist")
    )
