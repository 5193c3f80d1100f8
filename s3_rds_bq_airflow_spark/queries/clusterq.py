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
from ._util import pair_salt_width, t
from .textops import NORMALIZE_SQL


# Shared by q_dedup_clusters and q_dedup_clusters_star: both solve
# the SAME planted path graph and must hash-match the SAME oracle —
# one corpus/edge builder keeps the "two algorithms, one answer"
# equivalence honest.
_PLANTED_ORACLE = f"""
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
    """


def _planted_path_graph(spark, sf_dir):
    """documents + two identical twins per seed, edges linking only
    ADJACENT ids within each content group (a path, never the closure
    edge) — clusters are recoverable only by transitive closure.
    Returns (nodes, edges)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = docs.where(F.col("doc_id") % 17 == 0)
    corpus = docs.unionByName(
        seeds.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    ).unionByName(seeds.select((F.col("doc_id") + 2000000).alias("doc_id"), "text"))
    fp = corpus.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("content_fp"))
    w = W.partitionBy("content_fp").orderBy("doc_id")
    edges = (
        fp.withColumn("prev_id", F.lag("doc_id").over(w))
        .where(F.col("prev_id").isNotNull())
        .select(F.col("prev_id").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    return fp.select(F.col("doc_id").alias("id")), edges


def _with_sizes(labels):
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "cluster_id").select(
        F.col("id").alias("doc_id"), "cluster_id", "cluster_size"
    )


@query("q_dedup_clusters", oracle=_PLANTED_ORACLE)
def q_dedup_clusters(spark, sf_dir):
    """Iterative min-label connected components over a path-shaped
    duplicate graph; result must equal the declarative content-group
    clustering (proving 2-hop transitive closure actually happened)."""
    nodes, edges = _planted_path_graph(spark, sf_dir)
    return _with_sizes(connected_components(nodes, edges))


@query("q_dedup_clusters_star", oracle=_PLANTED_ORACLE)
def q_dedup_clusters_star(spark, sf_dir):
    """Same planted path-graph clustering as q_dedup_clusters, solved
    by large-star/small-star contraction
    (`operators/cluster.py::star_contraction_components`) instead of
    min-label propagation — the O(log^2 n)-round algorithm that
    survives pathological diameters at 100 TB. The oracle (and thus
    the hash) is IDENTICAL to q_dedup_clusters: both algorithms must
    produce the same transitive closure."""
    from ..operators.cluster import star_contraction_components

    nodes, edges = _planted_path_graph(spark, sf_dir)
    return _with_sizes(star_contraction_components(nodes, edges))


# q_label_propagation fixture bounds (the round-8 straggler lesson,
# applied to the fixture that taught it): the clique-union edges come
# from a self-join blocked on (c_nationkey, c_mktsegment) — 125
# distinct values, so the bare equi-join confines each block's
# QUADRATIC pair workload to one task, and the `% 7` node filter
# grows linearly with SF so edges grow ~100x per decade. Two bounds:
# a deterministic bottom-k-by-md5 node cap per block (replayed in the
# DuckDB oracle — md5 of the decimal custkey string is portable) so
# edges stop growing quadratically in SF, and a salted expansion join
# (the q_ngram_jaccard pattern) so each block's remaining pair work
# spreads across `pair_salt_width` tasks. node_cap=None is the
# uncapped proof gear (the fuzzy_match_families(df_cap=None)
# discipline) — equivalence where the cap doesn't bite is pinned in
# tests/test_lpa_fixture.py.
_LPA_NODE_CAP = 256


def lpa_clique_fixture(spark, sf_dir, *, node_cap=_LPA_NODE_CAP, salt=None):
    """(nodes, edges) for the clique-union LPA fixture: every 7th
    customer, fully linked within (nation, segment) blocks, nodes per
    block bounded by a deterministic bottom-``node_cap``-by-md5 cap.

    With the cap, total edges are <= 125 * cap*(cap-1)/2 ~ 4.1M at
    ANY scale factor (flat once blocks saturate); without it they grow
    quadratically in SF. The salted pair join emits every (a, b) pair
    exactly once (A's salt is a function of a.c_custkey) while
    splitting each block's pair work across ``salt`` tasks."""
    if salt is None:
        salt = pair_salt_width(spark)
    c = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 7 == 0)
        .select("c_custkey", "c_nationkey", "c_mktsegment")
    )
    return clique_fixture_from(c, node_cap=node_cap, salt=salt)


def clique_fixture_from(c, *, node_cap, salt):
    """Core of `lpa_clique_fixture` over an explicit (c_custkey,
    c_nationkey, c_mktsegment) frame — split out so the cap-bites and
    pair-exactly-once properties are pinnable on synthetic blocks
    bigger than any one SF's (tests/test_lpa_fixture.py)."""
    if node_cap is not None:
        w = W.partitionBy("c_nationkey", "c_mktsegment").orderBy(
            F.md5(F.col("c_custkey").cast("string")), "c_custkey"
        )
        c = (
            c.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= node_cap)
            .drop("_rk")
        )
    a = c.withColumn("_salt", F.pmod(F.hash("c_custkey"), F.lit(salt))).alias("a")
    b = c.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).alias("b")
    edges = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
        & (F.col("a._salt") == F.col("b._salt"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(F.col("a.c_custkey").alias("src"), F.col("b.c_custkey").alias("dst"))
    return c.select(F.col("c_custkey").alias("id")), edges


@query(
    "q_label_propagation",
    oracle=f"""
    WITH capped AS (
        SELECT c_custkey, c_nationkey, c_mktsegment
        FROM (
            SELECT c_custkey, c_nationkey, c_mktsegment,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_nationkey, c_mktsegment
                       ORDER BY MD5(CAST(c_custkey AS VARCHAR)), c_custkey
                   ) AS rk
            FROM customer WHERE c_custkey % 7 = 0
        )
        WHERE rk <= {_LPA_NODE_CAP}
    )
    SELECT c_custkey,
           MIN(c_custkey) OVER (
               PARTITION BY c_nationkey, c_mktsegment
           ) AS label
    FROM capped
    """,
)
def q_label_propagation(spark, sf_dir):
    """Community detection by deterministic synchronous label
    propagation (`operators/cluster.py::label_propagation`). The graph
    is a disjoint union of cliques — customers fully linked within
    (nation, segment) — where LPA's fixpoint is provably the minimum
    member id per clique (round 1: every vote set is the clique's
    distinct labels, tie-break picks the min; round 2: stable). The
    oracle states that closed form declaratively over the SAME
    deterministically capped node set (md5 bottom-k is portable
    across engines); equality proves the vote / tie-break /
    convergence machinery. Scale: see `lpa_clique_fixture` — capped
    node blocks (edges flat in SF once blocks saturate) + salted
    expansion join (no per-block straggler task). Community recovery
    on non-clique planted graphs is pinned in tests/test_operators.py;
    capped==uncapped equivalence in tests/test_lpa_fixture.py."""
    from ..operators.cluster import label_propagation

    nodes, edges = lpa_clique_fixture(spark, sf_dir)
    labels = label_propagation(nodes, edges)
    return labels.select(F.col("id").alias("c_custkey"), "label")


@query(
    "q_pagerank_cycle",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS id, 1.0 AS rank
    FROM nation
    """,
)
def q_pagerank_cycle(spark, sf_dir):
    """PageRank power iteration, driver-checkable
    (`operators/cluster.pagerank`): on a directed CYCLE over the
    nation keys the uniform distribution is the exact fixpoint —
    every node has one in- and one out-edge, so rank 1.0 must
    reproduce itself bit-exactly each round (0.15 + 0.85*1.0 == 1.0
    in IEEE-754). Any error in contribution shipping, dangling-mass
    handling, or damping drifts the ranks off 1.0 and fails the hash.
    Analytic non-uniform graphs are pinned in tests/test_pagerank.py."""
    from ..operators.cluster import pagerank

    n = t(spark, sf_dir, "nation").select(F.col("n_nationkey").cast("long").alias("id"))
    n_count = 25  # nation is fixed-size at every SF
    edges = n.select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n_count).alias("dst")
    )
    ranks = pagerank(n, edges, max_iterations=5)
    return ranks.select("id", F.col("rank").cast("double").alias("rank"))


@query(
    "q_udtf_sentences",
    oracle="""
    WITH parts AS (
        SELECT doc_id,
               list_filter(list_transform(string_split(text, '.'), s -> trim(s)),
                           s -> s <> '') AS sents
        FROM documents WHERE doc_id % 35 = 0
    )
    SELECT doc_id,
           CAST(i - 1 AS INT) AS sentence_idx,
           sents[i] AS sentence,
           CAST(LEN(regexp_extract_all(sents[i], '\\S+')) AS INT) AS n_tokens
    FROM parts, UNNEST(range(1, LEN(sents) + 1)) AS t(i)
    """,
)
def q_udtf_sentences(spark, sf_dir):
    """§2.10 table-valued Python surface, driver-checkable: the
    SentenceSplit UDTF (`operators/udtf_ops`) lateral-joined from SQL,
    hash-checked against a DuckDB list-comprehension oracle. The
    policy stands — this generator IS expressible as a JVM explode
    (pinned equal in tests/test_udtf.py); the UDTF demonstrates the
    extension point for generators that genuinely need Python."""
    from ..operators.udtf_ops import register_udtfs

    register_udtfs(spark)
    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") % 35 == 0)
    docs.createOrReplaceTempView("udtf_docs_q")
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_tokens
        FROM udtf_docs_q d, LATERAL sentence_split(d.text) s
        """
    )


_OLS_CAP = 1024


@query(
    "q_pandas_udaf_ols",
    oracle=f"""
    WITH base AS (
        SELECT l_returnflag, l_quantity,
               CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS rid
        FROM lineitem WHERE l_orderkey % 10 = 0
    ),
    capped AS (
        SELECT * FROM (
            SELECT l_returnflag, l_quantity, rid,
                   ROW_NUMBER() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY MD5(CAST(rid AS VARCHAR)), rid) AS rk
            FROM base
        ) WHERE rk <= {_OLS_CAP}
    )
    SELECT l_returnflag,
           COUNT(*) AS n,
           3.0 AS slope_r6,
           7.0 AS intercept_r6,
           1.0 AS r2_r6
    FROM capped
    GROUP BY l_returnflag
    """,
)
def q_pandas_udaf_ols(spark, sf_dir):
    """§2.10 grouped pandas UDAF surface, driver-checkable
    (`operators/pandas_udaf.grouped_ols`) — on a BOUNDED group:
    `applyInPandas` materializes each group as one pandas frame, and
    `l_returnflag` has 3 values, so the round-9 shape fed the whole
    fact table to three Python workers (the verdict's
    unbounded-payload class). The group is now capped to a
    deterministic bottom-k-by-md5 (k = _OLS_CAP = 1024) of the unique
    row id (`queries/_util.bottom_k_by_md5` — two-phase,
    salt-invariant, no single-task group sort), replayed verbatim in
    the oracle's ROW_NUMBER cap, so per-task payload is 1024 rows at
    ANY scale. The fit target stays exactly linear (y = 3x + 7 on
    l_quantity): slope/intercept/R² keep closed-form values on every
    subset, and the oracle-checked `n` proves both engines selected
    the SAME rows. Real OLS at scale is `q_ols_moments` (distributed
    moment aggregates — no cap needed). Non-trivial fits are pinned
    numerically in tests/test_pandas_udaf.py."""
    from ..operators.pandas_udaf import grouped_ols
    from ._util import bottom_k_by_md5

    rid = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("bigint")
    li = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 10 == 0)
        .select("l_returnflag", "l_quantity", rid.alias("rid"))
    )
    capped = bottom_k_by_md5(
        li, group_cols=("l_returnflag",), id_col="rid", k=_OLS_CAP
    ).select(
        "l_returnflag",
        F.col("l_quantity").alias("x"),
        (3 * F.col("l_quantity") + 7).alias("y"),
    )
    fit = grouped_ols(capped, group_col="l_returnflag", x_col="x", y_col="y")
    return fit.select(
        "l_returnflag",
        "n",
        F.round("slope", 6).alias("slope_r6"),
        F.round("intercept", 6).alias("intercept_r6"),
        F.round("r2", 6).alias("r2_r6"),
    )


@query(
    "q_ols_moments",
    oracle="""
    WITH base AS (
        SELECT l_returnflag,
               CAST(l_quantity AS DECIMAL(18,6)) AS x,
               CAST(3 * l_quantity + 7 + (l_linenumber % 3)
                    AS DECIMAL(18,6)) AS y
        FROM lineitem
    ),
    m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x*y) AS DOUBLE) AS sxy,
               CAST(SUM(x*x) AS DOUBLE) AS sxx,
               CAST(SUM(y*y) AS DOUBLE) AS syy
        FROM base GROUP BY l_returnflag
    ),
    fit AS (
        SELECT l_returnflag, n, sx, sy, sxy, syy,
               CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx <> 0
                    THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                         / (CAST(n AS DOUBLE) * sxx - sx * sx)
                    ELSE 0.0 END AS slope
        FROM m
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND(slope, 6) AS slope_r6,
           ROUND((sy - slope * sx) / CAST(n AS DOUBLE), 6) AS intercept_r6,
           ROUND(CASE WHEN CAST(n AS DOUBLE) * syy - sy * sy <> 0
                      THEN (slope * (CAST(n AS DOUBLE) * sxy - sx * sy))
                           / (CAST(n AS DOUBLE) * syy - sy * sy)
                      ELSE 1.0 END, 6) AS r2_r6
    FROM fit
    """,
)
def q_ols_moments(spark, sf_dir):
    """Per-group OLS as distributed moment aggregates
    (`operators/pandas_udaf.grouped_ols_moments`) — the SCALE gear
    that replaces whole-group pandas materialization: six decimal-
    exact sums partial-aggregate map-side and shuffle one row per
    group, so the 3-value l_returnflag key costs three accumulator
    rows at 100 TB, not three fact-table-sized pandas frames. The
    target carries a deterministic non-linear residue
    (y = 3x + 7 + l_linenumber % 3), so slope/intercept/R² are
    DATA-dependent — the oracle replays the identical moment sums
    (exact decimals -> double) and the identical closed-form IEEE
    expressions, a far stronger check than closed-form constants.
    Companion row sanctioned by the round-9 verdict (unfreeze ≤2 for
    the grouped-pandas rewrites)."""
    from ..operators.pandas_udaf import grouped_ols_moments

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").alias("x"),
        (3 * F.col("l_quantity") + 7 + F.col("l_linenumber") % 3).alias("y"),
    )
    fit = grouped_ols_moments(li, group_col="l_returnflag", x_col="x", y_col="y")
    return fit.select(
        "l_returnflag",
        "n",
        F.round("slope", 6).alias("slope_r6"),
        F.round("intercept", 6).alias("intercept_r6"),
        F.round("r2", 6).alias("r2_r6"),
    )


_CANON_GROUP = 25

_ORACLE_CANONICAL = f"""
WITH scored AS (
    SELECT doc_id,
           doc_id // {_CANON_GROUP} AS g,
           CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[a-zA-Z]', '', 'g'))
                AS DOUBLE) / GREATEST(LENGTH(text), 1) AS q
    FROM documents
),
lab AS (
    SELECT doc_id, q,
           MIN(doc_id) OVER (PARTITION BY g) AS cluster_id,
           COUNT(*)    OVER (PARTITION BY g) AS cluster_size
    FROM scored
)
SELECT doc_id, cluster_id,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       FIRST_VALUE(doc_id) OVER (
           PARTITION BY cluster_id ORDER BY q DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS canonical_doc_id,
       CAST(doc_id = FIRST_VALUE(doc_id) OVER (
           PARTITION BY cluster_id ORDER BY q DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS BIGINT) AS is_canonical
FROM lab
"""


@query("q_dedup_canonical", oracle=_ORACLE_CANONICAL)
def q_dedup_canonical(spark, sf_dir):
    """End-to-end dedup composition: connected components over a
    planted near-dup graph, then QUALITY-BASED canonical selection —
    each cluster keeps its highest-quality member (alpha-ratio score,
    doc_id tie-break) instead of the arbitrary min-id, the way real
    corpus dedup picks the best duplicate to retain. The graph links
    consecutive ids within 25-doc ranges (paths — only transitive
    closure recovers the groups, same construction rationale as
    q_dedup_clusters), simulating near-dup clusters whose members
    differ slightly and therefore score differently.

    Scale shape: star-contraction CC (O(log^2 n) rounds), one
    size aggregate, and a per-cluster argmax window bounded by
    cluster size — the quality score is one IEEE division of exact
    integer character counts, so the argmax (hence the keep set) is
    engine-portable. The oracle states the clustering declaratively
    (range groups) and replays the same windowed selection."""
    from ..operators.cluster import star_contraction_components

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    raw_n = F.length(F.col("text"))
    quality = (
        (raw_n - F.length(F.regexp_replace(F.col("text"), "[a-zA-Z]", "")))
        .cast("double")
        / F.greatest(raw_n, F.lit(1))
    )
    scored = docs.select(
        "doc_id",
        F.floor(F.col("doc_id") / _CANON_GROUP).cast("long").alias("g"),
        quality.alias("q"),
    )
    wg = W.partitionBy("g").orderBy("doc_id")
    edges = (
        scored.withColumn("prev_id", F.lag("doc_id").over(wg))
        .where(F.col("prev_id").isNotNull())
        .select(F.col("prev_id").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    labels = star_contraction_components(
        scored.select(F.col("doc_id").alias("id")), edges
    )
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    wq = (
        W.partitionBy("cluster_id")
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        labels.join(sizes, "cluster_id")
        .join(scored.select("doc_id", "q"), F.col("id") == F.col("doc_id"))
        .withColumn("canonical_doc_id", F.first("doc_id").over(wq))
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            "canonical_doc_id",
            (F.col("doc_id") == F.col("canonical_doc_id")).cast("long").alias("is_canonical"),
        )
    )


_TRI_GROUP = 10

_ORACLE_TRIANGLES = f"""
WITH m AS (
    SELECT doc_id,
           doc_id // {_TRI_GROUP} AS g,
           ROW_NUMBER() OVER (PARTITION BY doc_id // {_TRI_GROUP}
                              ORDER BY doc_id) AS r
    FROM documents
),
path_edges AS (
    SELECT LAG(doc_id) OVER (PARTITION BY g ORDER BY r) AS a, doc_id AS b
    FROM m QUALIFY a IS NOT NULL
),
closure_edges AS (
    SELECT l.doc_id AS a, r.doc_id AS b
    FROM m l JOIN m r ON l.g = r.g AND l.r = 1 AND r.r = 3
),
e AS (SELECT a, b FROM path_edges UNION SELECT a, b FROM closure_edges),
tri AS (
    SELECT e1.a AS u, e1.b AS v, e2.b AS w
    FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
pernode AS (
    SELECT x AS doc_id, COUNT(*) AS n_triangles
    FROM (SELECT u AS x FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri) t
    GROUP BY x
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS n_triangles
FROM (SELECT doc_id FROM documents) d
LEFT JOIN pernode p ON d.doc_id = p.doc_id
"""


@query("q_triangle_counts", oracle=_ORACLE_TRIANGLES)
def q_triangle_counts(spark, sf_dir):
    """Per-node triangle counting (the clustering-coefficient
    numerator — the standard graph statistic of a duplicate/citation
    graph) by DEGREE-ORDERED edge orientation: every edge points from
    its lower-degree endpoint (degree ties by id), wedges form only
    at each node's out-edges, and a wedge closes iff its two endpoints
    share a canonical edge. Orientation bounds every node's out-degree
    by O(sqrt(|E|)) on any graph — THE trick that makes triangle
    enumeration feasible at 100 TB, versus the naive wedge join whose
    hub nodes explode quadratically. The planted graph (10-doc ranges:
    path edges + one rank1-rank3 closure) yields exactly one triangle
    per range, leaving most nodes on the zero path.

    The oracle enumerates triangles directly from the canonical
    (a < b) edge set — equality proves the oriented algorithm finds
    exactly the true triangle set, not an artifact of orientation."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    g = F.floor(F.col("doc_id") / _TRI_GROUP).cast("long")
    m = docs.select(
        "doc_id",
        g.alias("g"),
        F.row_number().over(W.partitionBy(g).orderBy("doc_id")).alias("r"),
    )
    wlag = W.partitionBy("g").orderBy("r")
    path_edges = (
        m.withColumn("a", F.lag("doc_id").over(wlag))
        .where(F.col("a").isNotNull())
        .select("a", F.col("doc_id").alias("b"))
    )
    closure_edges = (
        m.where(F.col("r") == 1)
        .alias("l")
        .join(m.where(F.col("r") == 3).alias("r"), F.col("l.g") == F.col("r.g"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
    )
    # canonical undirected edge set, a < b (construction already emits
    # a < b; union dedups the closure edge when ranges have < 3 docs)
    edges = path_edges.unionByName(closure_edges).distinct()

    deg = (
        edges.select(F.col("a").alias("v"))
        .unionByName(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient: src = endpoint with (deg, id) lexicographically smaller
    ed = (
        edges.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src")) & (F.col("o1.dst") < F.col("o2.dst")),
    ).select(
        F.col("o1.src").alias("u"),
        F.col("o1.dst").alias("x"),
        F.col("o2.dst").alias("y"),
    )
    closing = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = wedges.join(closing, ["x", "y"])
    pernode = (
        tri.select(F.col("u").alias("doc_id"))
        .unionByName(tri.select(F.col("x").alias("doc_id")))
        .unionByName(tri.select(F.col("y").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return docs.join(pernode, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
    )


# BFS demo graph: two coprime forward strides over the customer keys
# — a DAG (edges strictly increase the id, so the recursive oracle
# terminates) with genuinely overlapping multi-path reachability
# (7a + 13b sums), sources = the first five keys, six hops.
_BFS_STRIDES = (7, 13)
_BFS_K = 6


@query(
    "q_bfs_khop",
    oracle=f"""
    WITH RECURSIVE walk(id, dist) AS (
        SELECT c_custkey, 0 FROM customer WHERE c_custkey < 5
        UNION
        SELECT w.id + s.d, w.dist + 1
        FROM walk w,
             (VALUES ({_BFS_STRIDES[0]}), ({_BFS_STRIDES[1]})) s(d)
        WHERE w.dist < {_BFS_K}
          AND EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = w.id + s.d)
    )
    SELECT id, CAST(MIN(dist) AS BIGINT) AS dist
    FROM walk GROUP BY id
    """,
)
def q_bfs_khop(spark, sf_dir):
    """k-hop BFS reachability (`operators/cluster.bfs_khop`): minimum
    hop count from a source set over a directed graph, the Pregel
    frontier iteration as DataFrame joins — the unweighted-shortest-
    path primitive of the graph family. The demo graph strides the
    customer keys by 7 and 13 (coprime, five sources — distances
    interleave nontrivially across sources and stride mixes), and the oracle
    replays the walk as a DuckDB RECURSIVE CTE with MIN(dist) —
    engine-independent BFS semantics, not a closed form."""
    from ..operators.cluster import bfs_khop

    nodes = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id")
    )
    strides = F.array(*[F.lit(s) for s in _BFS_STRIDES])
    edges = (
        nodes.select("id", F.explode(strides).alias("d"))
        .select(F.col("id").alias("src"), (F.col("id") + F.col("d")).alias("dst"))
        .join(nodes.withColumnRenamed("id", "dst"), "dst")  # dst must exist
    )
    sources = nodes.where(F.col("id") < 5)
    return bfs_khop(sources, edges, _BFS_K)


_HC_STRIDES = (7, 13)
_HC_K = 4
_HC_SOURCES = 3


@query(
    "q_harmonic_centrality",
    oracle=f"""
    WITH RECURSIVE walk(src, id, dist) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < {_HC_SOURCES}
        UNION
        SELECT w.src, w.id + s.d, w.dist + 1
        FROM walk w,
             (VALUES ({_HC_STRIDES[0]}), ({_HC_STRIDES[1]})) s(d)
        WHERE w.dist < {_HC_K}
          AND EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = w.id + s.d)
    ),
    md AS (SELECT src, id, MIN(dist) AS dist FROM walk GROUP BY 1, 2)
    SELECT src AS src_id,
           CAST(SUM(12 // dist) AS BIGINT) AS harmonic_x12,
           COUNT(*) AS n_reached
    FROM md WHERE dist > 0
    GROUP BY src
    """,
)
def q_harmonic_centrality(spark, sf_dir):
    """Bounded harmonic centrality (Boldi & Vigna, "Axioms for
    Centrality", 2014): per source, sum of 1/d over nodes within K=4
    hops — the centrality that handles disconnected graphs (a node
    never reached contributes 0, no infinite closeness). Built on the
    LABELED multi-source BFS (`operators/cluster.bfs_khop_labeled`):
    all sources advance in one frontier join per hop, distances keyed
    (source, node).

    Exact integer gear: 1/d sums are rationals — scale by
    lcm(1..4) = 12, so each reached node contributes the exact
    integer 12/d (12, 6, 4, 3) and the centrality is an integer sum,
    bit-identical everywhere; the oracle replays the walk as a
    recursive CTE."""
    from ..operators.cluster import bfs_khop_labeled

    nodes = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    strides = F.array(*[F.lit(s) for s in _HC_STRIDES])
    edges = (
        nodes.select("id", F.explode(strides).alias("d"))
        .select(F.col("id").alias("src"), (F.col("id") + F.col("d")).alias("dst"))
        .join(nodes.withColumnRenamed("id", "dst"), "dst")
    )
    sources = nodes.where(F.col("id") < _HC_SOURCES).select(
        F.col("id").alias("src_id"), "id"
    )
    d = bfs_khop_labeled(sources, edges, _HC_K)
    return (
        d.where(F.col("dist") > 0)
        .groupBy("src_id")
        .agg(
            F.sum(F.expr("12 DIV dist")).alias("harmonic_x12"),
            F.count(F.lit(1)).alias("n_reached"),
        )
    )
