"""Similarity search over embedding columns (array<float>).

Two paths, per the 100 TB design brief:

- **Brute-force top-k** (the exact baseline): cosine per row via
  `zip_with` + `aggregate` — pure Catalyst array expressions, JVM-
  side, no shuffle; then a TakeOrdered top-k. Linear scan, perfectly
  partition-parallel: the right choice when the query count is small.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  (sign of dot with deterministic planes) -> candidates share the
  query's bucket (with multiprobe on 1-bit flips) -> exact cosine
  re-rank of the tiny candidate set. Bucket join replaces the full
  scan; planes are seeded constants so results are reproducible.

For oracle-checked exactness the dot products run in DECIMAL (exact,
order-independent — see queries/_util.py); the rows-only fast path
uses plain double `zip_with`/`aggregate`.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, functions as F


def _dot_dec(a: Column, b: Column) -> Column:
    """Exact decimal dot product: float elements cast to
    DECIMAL(12,8), products summed into DECIMAL(38,16)."""
    prods = F.zip_with(
        a, b, lambda x, y: x.cast("decimal(12,8)") * y.cast("decimal(12,8)")
    )
    # decimal + decimal widens (38,16)+(25,16) -> (38,15); cast the
    # running sum back so the accumulator type stays fixed.
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(38,16)"),
        lambda acc, x: (acc + x).cast("decimal(38,16)"),
    )


def _dot_double(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_exact(a: Column, b: Column) -> Column:
    """Deterministic cosine: exact decimal dots surfaced as double,
    then IEEE sqrt/divide (bit-identical on any engine).

    Single array traversal (round-9 perf): one `zip_with` emits the
    (a*b, a*a, b*b) product triple per element and one `aggregate`
    folds all three sums, with the cosine computed in the aggregate's
    FINISH lambda — the accumulator there is a bound variable, so the
    fold is never re-evaluated per referenced field (the naive
    3x`_dot_dec` form re-traversed the arrays three times, and a
    caller projecting the expression could not rely on subexpression
    elimination across higher-order functions). Values are
    bit-identical to the unfused form: each decimal partial sum is
    exact (scale 16 preserved by the (38,16) accumulator, no
    rounding), so traversal shape cannot change it, and the final
    double expression `dot / (sqrt(na2) * sqrt(nb2))` keeps the exact
    IEEE op sequence of the original."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.struct(
            (x.cast("decimal(12,8)") * y.cast("decimal(12,8)")).alias("ab"),
            (x.cast("decimal(12,8)") * x.cast("decimal(12,8)")).alias("aa"),
            (y.cast("decimal(12,8)") * y.cast("decimal(12,8)")).alias("bb"),
        ),
    )
    zero_d = F.lit(0).cast("decimal(38,16)")
    return F.aggregate(
        prods,
        F.struct(zero_d.alias("ab"), zero_d.alias("aa"), zero_d.alias("bb")),
        lambda acc, p: F.struct(
            (acc["ab"] + p["ab"]).cast("decimal(38,16)").alias("ab"),
            (acc["aa"] + p["aa"]).cast("decimal(38,16)").alias("aa"),
            (acc["bb"] + p["bb"]).cast("decimal(38,16)").alias("bb"),
        ),
        lambda acc: acc["ab"].cast("double")
        / (F.sqrt(acc["aa"].cast("double")) * F.sqrt(acc["bb"].cast("double"))),
    )


def cosine_exact_vs(vec: Column, qvec: Column, qnorm: Column) -> Column:
    """`cosine_exact` for probe-style scans where one side is a
    CONSTANT query vector: the query's norm is precomputed once on
    the (broadcast) query side and passed in as ``qnorm`` =
    sqrt(double(dec_dot(q, q))), so the per-row traversal folds only
    the (vec*q, vec*vec) pair — the naive form recomputed the
    64-multiply decimal query norm for every corpus row. Bit-identical
    to `cosine_exact(vec, qvec)`: the hoisted qnorm is the same exact
    decimal surfaced through the same cast/sqrt, and the final divide
    keeps the `dot / (sqrt(n2) * qnorm)` = `dot / (na * nb)` shape."""
    prods = F.zip_with(
        vec,
        qvec,
        lambda x, y: F.struct(
            (x.cast("decimal(12,8)") * y.cast("decimal(12,8)")).alias("ab"),
            (x.cast("decimal(12,8)") * x.cast("decimal(12,8)")).alias("aa"),
        ),
    )
    zero_d = F.lit(0).cast("decimal(38,16)")
    return F.aggregate(
        prods,
        F.struct(zero_d.alias("ab"), zero_d.alias("aa")),
        lambda acc, p: F.struct(
            (acc["ab"] + p["ab"]).cast("decimal(38,16)").alias("ab"),
            (acc["aa"] + p["aa"]).cast("decimal(38,16)").alias("aa"),
        ),
        lambda acc: acc["ab"].cast("double")
        / (F.sqrt(acc["aa"].cast("double")) * qnorm),
    )


def query_norm_dec(qvec: Column) -> Column:
    """sqrt(double(exact decimal dot(q, q))) — the hoisted query-side
    norm consumed by `cosine_exact_vs` / `cosine_fast_vs`."""
    return F.sqrt(_dot_dec(qvec, qvec).cast("double"))


def cosine_fast(a: Column, b: Column) -> Column:
    """Double-precision cosine — the throughput path (no decimal
    overhead). Single fused traversal (same structure as
    `cosine_exact`); each of the three sums accumulates left-to-right
    over the same elements as the unfused form, so the doubles are
    bit-identical and still deterministic for a fixed array."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.struct(
            (x.cast("double") * y.cast("double")).alias("ab"),
            (x.cast("double") * x.cast("double")).alias("aa"),
            (y.cast("double") * y.cast("double")).alias("bb"),
        ),
    )
    return F.aggregate(
        prods,
        F.struct(
            F.lit(0.0).alias("ab"), F.lit(0.0).alias("aa"), F.lit(0.0).alias("bb")
        ),
        lambda acc, p: F.struct(
            (acc["ab"] + p["ab"]).alias("ab"),
            (acc["aa"] + p["aa"]).alias("aa"),
            (acc["bb"] + p["bb"]).alias("bb"),
        ),
        lambda acc: acc["ab"]
        / (F.sqrt(acc["aa"]) * F.sqrt(acc["bb"])),
    )


def cosine_fast_vs(vec: Column, qvec: Column, qnorm: Column) -> Column:
    """`cosine_fast` with the query norm hoisted (see
    `cosine_exact_vs`); ``qnorm`` = sqrt(double dot(q, q))."""
    prods = F.zip_with(
        vec,
        qvec,
        lambda x, y: F.struct(
            (x.cast("double") * y.cast("double")).alias("ab"),
            (x.cast("double") * x.cast("double")).alias("aa"),
        ),
    )
    return F.aggregate(
        prods,
        F.struct(F.lit(0.0).alias("ab"), F.lit(0.0).alias("aa")),
        lambda acc, p: F.struct(
            (acc["ab"] + p["ab"]).alias("ab"),
            (acc["aa"] + p["aa"]).alias("aa"),
        ),
        lambda acc: acc["ab"] / (F.sqrt(acc["aa"]) * qnorm),
    )


def query_norm_double(qvec: Column) -> Column:
    """sqrt(double dot(q, q)) — hoisted norm for `cosine_fast_vs`."""
    return F.sqrt(_dot_double(qvec, qvec))


def cosine_exact_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """`cosine_exact` for PAIR joins where both sides carry a
    precomputed norm (`query_norm_dec`, stored on the persisted
    bucketed frame): norms are computed once per VECTOR (linear) and
    the per-pair traversal folds only the cross dot — the inline form
    recomputed both 64-multiply decimal norms for every candidate
    pair. Bit-identical: same exact decimal dots surfaced through the
    same cast/sqrt, final divide keeps the `dot / (na * nb)` shape."""
    return _dot_dec(a, b).cast("double") / (na * nb)


def cosine_fast_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """`cosine_fast` with both norms precomputed per vector
    (`query_norm_double`); see `cosine_exact_pre`."""
    return _dot_double(a, b) / (na * nb)


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
) -> DataFrame:
    """Exact top-k by cosine against a 1-row query DataFrame
    (broadcast — the scan never shuffles). The query norm is computed
    ONCE on the broadcast side (`query_norm_*`) instead of per corpus
    row — same doubles, one fewer per-row dot."""
    norm_of = query_norm_dec if exact else query_norm_double
    q = F.broadcast(
        query_vec.select(F.col(vec_col).alias("_qvec")).withColumn(
            "_qnorm", norm_of(F.col("_qvec"))
        )
    )
    cos = (cosine_exact_vs if exact else cosine_fast_vs)(
        F.col(vec_col), F.col("_qvec"), F.col("_qnorm")
    )
    return (
        embeddings.crossJoin(q)
        .select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _hyperplanes_q6(dim: int, n_planes: int, seed: int = 7) -> list[list[str]]:
    """Hyperplane coefficients quantized to 6 decimal places, as
    strings — exact DECIMAL(10,6) literals on BOTH engines, so the
    bucket computation below is reproducible in plain SQL (the basis
    of the hash-checkable LSH oracles in queries/similarity.py)."""
    return [[f"{x:.6f}" for x in plane] for plane in _hyperplanes(dim, n_planes, seed)]


def signed_projection_bucket_exact(vec: Column, plane_strs: list[list[str]]) -> Column:
    """Random-hyperplane LSH bucket with EXACT decimal projections:
    elements cast to DECIMAL(12,8), plane coefficients DECIMAL(10,6)
    string literals, products summed exactly — order-independent and
    engine-independent, so sign(dot) (hence the bucket id) is
    bit-portable to a SQL oracle. The double path
    (`signed_projection_bucket`) stays the throughput default."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(plane_strs):
        pcol = F.array(*[F.lit(s).cast("decimal(10,6)") for s in plane])
        prods = F.zip_with(vec, pcol, lambda x, y: x.cast("decimal(12,8)") * y)
        dot = F.aggregate(
            prods,
            F.lit(0).cast("decimal(38,14)"),
            lambda acc, x: (acc + x).cast("decimal(38,14)"),
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket.cast("long")


def signed_projection_bucket(
    vec: Column, planes: list[list[float]]
) -> Column:
    """Random-hyperplane LSH bucket id: bit i = sign(dot(vec, plane_i))."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot_double(vec, plane_col) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("long")


def lsh_ann_topk(
    embeddings: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    multiprobe: bool = True,
    exact: bool = False,
) -> DataFrame:
    """ANN top-k: hyperplane-bucket the corpus once, probe the query
    bucket (plus all 1-bit-flip neighbors), exact-cosine re-rank the
    candidates. At scale the bucketed corpus is a materialized/
    partitioned table and each query touches ~n/2^planes rows.

    ``exact=True`` switches both the bucket projections and the
    re-rank cosine to exact decimal arithmetic (engine-portable, the
    oracle-checked mode); the default double path is the throughput
    mode."""
    if exact:
        planes_q6 = _hyperplanes_q6(dim, n_planes)
        bucket_of = lambda c: signed_projection_bucket_exact(c, planes_q6)  # noqa: E731
    else:
        planes = _hyperplanes(dim, n_planes)
        bucket_of = lambda c: signed_projection_bucket(c, planes)  # noqa: E731
    bucketed = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        bucket_of(F.col(vec_col)).alias("_bucket"),
    )
    q = query_vec.select(
        F.col(vec_col).alias("_qvec"),
        bucket_of(F.col(vec_col)).alias("_qbucket"),
        (query_norm_dec if exact else query_norm_double)(F.col(vec_col)).alias(
            "_qnorm"
        ),
    )
    if multiprobe:
        probes = F.array(
            F.col("_qbucket"),
            *[
                F.col("_qbucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ],
        )
        q = q.select("_qvec", F.explode(probes).alias("_qbucket"), "_qnorm")
    q = F.broadcast(q)
    cands = bucketed.join(q, bucketed["_bucket"] == q["_qbucket"])
    cos = (cosine_exact_vs if exact else cosine_fast_vs)(
        F.col(vec_col), F.col("_qvec"), F.col("_qnorm")
    )
    return (
        cands.select(F.col(id_col), cos.alias("cosine"))
        .groupBy(id_col)
        .agg(F.max("cosine").alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def knn_join(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool | str = True,
    exclude_pairs: DataFrame | None = None,
) -> DataFrame:
    """k-NN similarity JOIN: for each probe vector, its k nearest
    corpus neighbors by cosine. ``exact``: True = exact-decimal
    cosine, False = double throughput gear, ``"int3"`` = scale-3
    integer quantization whose cosine doubles are bit-identical
    cross-engine (the hash-oracle gear). Self-pairs excluded;
    ``exclude_pairs`` — a (probe_id, excluded_id) frame — removes
    additional known-positive pairs BEFORE ranking, the hard-negative
    mining contract: ranks are over the eligible set, not filtered
    after the fact).

    The probe set broadcasts; the corpus scan stays put (no shuffle
    of the big side) and each partition scores its rows against all
    probes, then a per-probe window keeps k. Right shape while
    |probes| x |partition rows| is manageable; for probe sets too big
    to broadcast, the LSH-bucketed path (``lsh_ann_topk`` generalized
    to a bucket-bucket join) replaces the cross product.
    """
    from pyspark.sql import Window as W

    if exact == "int3":
        # Portable integer gear (the IVF/PQ recipe): vectors quantized
        # to scale-3 longs with identical IEEE steps in both engines,
        # dots/norms as exact integer sums, cosine as a double derived
        # from exact integers (all < 2^53, so the divide/sqrt chain is
        # bit-identical cross-engine). Decimal-cast cosines carry a
        # ~1e-8 float->DECIMAL(12,8) representation skew that lands on
        # a 6-dp rounding boundary once enough pairs exist — caught by
        # the sf1 parity sweep (round 6).
        from .ivf import _dot_exact, _quantize_long  # function-level: ivf imports this module

        p = F.broadcast(
            probes.select(
                F.col(id_col).alias("probe_id"),
                _quantize_long(F.col(vec_col)).alias("_pvec"),
            ).withColumn("_pn2", _dot_exact("_pvec", "_pvec").cast("double"))
        )
        corpus = embeddings.select(
            F.col(id_col), _quantize_long(F.col(vec_col)).alias("_qvec")
        ).withColumn("_n2", _dot_exact("_qvec", "_qvec").cast("double"))
        cos = _dot_exact("_qvec", "_pvec").cast("double") / F.sqrt(
            F.col("_n2") * F.col("_pn2")
        )
        src = corpus
    else:
        norm_of = query_norm_dec if exact else query_norm_double
        p = F.broadcast(
            probes.select(
                F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pvec")
            ).withColumn("_pnorm", norm_of(F.col("_pvec")))
        )
        cos = (cosine_exact_vs if exact else cosine_fast_vs)(
            F.col(vec_col), F.col("_pvec"), F.col("_pnorm")
        )
        src = embeddings
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    scored = (
        src.crossJoin(p)
        .where(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id", F.col(id_col).alias("neighbor_id"), cos.alias("cosine")
        )
    )
    if exclude_pairs is not None:
        scored = scored.join(
            F.broadcast(
                exclude_pairs.select(
                    F.col(exclude_pairs.columns[0]).alias("probe_id"),
                    F.col(exclude_pairs.columns[1]).alias("neighbor_id"),
                )
            ),
            ["probe_id", "neighbor_id"],
            "left_anti",
        )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def semantic_dedup_keep_one(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.999,
    dim: int = 64,
    n_planes: int = 8,
    exact: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): an
    item is DROPPED iff a lower-id item in the same LSH bucket has
    cosine similarity >= ``threshold`` with it; the surviving lowest
    id is the cluster representative. One pass, order-free semantics
    (no greedy sequential scan): drop(x) = exists y < x in bucket(x)
    with cos(x, y) >= t — expressible as a banded pair join + groupBy,
    so the decision is identical on any partitioning.

    Returns the DROP manifest: (dropped_id, keeper_id = min matching
    lower id, n_matches). Scale shape: bucket projection is a per-row
    map; the self-join is an equi-join on bucket id (never all-pairs);
    pair count is bounded by bucket occupancy, the same guarantee as
    MinHash LSH banding (`operators/dedup.py`). ``exact=True`` runs
    decimal projections/cosines for cross-engine verification; the
    double path is the throughput gear."""
    if exact:
        planes_q6 = _hyperplanes_q6(dim, n_planes)
        bucket_of = lambda c: signed_projection_bucket_exact(c, planes_q6)  # noqa: E731
        cos_of, norm_of = cosine_exact_pre, query_norm_dec
    else:
        planes = _hyperplanes(dim, n_planes)
        bucket_of = lambda c: signed_projection_bucket(c, planes)  # noqa: E731
        cos_of, norm_of = cosine_fast_pre, query_norm_double
    # persist(): the projection is ~n_planes*dim multiplies per row and
    # feeds BOTH sides of the self-join (same rationale and same
    # non-checkpoint choice as q_embedding_neardup — keep scans
    # visible to the catalog-wide plan guards). The norm rides along:
    # computed once per VECTOR here, not per candidate pair.
    bucketed = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        bucket_of(F.col(vec_col)).alias("_bucket"),
        norm_of(F.col(vec_col)).alias("_norm"),
    ).persist()
    left, right = bucketed.alias("l"), bucketed.alias("r")
    pairs = left.join(
        right,
        (F.col(f"l._bucket") == F.col(f"r._bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("_id_keep"),
        F.col(f"r.{id_col}").alias("_id_drop"),
        cos_of(
            F.col(f"l.{vec_col}"),
            F.col(f"r.{vec_col}"),
            F.col("l._norm"),
            F.col("r._norm"),
        ).alias("_cos"),
    )
    # threshold on the ROUNDED cosine: the raw double can differ ~1 ulp
    # between engines at the boundary (decimal->double cast).
    return (
        pairs.where(F.round(F.col("_cos"), 6) >= threshold)
        .groupBy(F.col("_id_drop").alias("dropped_id"))
        .agg(
            F.min("_id_keep").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_matches"),
        )
    )
