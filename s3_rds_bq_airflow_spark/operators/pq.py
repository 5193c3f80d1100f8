"""Product quantization (PQ) for embedding compression + ADC search.

The third ANN/compression family next to hyperplane LSH
(``similarity.py``) and IVF (``ivf.py``), after Jégou et al. 2011:
split each vector into ``n_subspaces`` contiguous subvectors, k-means
each subspace independently into ``n_codes`` centroids (the
codebook), and store every vector as its per-subspace code tuple —
dim*4 bytes collapse to ``n_subspaces`` small ints. Queries never
touch raw vectors: an ADC (asymmetric distance computation) lookup
table of per-subspace query↔centroid similarities is built once per
query (``n_subspaces * n_codes`` rows), and each corpus row's score
is the sum of its codes' table entries.

Angular variant: centroids are fit and looked up under the cosine
metric (subspace cosine, not L2), matching the rest of the embedding
kit; the ADC score is the SUM OF SUBSPACE COSINES between the query
and the reconstruction — a monotone proxy for full-vector cosine
when subspace norms are balanced, and exactly reproducible (each
term is one IEEE divide of exact integer aggregates; the final sum
is a FIXED-ORDER chain t0+t1+...+tm, not a float aggregate).

Scale shape: all subspaces fit in ONE DataFrame DAG (posexplode the
subvector array, k-means partitioned by subspace id) — the corpus is
scanned once per Lloyd round, not once per subspace. The codebook is
``n_subspaces * n_codes`` rows (config-sized, always broadcast); the
encoded table is ``n_subspaces`` ints per vector; ADC search is a
broadcast LUT join + per-vector pivot — no raw-vector access, which
is the point at 100 TB (the 256-byte embedding column stays in cold
storage, the hot path reads 4 ints).

``exact=True`` (the oracle-checked verification gear): identical
mechanism to ``operators/ivf.py`` — scale-3 integer quantization of
inputs, integer-SUM centroids (cosine is scale-invariant, so sum ≡
mean for assignment), DECIMAL(38,0)/HUGEINT accumulation, and every
ordering key / ADC term a single-IEEE-op expression over exact
integers, bit-identical on any engine. The double path is the
throughput gear with the same plan shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .ivf import _ckey, _dot_exact, _quantize_long, _rebuild
from .similarity import cosine_fast, cosine_fast_pre, query_norm_double

__all__ = ["pq_fit", "pq_encode", "pq_adc_topk"]


def _subspaces(df: DataFrame, id_col: str, vec_col: str, n_subspaces: int, dim: int, exact: bool) -> DataFrame:
    """(id, m, sv): the m-th contiguous subvector of every vector —
    quantized to exact scale-3 integers in exact mode."""
    sub_dim = dim // n_subspaces
    vec = _quantize_long(F.col(vec_col)) if exact else F.col(vec_col).cast("array<double>")
    subs = F.array(*[F.slice(vec, j * sub_dim + 1, sub_dim) for j in range(n_subspaces)])
    return df.select(F.col(id_col), F.posexplode(subs).alias("m", "sv"))


def _assign(sub: DataFrame, codebook: DataFrame, id_col: str, exact: bool) -> DataFrame:
    """Best code per (vector, subspace): broadcast codebook join keyed
    on the subspace id + per-(id, m) top-1 window with the portable
    key and (key DESC, cid) tie-break — the ``ivf_assign`` shape, one
    window over all subspaces at once."""
    if exact:
        cents = F.broadcast(
            codebook.select("m", "cid", "cvec", _dot_exact("cvec", "cvec").alias("__cn2"))
        )
        scored = sub.join(cents, "m").withColumn(
            "__sim", _ckey(_dot_exact("sv", "cvec"), F.col("__cn2"))
        )
    else:
        # norms hoisted (the ivf_assign shape): subvector norm once
        # per (id, m) row, codebook norms on the broadcast side.
        scored = (
            sub.withColumn("__n", query_norm_double(F.col("sv")))
            .join(
                F.broadcast(
                    codebook.withColumn("__cn", query_norm_double(F.col("cvec")))
                ),
                "m",
            )
            .withColumn(
                "__sim",
                cosine_fast_pre(
                    F.col("sv"), F.col("cvec"), F.col("__n"), F.col("__cn")
                ),
            )
        )
    w = W.partitionBy(id_col, "m").orderBy(F.col("__sim").desc(), F.col("cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, "m", "sv", "cid")
    )


def pq_fit(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 4,
    n_codes: int = 8,
    n_iters: int = 1,
    dim: int = 64,
    exact: bool = False,
) -> DataFrame:
    """Fit the codebook; returns (m, cid, cvec). Seeding mirrors IVF:
    the ``n_codes`` vectors with the smallest ``md5(id)`` provide the
    initial centroid for EVERY subspace (their m-th subvectors), so
    no RNG state exists anywhere. Fixed Lloyd rounds, empty cells
    keep their prior centroid (same rationale as ``ivf_fit``)."""
    sub = _subspaces(embeddings, id_col, vec_col, n_subspaces, dim, exact)
    # Initial codebook from the seed VECTORS directly (slice, don't
    # join the corpus back): keeps every codebook lineage bounded by
    # the limit, so the later broadcast of the codebook never carries
    # an unbounded fact scan (the catalog plan guard's invariant).
    seed_rows = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_codes)
    )
    wseed = W.orderBy(F.col(id_col))
    seeded = seed_rows.select(
        (F.row_number().over(wseed) - 1).alias("cid"), F.col(vec_col)
    )
    sub_dim = dim // n_subspaces
    svec = (
        _quantize_long(F.col(vec_col))
        if exact
        else F.col(vec_col).cast("array<double>")
    )
    seed_subs = F.array(
        *[F.slice(svec, j * sub_dim + 1, sub_dim) for j in range(n_subspaces)]
    )
    codebook = seeded.select(
        "cid", F.posexplode(seed_subs).alias("m", "cvec")
    ).select("m", "cid", "cvec")
    for _ in range(n_iters):
        assigned = _assign(sub, codebook, id_col, exact)
        agg = F.sum("x").cast("long").alias("x") if exact else F.avg("x").alias("x")
        means = (
            assigned.select("m", "cid", F.posexplode("sv").alias("pos", "x"))
            .groupBy("m", "cid", "pos")
            .agg(agg)
        )
        new_means = means.groupBy("m", "cid").agg(
            _rebuild(F.collect_list(F.struct("pos", "x"))).alias("cvec")
        )
        codebook = (
            codebook.alias("prev")
            .join(new_means.alias("new"), ["m", "cid"], "left")
            .select(
                "m",
                "cid",
                F.coalesce(F.col("new.cvec"), F.col("prev.cvec")).alias("cvec"),
            )
        )
    return codebook


def pq_encode(
    embeddings: DataFrame,
    codebook: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 4,
    dim: int = 64,
    exact: bool = False,
) -> DataFrame:
    """Encode the corpus: (id, m, code) — the compressed
    representation (``n_subspaces`` small ints per vector, persisted
    instead of the raw embedding at scale)."""
    sub = _subspaces(embeddings, id_col, vec_col, n_subspaces, dim, exact)
    return _assign(sub, codebook, id_col, exact).select(
        id_col, "m", F.col("cid").alias("code")
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebook: DataFrame,
    query_vec: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 4,
    dim: int = 64,
    exact: bool = False,
) -> DataFrame:
    """ADC top-k: build the per-query LUT (subspace cosine between the
    query's subvectors and every codebook centroid — n_subspaces *
    n_codes rows), broadcast-join it to the encoded table, pivot the
    per-subspace terms into columns, and rank by the FIXED-ORDER sum
    t0+t1+...+tm (never a float SUM aggregate, whose addition order
    is unspecified) with id tie-break. Raw vectors are never read.

    Returns (id, adc_score). ``exact=True`` computes every LUT term
    from exact integer aggregates (engine-portable)."""
    qsub = _subspaces(query_vec, id_col, vec_col, n_subspaces, dim, exact).select(
        "m", F.col("sv").alias("qv")
    )
    if exact:
        # subspace cosine from exact integer aggregates: normalized by
        # BOTH norms (|q_m| varies across m — the ADC sum weights
        # subspaces equally only on the cosine scale). The expression
        # shape dot / (sqrt(cn2) * sqrt(qn2)) is mirrored verbatim in
        # the SQL oracle; degenerate zero-norm cells key below any
        # cosine, same convention as ivf's _ckey.
        cn2 = _dot_exact("cvec", "cvec")
        qn2 = _dot_exact("qv", "qv")
        dot = _dot_exact("cvec", "qv")
        term = F.when((cn2 == 0) | (qn2 == 0), F.lit(-2.0)).otherwise(
            dot.cast("double")
            / (F.sqrt(cn2.cast("double")) * F.sqrt(qn2.cast("double")))
        )
    else:
        term = cosine_fast(F.col("cvec"), F.col("qv"))
    lut = codebook.join(F.broadcast(qsub), "m").select(
        "m", F.col("cid").alias("code"), term.alias("__term")
    )
    terms = encoded.join(F.broadcast(lut), ["m", "code"])
    pivot = terms.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("m") == j, F.col("__term"))).alias(f"_t{j}")
            for j in range(n_subspaces)
        ]
    )
    score = F.col("_t0")
    for j in range(1, n_subspaces):
        score = score + F.col(f"_t{j}")
    return (
        pivot.select(F.col(id_col), score.alias("adc_score"))
        .orderBy(F.desc("adc_score"), F.asc(id_col))
        .limit(k)
    )
