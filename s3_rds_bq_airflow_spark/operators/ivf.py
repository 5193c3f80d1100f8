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

- init: the ``n_centroids`` vectors with the smallest ``md5(id)``
  — a seeded pseudo-random draw with no RNG state, computed
  identically by any engine (the basis of the SQL oracle);
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

``exact=True`` (the oracle-checked verification gear, mirroring the
LSH exact mode in ``similarity.py``): input vectors are quantized
ONCE to scale-3 integers (``x -> floor(x*1000 + 0.5)`` on doubles —
identical IEEE steps on both engines; a float->DECIMAL cast is NOT
portable, see ``_quantize_long``), centroids are exact
integer COMPONENT SUMS of their members (cosine is scale-invariant,
so sum ≡ mean for assignment/probing — no division anywhere), and
every ordering key is ``dot / sqrt(norm2)`` computed from exact
integer aggregates. Dots and norms accumulate in DECIMAL(38,0)
(HUGEINT on the DuckDB side): centroid components grow linearly and
their squares QUADRATICALLY with cell size, so a long accumulator
would leave 2^53/int64 territory around ~12k/4e5 sign-aligned
members per cell — decimal keeps every aggregate an exact integer at
any cell size the 38-digit width can hold (~1e12 members at dim 64).
The final decimal->double casts are correctly-rounded from the SAME
exact integer on both engines, and the remaining sqrt/divide are
single IEEE ops — the keys, hence the assignments, probes, and final
top-k, are bit-identical on any engine. Centroid component sums
themselves stay long (linear in cell size: overflow needs ~9e15
members). The whole fit+search pipeline becomes a DuckDB-expressible
oracle (queries/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .similarity import (
    cosine_exact_vs,
    cosine_fast,
    cosine_fast_pre,
    cosine_fast_vs,
    query_norm_dec,
    query_norm_double,
)

__all__ = ["ivf_fit", "ivf_assign", "ivf_topk"]


def _rebuild(vec_struct_list):  # ordered array<float> from (pos, x) structs
    return F.transform(F.array_sort(vec_struct_list), lambda s: s["x"])


_Q_SCALE = 1000  # exact mode: 3-dp quantization (see module docstring)


def _quantize_long(vec):
    """array<float> -> array<long>, x -> floor(x*1000 + 0.5) computed
    on DOUBLES. Every step is a single IEEE operation on the exact
    float->double widening, so both engines produce the identical
    double and floor it identically — no representation ambiguity.

    A float->DECIMAL(9,3) cast is NOT portable here: DuckDB rounds the
    float's SHORTEST DECIMAL REPRESENTATION (0.31949999928474426f
    prints as "0.3195" -> 0.320) while Spark rounds the exact binary
    value (-> 0.319); at sf0.1 two of 128k components sat on such
    boundaries and shifted centroid sums by +-1 (caught by the IVFPQ
    ADC oracle, whose terms expose centroid values directly)."""
    col = vec if not isinstance(vec, str) else F.col(vec)
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * _Q_SCALE + F.lit(0.5)).cast("long")
    )


def _dot_exact(a, b):
    """Exact integer dot product of two array<long>, accumulated in
    DECIMAL(38,0) so centroid-sized components (linear in cell
    members; their squares quadratic) can never wrap an int64 or
    leave exact-integer territory — see module docstring."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("decimal(19,0)") * y),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: acc + x,
    )


def _ckey(dot, norm2):
    """Assignment/probe ordering key ``dot / |c|`` from exact integer
    aggregates (|x| is constant per row — irrelevant to the argmax).
    ``dot``/``norm2`` are exact DECIMAL(38,0) integers; both engines
    correctly-round the same integer to double, and sqrt/divide are
    single IEEE ops: bit-identical across engines. A zero-norm
    centroid (fully cancelled cell) keys below any cosine."""
    return F.when(norm2 == 0, F.lit(-2.0)).otherwise(
        dot.cast("double") / F.sqrt(norm2.cast("double"))
    )


def ivf_fit(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iters: int = 2,
    exact: bool = False,
) -> DataFrame:
    """Fit coarse centroids; returns (cid int, cvec array).

    ``exact=True``: cvec is the scale-3 integer COMPONENT SUM of the
    cell's quantized members (array<long>) — direction-equivalent to
    the mean under cosine, exactly reproducible in SQL."""
    seed_rows = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
    )
    w = W.orderBy(F.col(id_col))
    centroids = seed_rows.select(
        (F.row_number().over(w) - 1).alias("cid"),
        (
            _quantize_long(F.col(vec_col))
            if exact
            else F.col(vec_col).cast("array<double>")
        ).alias("cvec"),
    )
    for _ in range(n_iters):
        assigned = ivf_assign(
            embeddings, centroids, id_col=id_col, vec_col=vec_col, exact=exact
        )
        member_vec = _quantize_long(F.col(vec_col)) if exact else F.col(vec_col)
        agg = F.sum("x").cast("long").alias("x") if exact else F.avg("x").alias("x")
        means = (
            assigned.select("cid", F.posexplode(member_vec).alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(agg)
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
    exact: bool = False,
) -> DataFrame:
    """Attach each vector's nearest-centroid ``cid`` (cosine metric,
    ties to the smaller cid). ``exact=True`` expects integer-sum
    centroids from ``ivf_fit(exact=True)`` and orders by the
    engine-portable integer key instead of double cosine."""
    if exact:
        cents = F.broadcast(
            centroids.select("cid", "cvec", _dot_exact("cvec", "cvec").alias("__cn2"))
        )
        scored = (
            embeddings.withColumn("__xi", _quantize_long(F.col(vec_col)))
            .crossJoin(cents)
            .withColumn("__sim", _ckey(_dot_exact("__xi", "cvec"), F.col("__cn2")))
        )
    else:
        # norms hoisted: the row norm is computed ONCE per vector and
        # reused across all |centroids| comparisons; centroid norms
        # ride the broadcast side.
        scored = (
            embeddings.withColumn("__n", query_norm_double(F.col(vec_col)))
            .crossJoin(
                F.broadcast(
                    centroids.withColumn("__cn", query_norm_double(F.col("cvec")))
                )
            )
            .withColumn(
                "__sim",
                cosine_fast_pre(
                    F.col(vec_col), F.col("cvec"), F.col("__n"), F.col("__cn")
                ),
            )
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

    ``exact=True`` (with ``exact`` fit/assign output) selects probe
    cells by the engine-portable integer key and re-ranks candidates
    with the decimal-exact cosine — the fully oracle-checkable mode;
    with full probe the result is bit-identical to the brute-force
    oracle. Default double path is the throughput mode."""
    q = query_vec.select(F.col(vec_col).alias("_qvec"))
    if exact:
        csim = _ckey(
            _dot_exact("cvec", _quantize_long(F.col("_qvec"))),
            _dot_exact("cvec", "cvec"),
        )
    else:
        csim = cosine_fast(F.col("cvec"), F.col("_qvec"))
    norm_of = query_norm_dec if exact else query_norm_double
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select("cid", "_qvec", csim.alias("__csim"))
        .orderBy(F.col("__csim").desc(), F.col("cid"))
        .limit(n_probe)
        .select("cid", "_qvec", norm_of(F.col("_qvec")).alias("_qnorm"))
    )
    cands = assigned.join(F.broadcast(probe_cells), "cid")
    cos = (cosine_exact_vs if exact else cosine_fast_vs)(
        F.col(vec_col), F.col("_qvec"), F.col("_qnorm")
    )
    return (
        cands.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
