"""Coverage queries for remaining plan shapes: generators (explode),
deterministic hash sampling, RANGE window frames, ntile bucketing.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from .registry import query
from ._util import dec, dsum, t


@query(
    "q_token_topk",
    oracle="""
    SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
        SELECT doc_id, UNNEST(string_split(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g')), ' ')) AS token
        FROM documents
    )
    WHERE token <> ''
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT 25
    """,
)
def q_token_topk(spark, sf_dir):
    """Corpus token frequency: generator (explode) -> hash aggregate
    -> top-k. The explode multiplies rows BEFORE the aggregate, but
    partial aggregation collapses per-partition counts before the
    (token) shuffle — vocabulary-sized state, not corpus-sized."""
    docs = t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (
        docs.select("doc_id", F.explode(F.split(norm, " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(25)
    )


@query(
    "q_hash_sample",
    oracle="""
    SELECT COUNT(*) AS n_sampled,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sampled_price,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    WHERE SUBSTRING(MD5(CAST(o_orderkey AS VARCHAR)), 1, 2) <= '0c'
    """,
)
def q_hash_sample(spark, sf_dir):
    """Deterministic ~5% sample by content hash prefix — reproducible
    across engines, runs, partitionings, and scale factors (unlike
    TABLESAMPLE/rand()), and consistent for the same key across
    tables. The standard trick for stable debug/eval splits on
    100 TB inputs."""
    o = t(spark, sf_dir, "orders")
    return (
        o.where(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) <= "0c")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            dsum("o_totalprice").alias("sampled_price"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
    )


@query(
    "q_window_range",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_similar_cheaper,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                        RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS price_band_sum
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
)
def q_window_range(spark, sf_dir):
    """RANGE frame (value-based, not row-based): all orders within
    1000 of the current price below it. Ties share identical frame
    results by definition, so the output is deterministic without a
    unique-key tie-break."""
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 0)
    )
    return (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 20 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.count(F.lit(1)).over(w).alias("n_similar_cheaper"),
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("price_band_sum"),
        )
    )


@query(
    "q_ntile",
    oracle="""
    SELECT c_mktsegment, balance_quartile,
           COUNT(*) AS n_customers,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal
    FROM (
        SELECT c_mktsegment, c_acctbal,
               NTILE(4) OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal, c_custkey) AS balance_quartile
        FROM customer
    )
    GROUP BY c_mktsegment, balance_quartile
    """,
)
def q_ntile(spark, sf_dir):
    """NTILE quartiles per segment (unique-key tie-break makes tile
    assignment deterministic), re-aggregated to band summaries."""
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_acctbal", F.ntile(4).over(w).alias("balance_quartile"))
        .groupBy("c_mktsegment", "balance_quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(list_max(embedding) AS DOUBLE) AS max_elem,
           CAST(list_min(embedding) AS DOUBLE) AS min_elem,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(list_sort(list_slice(embedding, 1, 4))[4] AS DOUBLE) AS sorted4_last,
           CAST(list_sum(list_transform(list_slice(embedding, 1, 8),
                    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)
                         * CAST(FLOOR(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)))
                AS BIGINT) AS head8_energy_q8
    FROM embeddings
    WHERE vec_id % 40 = 0
    """,
)
def q_array_funcs(spark, sf_dir):
    """Array function family (§2.8 'free in Spark'): size, min/max,
    element access, slice+sort, and a transform/aggregate pipeline —
    all JVM-side higher-order functions over array<float>. The energy
    aggregate uses the scale-4 portable integer quantization (exact
    BIGINT sum of squares, < 2^53): the earlier decimal-cast +
    6-dp-round form hit a rounding boundary at the sf1 sweep — the
    ~1e-8 float->DECIMAL representation skew between engines has no
    safe fixed-precision rounding, only exact integers do."""
    e = t(spark, sf_dir, "embeddings").where(F.col("vec_id") % 40 == 0)
    head8 = F.slice("embedding", 1, 8)
    q = lambda x: F.floor(x.cast("double") * 10000 + F.lit(0.5)).cast("long")  # noqa: E731
    energy = F.aggregate(
        F.transform(head8, lambda x: q(x) * q(x)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_max("embedding").cast("double").alias("max_elem"),
        F.array_min("embedding").cast("double").alias("min_elem"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.element_at(F.sort_array(F.slice("embedding", 1, 4)), 4).cast("double").alias("sorted4_last"),
        energy.alias("head8_energy_q8"),
    )


@query(
    "q_monthly_trend",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000) AS big_spenders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q_monthly_trend(spark, sf_dir):
    """Calendar-bucket trend (date_trunc month) with a FILTERed
    distinct aggregate alongside plain ones — the everyday reporting
    shape; at scale the month column doubles as the partition key."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    return (
        o.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
            F.countDistinct(
                F.when(F.col("o_totalprice") > 200000, F.col("o_custkey"))
            ).alias("big_spenders"),
        )
    )


@query(
    "q_stratified_sample",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_sampled,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sampled_price
    FROM orders
    WHERE SUBSTRING(MD5(CAST(o_orderkey AS VARCHAR)), 1, 2) <=
          CASE o_orderstatus WHEN 'O' THEN '0c' WHEN 'F' THEN '1f' ELSE '7f' END
    GROUP BY o_orderstatus
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Stratified deterministic sampling: per-stratum rates (~5% of
    open orders, ~12% of filled, ~50% of the rare partial class) via
    content-hash thresholds — the class-balancing sampler for training
    sets, reproducible across engines/runs/partitionings unlike
    sampleBy(rand)."""
    o = t(spark, sf_dir, "orders")
    threshold = (
        F.when(F.col("o_orderstatus") == "O", "0c")
        .when(F.col("o_orderstatus") == "F", "1f")
        .otherwise("7f")
    )
    return (
        o.where(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) <= threshold)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            dsum("o_totalprice").alias("sampled_price"),
        )
    )


_BOTTOMK = 1000


@query(
    "q_bottomk_sample",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus,
           SUBSTRING(MD5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS h
    FROM orders
    ORDER BY MD5(CAST(o_orderkey AS VARCHAR)), o_orderkey
    LIMIT {_BOTTOMK}
    """,
)
def q_bottomk_sample(spark, sf_dir):
    """Exact-size uniform sample via bottom-k-by-hash — the
    deterministic alternative to reservoir sampling: the k rows with
    the smallest md5(key) are a uniform random subset of ANY input
    size, reproducible across engines, runs, and partitionings (which
    rand()-based sampling is not), and incrementally mergeable (the
    bottom-k of a union is the bottom-k of the parts' bottom-ks — the
    KMV sketch identity).

    Scale shape: TakeOrdered — each partition keeps its local k, the
    driver merges P*k candidates; no global sort, no full shuffle.
    Bernoulli-rate sampling (q_hash_sample) trades exact size for
    zero coordination; bottom-k pins the budget exactly, which is
    what an eval-set or labeling-batch extraction needs."""
    o = t(spark, sf_dir, "orders")
    h = F.md5(F.col("o_orderkey").cast("string"))
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.substring(h, 1, 8).alias("h"),
        )
        .orderBy(h, "o_orderkey")
        .limit(_BOTTOMK)
    )


_STRAT_K = 50


@query(
    "q_stratified_bottomk",
    oracle=f"""
    WITH ranked AS (
        SELECT o_orderstatus, o_orderkey,
               SUBSTRING(MD5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS h,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY MD5(CAST(o_orderkey AS VARCHAR)),
                                           o_orderkey) AS rn
        FROM orders
    )
    SELECT o_orderstatus, o_orderkey, h
    FROM ranked WHERE rn <= {_STRAT_K}
    """,
)
def q_stratified_bottomk(spark, sf_dir):
    """Stratified exact-size sampling: bottom-k-by-hash WITHIN each
    stratum (k=50 per order status) — equal representation from
    unequal strata, which Bernoulli stratified sampling
    (q_stratified_sample) can only hit in expectation. Same KMV
    determinism as q_bottomk_sample, so the per-stratum samples are
    reproducible and mergeable.

    Scale shape: one shuffle on the stratum key for the row_number
    window; at 100 TB strata are far fewer than partitions, so a
    two-phase refinement (per-partition local k, then global k of
    the P*k candidates) bounds the sort — the window form here is
    the semantic spec both phases must equal."""
    from pyspark.sql import Window

    h = F.md5(F.col("o_orderkey").cast("string"))
    w = Window.partitionBy("o_orderstatus").orderBy(h, F.col("o_orderkey"))
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.substring(h, 1, 8).alias("h"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= _STRAT_K)
        .drop("rn")
    )


@query(
    "q_zonemap_prune",
    oracle="""
    WITH zones AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS zone,
               COUNT(*) AS n_rows,
               MAX(o_orderdate) AS max_date,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders GROUP BY zone
    )
    SELECT zone, CAST(n_rows AS BIGINT) AS n_rows,
           CASE WHEN max_date < TIMESTAMP '2000-06-01' THEN 1 ELSE 0 END
               AS skipped,
           CAST(CASE WHEN max_date < TIMESTAMP '2000-06-01'
                     THEN 0 ELSE n_rows END AS BIGINT) AS rows_scanned
    FROM zones
    """,
)
def q_zonemap_prune(spark, sf_dir):
    """Zone-map (min/max statistics) pruning audit — the data-
    skipping layer every columnar warehouse puts between predicate
    and scan: per zone (here: order month, standing in for a parquet
    row group or Iceberg data file), the maintained min/max of the
    filter column decides whether the predicate `o_totalprice >
    450000` can touch it at all. The query materializes that
    decision per zone — skipped flag and surviving scan volume — so
    the stats-maintenance path itself is oracle-checked.

    Scale shape: zone stats are a zone-count-sized aggregate
    maintained incrementally at write time in practice; the prune
    decision is a constant-time comparison per zone, never a data
    scan. This is the explicit form of what the engine's parquet
    scans already do implicitly (pinned by the PushedFilters plan
    tests): predicate pushdown -> row-group skip via these exact
    stats."""
    zones = (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("zone"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("o_orderdate").alias("max_date"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
    prune = F.col("max_date") < F.lit("2000-06-01").cast("timestamp_ntz")
    return zones.select(
        "zone",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.when(prune, 1).otherwise(0).alias("skipped"),
        F.when(prune, F.lit(0)).otherwise(F.col("n_rows")).cast("long").alias(
            "rows_scanned"
        ),
    )
