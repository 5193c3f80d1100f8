"""Window-function operators (SURVEY §2.5).

The reference's single window op is W1 — dedup-latest via ROW_NUMBER
before MERGE (`target_bigquery/core.py:536-545`). Implemented here
plus the full analytic surface (ranking, lag/lead, running frames,
moving frames) the rebuild exposes.

Scale: window partitions hash-shuffle on the PARTITION BY key once;
all frames evaluate within a partition sort — no driver involvement.
Skewed partition keys (one user with billions of rows) are the thing
to watch at 100 TB; AQE skew handling and key-salting cover it.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from .registry import query
from ._util import dec, t, ts_str


@query(
    "q_dedup_latest",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM (
        SELECT user_id, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_dedup_latest(spark, sf_dir):
    """W1 dedup-latest: keep the newest row per key (the reference
    runs exactly this before its BigQuery MERGE,
    `target_bigquery/core.py:536-545`)."""
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@query(
    "q_window_running",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def q_window_running(spark, sf_dir):
    """Running total per customer (cumulative frame)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("double").alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "q_window_rank",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank,
           LAG(p_retailprice)  OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS next_cheaper,
           LEAD(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS next_pricier
    FROM part
    """,
)
def q_window_rank(spark, sf_dir):
    """Ranking + lag/lead analytics within brand."""
    rank_w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    lag_w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(rank_w).alias("price_rank"),
        F.dense_rank().over(rank_w).alias("price_dense_rank"),
        F.lag("p_retailprice").over(lag_w).alias("next_cheaper"),
        F.lead("p_retailprice").over(lag_w).alias("next_pricier"),
    )


@query(
    "q_window_moving",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum_3,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_in_frame
    FROM orders
    """,
)
def q_window_moving(spark, sf_dir):
    """Moving 3-row frame per customer (bounded ROWS frame)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("moving_sum_3"),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )


@query(
    "q_window_share",
    oracle="""
    SELECT n_name, c_custkey,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY n_name) AS DOUBLE) AS DOUBLE) AS nation_total,
           CAST(c_acctbal AS DOUBLE) / CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY n_name) AS DOUBLE) AS balance_share
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def q_window_share(spark, sf_dir):
    """Unordered full-partition window (share-of-total analytic)."""
    w = W.partitionBy("n_name")
    nation_total = F.sum(dec("c_acctbal")).over(w).cast("double")
    return (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(t(spark, sf_dir, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "c_custkey",
            nation_total.alias("nation_total"),
            (F.col("c_acctbal").cast("double") / nation_total).alias("balance_share"),
        )
    )


@query(
    "q_window_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WHERE o_orderkey % 6 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_window_first_last(spark, sf_dir):
    """first_value / last_value / nth_value with explicit frames —
    last_value needs the full-partition frame (the default frame stops
    at CURRENT ROW, a classic silent-wrong-answer; stated explicitly
    on both sides)."""
    base = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    full = base.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 6 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.first("o_totalprice").over(running).alias("first_price"),
            F.last("o_totalprice").over(full).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(running).alias("second_price"),
        )
    )


@query(
    "q_window_distribution",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey) AS bal_percent_rank,
           CUME_DIST()    OVER (ORDER BY s_acctbal, s_suppkey) AS bal_cume_dist
    FROM supplier
    """,
)
def q_window_distribution(spark, sf_dir):
    """Distribution ranking (percent_rank / cume_dist) over a global
    ordering. The ORDER BY key (s_acctbal, s_suppkey) is UNIQUE, so
    every peer group is one row and the distribution functions reduce
    to exact arithmetic on the global row number: percent_rank =
    (i-1)/(n-1), cume_dist = i/n — each a single division of exact
    integers, bit-portable. Since round 7 the row number comes from
    ``operators/rangebucket.ordered_running`` (range buckets +
    partitioned windows + broadcast offsets), so even this dimension
    ranking never funnels through an Exchange SinglePartition — the
    supplier dimension grows linearly with the fact table in TPC-H's
    data model, and the oracle's PERCENT_RANK/CUME_DIST window
    replays the identical values."""
    from ..operators.rangebucket import ordered_running

    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    ranked = ordered_running(
        sup, "s_acctbal", "s_suppkey", descending=False, index_col="_i"
    )
    n = sup.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "s_suppkey",
            "s_acctbal",
            # n=1 guard: PERCENT_RANK is defined as 0.0 for a 1-row
            # partition, while a bare (i-1)/(n-1) would NULL out on
            # the zero divisor (round-7 advisor finding).
            F.when(
                F.col("_n") > 1,
                (F.col("_i") - F.lit(1)).cast("double")
                / (F.col("_n") - F.lit(1)).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("bal_percent_rank"),
            (
                F.col("_i").cast("double") / F.col("_n").cast("double")
            ).alias("bal_cume_dist"),
        )
    )
