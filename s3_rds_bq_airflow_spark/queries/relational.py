"""Core relational operators as declared queries.

Covers SURVEY.md §2.3 (joins: inner/semi/anti/broadcast), §2.4
(aggregations: hash agg partial+final, distinct agg, grouping
sets/rollup/cube, count reconciliation), §2.6 (sort/limit/top-k),
§2.7 (set operations). The reference itself only ever runs per-table
counts and a MERGE (its §2.3/2.4 tables mark most of this "absent —
free in Spark"); the rebuild exposes the full surface over the same
star-schema keys.

Scale notes (100 TB posture): every query here keeps filters next to
the scan so Catalyst pushes them into the parquet reader; the
constant-cardinality dimensions (region 5 rows, nation 25 rows at
any SF) are broadcast by explicit hint, while SF-scaling dimensions
(supplier/part/customer) carry no hint — size-based planning + AQE
broadcast them while small and shuffle them at 100 TB, instead of a
forced hint overriding the size check into an OOM; aggregations are
partial+final hash aggregates (map-side combine) by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from ._util import dec, dim_outgrows_broadcast, dsum, t


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) * CAST(1 + l_tax AS DECIMAL(8,2))), 2) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-style pricing summary: scan -> pushed filter ->
    partial+final hash aggregate. Decimal math keeps sums exact and
    order-independent across any number of partitions.

    The scale-4/6 currency sums are ROUNDed to 2 dp in the DECIMAL
    domain before the double cast: decimal->double is engine-portable
    only while the unscaled integer stays under 2^53 (DuckDB converts
    int128/10^scale in two rounding steps; Spark rounds once), and the
    scale-6 sum_charge crossed that at the round-6 sf1 sweep (1-ulp
    split). At 2 dp the unscaled value re-enters exact-double range
    through sf100."""
    li = t(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice")
    one_minus_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    one_plus_tax = (F.lit(1) + F.col("l_tax")).cast("decimal(8,2)")
    sum_qty = F.sum(dec("l_quantity")).cast("double")
    sum_price = F.sum(price).cast("double")
    n = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty.alias("sum_qty"),
            sum_price.alias("sum_base_price"),
            F.round(F.sum(price * one_minus_disc), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(price * one_minus_disc * one_plus_tax), 2).cast("double").alias("sum_charge"),
            (sum_qty / n).alias("avg_qty"),
            (sum_price / n).alias("avg_price"),
            n.alias("count_order"),
        )
    )


_REVENUE_ORACLE = "SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)))"


def _revenue() -> "F.Column":
    return F.sum(dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)"))


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST({_REVENUE_ORACLE} AS DOUBLE) AS revenue,
           CAST(o_orderdate AS VARCHAR) AS o_orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H-Q3-style: selective join + group + top-k. Catalyst pushes
    both date predicates into the scans; top-k is a TakeOrderedAndProject
    (no full sort of the aggregate).

    Round-11 reorder (guide §3.1/§2.3): customer contributes no output
    columns — it is purely a filter on orders — so it joins orders as
    a LEFT SEMI *before* the fact-fact join instead of riding inner on
    the joined lineitem rows. The orderkey join's build side shrinks
    to the BUILDING fifth (73k -> 14.6k orders at sf0.1) and the
    lineitem rows never carry customer payload. Value-identical
    (c_custkey is unique, so inner-to-semi cannot change multiplicity).
    Bench sf0.1: 1.44 s -> 1.13 s same-window; oracle hash-green at
    sf0.001/0.01/0.1."""
    cust = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp"))
    o2 = orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
    return (
        li.join(o2, li.l_orderkey == o2.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue().cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_nation_revenue",
    oracle=f"""
    SELECT n_name, CAST({_REVENUE_ORACLE} AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_nation_revenue(spark, sf_dir):
    """TPC-H-Q5-style star join. nation/region broadcast by hint
    (25 / 5 rows at 100 TB too); supplier is size-planned — broadcast
    while it fits the threshold, shuffle at the SF where it no longer
    does. The only unavoidable shuffles are the two fact-fact joins
    and the final tiny aggregate.

    Adaptive prefilter (round 12, guide §3.1/§6): once customer
    outgrows the broadcast threshold (`dim_outgrows_broadcast` — file
    size vs the session threshold, the planner's own statistic), the
    ASIA nation keys (nation-domain bounded, <= 25) are collected
    once and pushed into the customer AND supplier scans as IN
    filters: the region predicate then prunes ~4/5 of both dimensions
    AT THE SCAN, ahead of their shuffles instead of after the join,
    usually shrinking them back under the broadcast threshold.
    Value-identical — the inner joins against the ASIA-filtered
    nation/region would drop exactly those rows anyway, and a filter
    cannot change multiplicity. Below the gate the plan is
    structurally identical to round 11's (measured there: extra
    prefilter stages are a net LOSS while every dimension broadcasts
    — bench SF keeps the simpler shape)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    region = F.broadcast(t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    if dim_outgrows_broadcast(spark, sf_dir, "customer"):
        # ASIA nation keys, collected once (nation-domain bounded,
        # <= 25 rows — the trainprep source-enum collect class) and
        # inlined as IN filters on BOTH dimension scans: the
        # predicate pushes into the parquet scans (guide §6) with no
        # extra join stage, and — unlike a semi join on the cached
        # nation frame — no ambiguous-self-join hazard with the
        # nation/region joins below.
        asia_nk = [
            r["n_nationkey"]
            for r in t(spark, sf_dir, "nation")
            .join(
                t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .select("n_nationkey")
            .collect()
        ]
        cust = cust.where(
            F.col("c_nationkey").isin(asia_nk) if asia_nk else F.lit(False)
        )
        supp = supp.where(
            F.col("s_nationkey").isin(asia_nk) if asia_nk else F.lit(False)
        )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue().cast("double").alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(8,2))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H-Q6-style scalar aggregate — everything pushes into the
    parquet scan (PushedFilters on shipdate/discount/quantity), the
    aggregate is a single partial+final reduce, no shuffle of data."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # ROUND-to-2 before the double cast: global revenue's
            # unscaled scale-4 integer would cross 2^53 around sf10,
            # splitting the decimal->double conversion (see q1)
            F.round(
                F.sum(dec("l_extendedprice") * dec("l_discount", "decimal(8,2)")), 2
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q_semi_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
)
def q_semi_join(spark, sf_dir):
    """LEFT SEMI join (EXISTS) — reference has no join operator at all
    (SURVEY §2.3 'absent'); in Spark this is a single shuffle or
    broadcast semi that never materializes the probe payload."""
    cust = t(spark, sf_dir, "customer")
    big_orders = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return (
        cust.join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_anti_join",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    GROUP BY n_name
    """,
)
def q_anti_join(spark, sf_dir):
    """LEFT ANTI join (NOT EXISTS): customers with no big-ticket order."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(nation, F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


@query(
    "q_topk_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 15
    """,
)
def q_topk_customers(spark, sf_dir):
    """Top-k by sort: physical plan is TakeOrderedAndProject — each
    partition keeps its local top 15, the driver merges; no global
    sort at any scale."""
    return (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(15)
    )


@query(
    "q_distinct_agg",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_distinct_customers,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_distinct_agg(spark, sf_dir):
    """Distinct aggregate alongside plain aggregates (expand + two-
    phase hash agg in the physical plan)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_distinct_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


@query("q_approx_distinct")
def q_approx_distinct(spark, sf_dir):
    """HyperLogLog++ approximate distinct — the 100 TB answer to
    COUNT(DISTINCT): fixed-size sketch, single pass, mergeable across
    partitions. No oracle (DuckDB's approx algorithm differs) —
    rows-only check; exactness is covered by q_distinct_agg."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey").alias("approx_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "q_approx_distinct_bounds",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           CAST(1 AS BIGINT) AS within_3rsd
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_approx_distinct_bounds(spark, sf_dir):
    """Hash-checkable wrapper for the HLL++ sketch (round-8 verdict
    nit): the raw estimate of q_approx_distinct can never hash-match
    a DuckDB oracle (different sketch algorithms), but its ERROR
    BOUND can — per group, emit the exact distinct count plus a flag
    that the HLL++ estimate (rsd=0.05) landed within 3 standard
    errors of it. The oracle states exact count + flag=1; a sketch
    regression (merge bug, register corruption) drifts the estimate
    outside the envelope and fails the driver's value hash. Scale:
    both aggregates are single-pass, mergeable, grouped on a
    5-value key with map-side partials — no sketch-vs-exact
    trade-off is being measured here, only correctness."""
    est = F.approx_count_distinct("o_custkey", rsd=0.05)
    exact = F.count_distinct("o_custkey")
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            exact.cast("long").alias("exact_customers"),
            (
                F.abs(est - exact)
                <= F.greatest(F.lit(1.0), F.lit(3 * 0.05) * exact)
            )
            .cast("long")
            .alias("within_3rsd"),
        )
    )


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
    """,
)
def q_union_distinct(spark, sf_dir):
    """UNION (distinct) of two key sets."""
    rich = t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000).select("c_custkey")
    big = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return rich.union(big).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def q_intersect(spark, sf_dir):
    """INTERSECT: customers in debt who have ordered."""
    indebt = t(spark, sf_dir, "customer").where(F.col("c_acctbal") < 0).select("c_custkey")
    ordered = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return indebt.intersect(ordered)


@query(
    "q_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def q_except(spark, sf_dir):
    """EXCEPT: in-debt customers minus big-ticket purchasers."""
    indebt = t(spark, sf_dir, "customer").where(F.col("c_acctbal") < 0).select("c_custkey")
    ordered = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return indebt.exceptAll(ordered).distinct()


@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals (flag, flag+status, grand total)."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark, sf_dir):
    """CUBE over status x priority."""
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_price"))
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via the SQL surface (same Catalyst plan
    as the DataFrame cube/rollup — Expand + hash aggregate)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "q_reconcile_counts",
    oracle="""
    SELECT 'customer' AS table_name, COUNT(*) AS row_cnt FROM customer
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    UNION ALL SELECT 'part', COUNT(*) FROM part
    UNION ALL SELECT 'nation', COUNT(*) FROM nation
    UNION ALL SELECT 'region', COUNT(*) FROM region
    """,
)
def q_reconcile_counts(spark, sf_dir):
    """Catalog count scan (reference S9/A1/V3: per-table row counts
    driving verification). Parquet COUNT(*) answers from footer
    metadata — no data scan."""
    frames = []
    for name in ("customer", "orders", "lineitem", "supplier", "part", "nation", "region"):
        frames.append(
            t(spark, sf_dir, name).agg(F.count(F.lit(1)).alias("row_cnt")).select(
                F.lit(name).alias("table_name"), "row_cnt"
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.union(f)
    return out
