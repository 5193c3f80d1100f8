"""Extended relational coverage: the TPC-H-shaped analytic patterns
(adapted to the synthetic star schema) the reference's dataset exists
for but its code never runs (SURVEY §2.3/§2.4 mark joins and grouped
aggregation "absent — free in Spark").

Each query exercises a distinct plan shape: semi join with non-equi
residual (q4), multi-fact nation-pair join (q7), share-of-total
conditional aggregation (q8, q14), four-way star profit rollup (q9),
group-filter join-back (q18, argmax), disjunctive pushdown (q19),
distinct-count with NOT-IN exclusion (q16), scalar-subquery threshold
+ anti join (q22).

Scale notes: CONSTANT-cardinality dimensions (nation, region) are
broadcast explicitly; SF-SCALING dimensions (part, supplier,
customer — TPC-H grows them linearly with the corpus) carry NO
broadcast hint, so size-based planning + AQE broadcast them while
they fit the threshold and degrade to a shuffle join at 100 TB
instead of overriding the size check into an executor/driver OOM
(enforced catalog-wide: the forced-broadcast sweep's fact set
includes part/supplier/customer). Every conditional ratio is
computed from exact decimal partials; thresholds derived from data
use two-phase aggregation, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from ._util import dec, dim_outgrows_broadcast, dsum, t

_REV = "SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)))"


def _rev() -> F.Column:
    return F.sum(dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)"))


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H-Q4 shape: EXISTS with a NON-equi residual (line shipped
    after order date) — a left-semi join whose condition carries both
    the key equality and the date comparison."""
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST({_REV} AS DOUBLE) AS revenue
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H-Q7 shape: trade volume between a nation pair by year.
    Disjunctive cross-dimension predicate evaluates after the
    dimension joins (nation broadcast by hint; supplier by size
    stats while it fits); only fact-fact join shuffles.

    Adaptive prefilter (round 12, guide §3.1/§6): once customer
    outgrows the broadcast threshold, the two pair nations' keys
    (nation-domain bounded, <= 25) are collected once and pushed into
    the supplier AND customer scans as IN filters BEFORE the fact
    joins — the disjunction only keeps (supp, cust) nations drawn
    from that two-element set, so the prefilter keeps a superset of
    the surviving rows and a filter cannot change multiplicity; it
    prunes ~23/25 of both dimensions at the scan, usually shrinking
    them back under the broadcast threshold. Below the gate the
    round-11 plan is kept unchanged (prefilter measured slower while
    everything broadcasts)."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    supp = t(spark, sf_dir, "supplier")
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    if dim_outgrows_broadcast(spark, sf_dir, "customer"):
        # The two pair nations' keys, collected once (nation-domain
        # bounded, <= 25 rows — the trainprep source-enum collect
        # class) and inlined as IN filters on both dimension scans:
        # predicate pushdown into the parquet scans (guide §6), no
        # extra join stage, no self-join hazard with the n1/n2
        # broadcast joins below.
        pair_nk = [
            r["n_nationkey"]
            for r in t(spark, sf_dir, "nation")
            .where(F.col("n_name").isin("NATION_3", "NATION_7"))
            .select("n_nationkey")
            .collect()
        ]
        supp = supp.where(
            F.col("s_nationkey").isin(pair_nk) if pair_nk else F.lit(False)
        )
        cust = cust.where(
            F.col("c_nationkey").isin(pair_nk) if pair_nk else F.lit(False)
        )
    n1 = F.broadcast(t(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = F.broadcast(t(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(_rev().cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT l_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume_dec ELSE 0 END) AS DOUBLE)
             / CAST(SUM(volume_dec) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS volume_dec,
               n1.n_name AS supp_nation
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          JOIN region   ON n2.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY l_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H-Q8 shape: one nation's share of a region's purchase
    volume per year — conditional decimal aggregation; the ratio is
    derived from two exact partial sums."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    n1 = F.broadcast(t(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = F.broadcast(t(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey")
    )
    region = F.broadcast(t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE"))
    vol = dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(region, F.col("n2_rkey") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("l_year"),
            vol.alias("volume_dec"),
            "supp_nation",
        )
    )
    return base.groupBy("l_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume_dec")).otherwise(F.lit(0))).cast("double")
            / F.sum("volume_dec").cast("double")
        ).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))
                    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.5 AS DECIMAL(3,1))) AS DOUBLE)
             AS profit
    FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H-Q9 shape: profit by supplier nation and year (supply cost
    stands in as half retail price — the dataset has no partsupp).
    nation broadcast by hint, part/supplier by size stats (no hint —
    they scale with SF); the fact table never shuffles before the
    aggregate."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    supp = t(spark, sf_dir, "supplier")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    profit = dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)") - dec(
        "p_retailprice"
    ) * dec("l_quantity") * F.lit(0.5).cast("decimal(3,1)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, CAST({_REV} AS DOUBLE) AS revenue, c_acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H-Q10 shape: customers who returned the most value in a
    half-year — join + group + top-k (TakeOrderedAndProject).

    Adaptive aggregate-first (round 12, guide §2.3 aggregate before
    you shuffle, §3.1): once customer outgrows the broadcast
    threshold its join becomes a shuffle of the joined fact rows, so
    the revenue is aggregated per o_custkey FIRST and the key-sized
    aggregate joins customer/nation after — the customer shuffle then
    moves one row per customer instead of every returned line item.
    Value-identical: c_custkey is unique, so (c_name, c_acctbal,
    n_name) are functionally determined by the grouping key and the
    per-custkey decimal sums are the same rows summed; custkeys
    without a customer row drop at the inner join in both shapes, and
    the double cast is applied to the same exact decimal. Below the
    gate the round-11 single-aggregate-after-broadcast-join plan is
    kept (agg-first measured slower while customer broadcasts)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    if dim_outgrows_broadcast(spark, sf_dir, "customer"):
        rev = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_custkey")
            .agg(_rev().alias("__rev_dec"))
        )
        return (
            rev.join(cust, rev.o_custkey == cust.c_custkey)
            .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
            .select(
                "c_custkey",
                "c_name",
                F.col("__rev_dec").cast("double").alias("revenue"),
                "c_acctbal",
                "n_name",
            )
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20)
        )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev().cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_shipping(spark, sf_dir):
    """TPC-H-Q12 shape (ship-mode replaced by line status): counts of
    high/low-priority order lines shipped in a year — conditional
    integer aggregation after an equi-join."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT CAST(100.0 AS DOUBLE)
             * CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))
                             ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_share(spark, sf_dir):
    """TPC-H-Q14 shape: promo revenue percentage for one month —
    size-planned part join (broadcast while part fits the
    threshold) + two exact conditional sums."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0))).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q16_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (5, 10, 15, 20, 25, 30)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 25
    """,
)
def q16_supplier_diversity(spark, sf_dir):
    """TPC-H-Q16 shape: distinct-supplier counts per part attribute
    with a NOT-IN exclusion (left-anti against in-arrears suppliers,
    which broadcast — the exclusion list is tiny at any scale)."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
    )
    bad_supp = (
        t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(25)
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H-Q18 shape: large-volume orders — a HAVING-filtered
    aggregate joined straight back to orders.

    Round-11 rewrite (guide §1.2/§2.4 — fix the distributed algorithm
    first): the original semi-join form aggregated lineitem TWICE
    (once for the HAVING filter, once to re-derive sum_qty after
    re-joining lineitem), i.e. two full fact scans and two aggregates.
    The HAVING aggregate already IS sum_qty per order — keep it,
    filter it, and join orders/customer to it directly. One lineitem
    scan, one aggregate, no lineitem re-join; value-identical because
    o_orderkey is unique in orders, so the old final group-by-order
    re-aggregated exactly the rows whose sum the first pass had
    already computed. Bench sf0.1: 1.57 s -> 1.10 s same-window;
    oracle hash-green at sf0.001/0.01/0.1.

    The double cast happens INSIDE the aggregate subtree (same
    decimal->double conversion, applied before the join instead of in
    the final projection — bit-identical value), so the join payload
    is 8 bytes not 16: at sf10 that narrowing is what keeps the
    filtered aggregate inside AQE's broadcast-conversion reach instead
    of forcing a 15M-row orders shuffle+sort (measured: the wide
    variant regressed sf10 to ~2x; this one is par with the old plan
    there and strictly one fact scan cheaper at any scale)."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .where(F.col("qty") > 250)
        .select("l_orderkey", F.col("qty").cast("double").alias("sum_qty"))
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST({_REV} AS DOUBLE) AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 1 AND l_quantity <= 15)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H-Q19 shape: disjunction of conjunctive brand/size/quantity
    ranges — Catalyst extracts the common join key and pushes the OR
    of ranges into both scans."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 10)
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 15)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(10, 25)
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cond1 | cond2)
        .agg(_rev().cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "q22_dormant_rich",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
)
def q22_dormant_rich(spark, sf_dir):
    """TPC-H-Q22 shape: above-average-balance customers DORMANT since
    2000 (no recent orders) — scalar-subquery threshold (exact decimal
    mean, broadcast as a one-row cross join) + anti join against the
    pushed-down recent-orders slice. (Plain "no orders ever" returns
    zero rows on this synthetic data at every SF — a correctness row
    that can't distinguish right from wrong; the dormancy cutoff keeps
    the identical plan shape with non-empty evidence.)"""
    cust = t(spark, sf_dir, "customer")
    avg_pos = (
        cust.where(F.col("c_acctbal") > 0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    orders = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01 00:00:00")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_pos))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


@query(
    "q_argmax_join_back",
    oracle="""
    WITH mx AS (
        SELECT c_mktsegment AS seg, MAX(c_acctbal) AS max_bal
        FROM customer GROUP BY c_mktsegment
    ), pick AS (
        SELECT c.c_mktsegment AS seg, MIN(c_custkey) AS pick_key
        FROM customer c JOIN mx ON c.c_mktsegment = mx.seg AND c.c_acctbal = mx.max_bal
        GROUP BY c.c_mktsegment
    )
    SELECT c_mktsegment, c_custkey, c_name, c_acctbal
    FROM customer JOIN pick ON c_custkey = pick_key
    """,
)
def q_argmax_join_back(spark, sf_dir):
    """Argmax-per-group via aggregate + broadcast join-back (the
    two-shuffle alternative to a window row_number when groups are few
    and rows are huge — no full-partition sort of the fact table)."""
    cust = t(spark, sf_dir, "customer")
    mx = cust.groupBy(F.col("c_mktsegment").alias("seg")).agg(F.max("c_acctbal").alias("max_bal"))
    pick = (
        cust.join(
            F.broadcast(mx),
            (cust.c_mktsegment == mx.seg) & (cust.c_acctbal == mx.max_bal),
        )
        .groupBy("seg")
        .agg(F.min("c_custkey").alias("pick_key"))
    )
    return cust.join(F.broadcast(pick), cust.c_custkey == pick.pick_key).select(
        "c_mktsegment", "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q13_order_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def q13_order_distribution(spark, sf_dir):
    """TPC-H-Q13 shape: customer distribution by order count — LEFT
    join (zero-order customers count as 0) then a second aggregate
    over the first's tiny output."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, CAST({_REV} AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H-Q15 shape: quarterly revenue 'view' per supplier, then
    the supplier(s) achieving the maximum — the view reused twice
    (aggregate + scalar max) without rescanning the fact table."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_rev().cast("double").alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#11'
      AND l_quantity < (
          SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
          FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q17_small_quantity(spark, sf_dir):
    """TPC-H-Q17 shape: lines below 20%% of their part's average
    quantity — the correlated average becomes a per-part aggregate
    joined back (exact decimal mean for a deterministic threshold)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#11")
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("avg_partkey"))
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem WHERE l_quantity > 0
        GROUP BY l_partkey, l_suppkey
    ), best AS (
        SELECT l_partkey, MIN(unit_cost) AS best_cost
        FROM costs GROUP BY l_partkey
    ), pick AS (
        SELECT c.l_partkey, MIN(c.l_suppkey) AS best_suppkey
        FROM costs c JOIN best b
          ON c.l_partkey = b.l_partkey AND c.unit_cost = b.best_cost
        GROUP BY c.l_partkey
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, b.best_cost
    FROM pick
      JOIN best b ON pick.l_partkey = b.l_partkey
      JOIN part ON p_partkey = pick.l_partkey
      JOIN supplier ON s_suppkey = pick.best_suppkey
    WHERE p_size <= 5
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H-Q2 shape (no partsupp table: observed unit cost from
    lineitem stands in for ps_supplycost): per part, the supplier with
    the minimum unit cost — correlated-min + deterministic argmin
    join-back; part/supplier joins are size-planned (no forced
    broadcast — both scale with SF)."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = costs.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    pick = (
        costs.join(
            best,
            (costs.l_partkey == F.col("b_partkey")) & (costs.unit_cost == F.col("best_cost")),
        )
        .groupBy("l_partkey")
        .agg(F.min("l_suppkey").alias("best_suppkey"), F.min("best_cost").alias("best_cost"))
    )
    part = t(spark, sf_dir, "part").where(F.col("p_size") <= 5)
    supp = t(spark, sf_dir, "supplier")
    return (
        pick.join(part, pick.l_partkey == part.p_partkey)
        .join(supp, pick.best_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "best_cost")
    )


_Q100_SQL = """
    SELECT n_name,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           COUNT(DISTINCT o_custkey) AS active_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_order_value
    FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
"""


@query("q_sql_surface", oracle=_Q100_SQL)
def q_sql_surface(spark, sf_dir):
    """The SQL surface as a first-class entry point: the IDENTICAL
    ANSI SQL text runs on Spark (over registered views) and on the
    DuckDB oracle — joins, year extraction, distinct and exact-decimal
    aggregates, derived averages. One dialect, two engines, one
    answer."""
    from ..io.tables import register_views

    register_views(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(_Q100_SQL)


@query(
    "q20_supplier_share",
    oracle="""
    WITH per_part AS (
        SELECT l_suppkey, 
               CAST(SUM(CASE WHEN p_name LIKE '%widget%'
                             THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS widget_qty,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, widget_qty, total_qty,
           widget_qty / total_qty AS widget_share
    FROM supplier JOIN per_part ON s_suppkey = l_suppkey
    WHERE widget_qty > 0.15 * total_qty
    ORDER BY widget_share DESC, s_suppkey
    LIMIT 15
    """,
)
def q20_supplier_share(spark, sf_dir):
    """TPC-H-Q20 shape: suppliers whose shipped volume concentrates in
    one product family (>15% widgets; 25% matches zero suppliers on this corpus at any SF) — nested conditional aggregate
    feeding a filtered join, the classic HAVING-on-derived-ratio
    plan (one fact shuffle; part and supplier size-planned)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    per_supp = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.when(F.col("p_name").like("%widget%"), dec("l_quantity")).otherwise(F.lit(0))
            )
            .cast("double")
            .alias("widget_qty"),
            F.sum(dec("l_quantity")).cast("double").alias("total_qty"),
        )
        .where(F.col("widget_qty") > 0.15 * F.col("total_qty"))
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.join(supp, per_supp.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            "widget_qty",
            "total_qty",
            (F.col("widget_qty") / F.col("total_qty")).alias("widget_share"),
        )
        .orderBy(F.desc("widget_share"), F.asc("s_suppkey"))
        .limit(15)
    )


@query(
    "q_exists_combo",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (
            SELECT 1 FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                                 JOIN part ON l_partkey = p_partkey
            WHERE o_custkey = c_custkey AND p_name LIKE '%widget%')
      AND NOT EXISTS (
            SELECT 1 FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                                 JOIN part ON l_partkey = p_partkey
            WHERE o_custkey = c_custkey AND p_type = 'PROMO')
    GROUP BY c_mktsegment
    """,
)
def q_exists_combo(spark, sf_dir):
    """TPC-H-Q21 shape (chained quantifiers): customers who bought
    widgets but NEVER promo-class parts — a semi join and an anti join
    over the same buyer->part derivation, which is computed once and
    reused for both quantifiers."""
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_type")
    buyer_parts = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .select("o_custkey", "p_name", "p_type")
    )
    widget_buyers = buyer_parts.where(F.col("p_name").like("%widget%")).select("o_custkey").distinct()
    promo_buyers = buyer_parts.where(F.col("p_type") == "PROMO").select("o_custkey").distinct()
    cust = t(spark, sf_dir, "customer")
    return (
        cust.join(widget_buyers, cust.c_custkey == widget_buyers.o_custkey, "left_semi")
        .join(promo_buyers, cust.c_custkey == promo_buyers.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH v AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS part_value
        FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM v
    WHERE part_value > 2.0 * (SELECT SUM(part_value) / COUNT(*) FROM v)
    ORDER BY part_value DESC, l_partkey
    LIMIT 25
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H-Q11 shape (no partsupp table in this corpus — shipped
    value stands in for stock value): per-part value held by a
    nation group, kept only where it exceeds a scalar-subquery
    threshold. The official query's fraction scales with SF
    (0.0001/SF); a fixed literal would silently empty out at other
    scale factors, so the threshold is 2x the average part value —
    scale-free, same aggregate + scalar-subquery-HAVING plan."""
    li = t(spark, sf_dir, "lineitem")
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")).where(
                F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    v = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount", "decimal(8,2)")))
            .cast("double")
            .alias("part_value")
        )
    )
    thr = v.agg(
        (F.sum("part_value") / F.count(F.lit(1))).alias("avg_value")
    )
    return (
        v.crossJoin(F.broadcast(thr))
        .where(F.col("part_value") > 2.0 * F.col("avg_value"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
        .limit(25)
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM li a
      JOIN supplier ON a.l_suppkey = s_suppkey
    WHERE a.l_shipdate > a.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM li b
                  WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li c
                      WHERE c.l_orderkey = a.l_orderkey AND c.l_suppkey <> a.l_suppkey
                        AND c.l_shipdate > c.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H-Q21 shape — the hardest classic plan: suppliers who were
    the SOLE late shipper on a multi-supplier order (late = shipped
    >90 days after the order date; the corpus has no commit/receipt
    dates). Correlated EXISTS -> left-semi on (same order, other
    supplier); correlated NOT EXISTS -> left-anti against the other-
    supplier LATE lines; then per-supplier wait counts, top-k with
    tie-break. Both probes are equi-joins on l_orderkey — at scale
    one shuffle each over the order key, no correlated re-execution."""
    li = (
        t(spark, sf_dir, "lineitem")
        .join(
            t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    )
    late = li.where(F.expr("l_shipdate > o_orderdate + INTERVAL 90 DAY"))
    a = late.alias("a")
    others = li.select(
        F.col("l_orderkey").alias("b_orderkey"), F.col("l_suppkey").alias("b_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("c_orderkey"), F.col("l_suppkey").alias("c_suppkey")
    )
    sole_late = (
        a.join(
            others,
            (F.col("a.l_orderkey") == F.col("b_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b_suppkey")),
            "left_semi",
        ).join(
            late_others,
            (F.col("a.l_orderkey") == F.col("c_orderkey"))
            & (F.col("a.l_suppkey") != F.col("c_suppkey")),
            "left_anti",
        )
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(supp, sole_late["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


_LATERAL_SQL = """
SELECT n.n_name, t.c_name, CAST(t.c_acctbal AS DOUBLE) AS c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name
         LIMIT 2) t
"""


@query("q_lateral_topk", oracle=_LATERAL_SQL)
def q_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery (per-nation top-2 customers by
    account balance) — the remaining modern-ANSI join form the SQL
    surface hadn't exercised; like q_sql_surface, the IDENTICAL SQL
    text runs on both engines. Catalyst decorrelates the lateral
    LIMIT into a partitioned window top-k (no per-row re-execution),
    so the plan is the same rank-filter shape as q_topk_customers —
    pinned by the catalog-wide no-cartesian guard. Decimal balances
    cast to DOUBLE in-query (correctly rounded from the same decimal
    on both engines); ties broken by customer name."""
    from ..io.tables import register_views

    register_views(spark, sf_dir, "nation", "customer")
    return spark.sql(_LATERAL_SQL)


_RECURSIVE_SQL = """
WITH RECURSIVE edges AS (
    SELECT n_nationkey AS src, (n_nationkey * 2 + 1) % 25 AS dst FROM nation
    UNION ALL
    SELECT n_nationkey AS src, (n_nationkey * 3 + 7) % 25 AS dst FROM nation
),
walk(node, depth) AS (
    SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
    UNION ALL
    SELECT e.dst AS node, w.depth + 1 AS depth
    FROM walk w JOIN edges e ON e.src = w.node
    WHERE w.depth < 6
)
SELECT node,
       CAST(MIN(depth) AS BIGINT) AS min_hops,
       COUNT(*) AS n_paths
FROM walk
GROUP BY node
ORDER BY node
"""


@query("q_recursive_cte", oracle=_RECURSIVE_SQL)
def q_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE transitive graph walk (Spark 4's recursive CTE,
    SPARK-24497) — breadth-bounded reachability over a deterministic
    synthetic edge list derived from ``nation`` (two affine successor
    functions mod 25), counting for every reachable node its minimum
    hop count and the number of distinct <=6-hop walks from node 0.
    The IDENTICAL SQL text runs on Spark and on the DuckDB oracle
    (same UNION ALL + depth-guard recursion semantics on both).

    The reference has no recursive queries (its MySQL 5.7-era
    pagination predates WITH RECURSIVE everywhere in its stack,
    cf. bec-aws-bq/rds-to-bq.py chunked scans); this closes the last
    modern-ANSI construct missing from the engine's SQL surface after
    LATERAL (q_lateral_topk) and VARIANT (q_variant_extract).

    Scale: each recursion level is one equi-join of the frontier
    against the (dimension-sized, broadcastable) edge list — the same
    per-round shape as ``operators/cluster.py`` min-label propagation;
    the depth guard bounds the level count, so no unbounded plan
    growth. Integer-only arithmetic -> hash-exact across engines."""
    from ..io.tables import register_views

    register_views(spark, sf_dir, "nation")
    return spark.sql(_RECURSIVE_SQL)


@query(
    "q_skyline_parts",
    oracle="""
    WITH pairs AS (
        SELECT CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS price_cents,
               p_size, COUNT(*) AS n_at_pair
        FROM part GROUP BY 1, 2
    ),
    best AS (
        SELECT price_cents, MIN(p_size) AS min_size,
               CAST(SUM(CASE WHEN p_size = sz THEN n_at_pair ELSE 0 END)
                    AS BIGINT) AS n_parts
        FROM (SELECT p.*, MIN(p_size) OVER (PARTITION BY price_cents) AS sz
              FROM pairs p)
        GROUP BY price_cents
    ),
    runmin AS (
        SELECT price_cents, min_size, n_parts,
               MIN(min_size) OVER (ORDER BY price_cents
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) AS prev_min
        FROM best
    )
    SELECT price_cents, CAST(min_size AS BIGINT) AS min_size, n_parts
    FROM runmin
    WHERE prev_min IS NULL OR min_size < prev_min
    """,
)
def q_skyline_parts(spark, sf_dir):
    """2-D skyline (Pareto frontier; Borzsony/Kossmann/Stocker, ICDE
    2001): the parts not dominated on (minimize price, minimize
    size). The naive dominance test is an all-pairs self-join — the
    scale formulation is algebraic instead: collapse to one row per
    price (with its min size and the count of parts AT that optimal
    pair), then a price-ordered RUNNING MIN; a point is on the
    frontier iff its min size strictly beats every cheaper point's.
    The only ordered pass runs over the price-DISTINCT aggregate (the
    dimension's value domain, not the fact rows). Price keys are
    exact integer cents; everything is integer."""
    from pyspark.sql import Window as W

    pairs = (
        t(spark, sf_dir, "part")
        .groupBy(
            (dec("p_retailprice") * 100).cast("long").alias("price_cents"),
            "p_size",
        )
        .agg(F.count(F.lit(1)).alias("n_at_pair"))
    )
    wp = W.partitionBy("price_cents")
    best = (
        pairs.withColumn("sz", F.min("p_size").over(wp))
        .groupBy("price_cents")
        .agg(
            F.min("p_size").alias("min_size"),
            F.sum(
                F.when(F.col("p_size") == F.col("sz"), F.col("n_at_pair")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_parts"),
        )
    )
    wr = W.orderBy("price_cents").rowsBetween(W.unboundedPreceding, -1)
    runmin = best.withColumn("prev_min", F.min("min_size").over(wr))
    return runmin.where(
        F.col("prev_min").isNull() | (F.col("min_size") < F.col("prev_min"))
    ).select("price_cents", F.col("min_size").cast("long").alias("min_size"), "n_parts")


@query(
    "q_rfm_segments",
    oracle="""
    WITH now_ts AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS now_d FROM orders),
    cust AS (
        SELECT o_custkey,
               date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                         (SELECT now_d FROM now_ts)) AS r_days,
               COUNT(*) AS f_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                   AS m_cents
        FROM orders GROUP BY o_custkey
    ),
    tot AS (
        SELECT COUNT(*) AS n_cust,
               CAST(SUM(r_days) AS BIGINT) AS sum_r,
               CAST(SUM(f_orders) AS BIGINT) AS sum_f,
               CAST(SUM(m_cents) AS DECIMAL(38,0)) AS sum_m
        FROM cust
    ),
    seg AS (
        SELECT CAST(c.r_days * t.n_cust < t.sum_r AS INT) AS recent,
               CAST(c.f_orders * t.n_cust >= t.sum_f AS INT) AS frequent,
               CAST(CAST(c.m_cents AS DECIMAL(38,0)) * t.n_cust >= t.sum_m
                    AS INT) AS high_value,
               c.m_cents
        FROM cust c, tot t
    )
    SELECT recent, frequent, high_value,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(m_cents AS DECIMAL(38,0))) AS DOUBLE)
               / COUNT(*) / 100 AS avg_spend
    FROM seg GROUP BY 1, 2, 3
    """,
)
def q_rfm_segments(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary — the classic
    customer-value decomposition): each customer flagged above/below
    the MEAN on all three axes, 8 segments out with size and average
    spend. Every split is an exact integer cross-multiplication
    (x * n_cust vs sum_x) — the mean is never materialized as a
    float, so segment membership is bit-identical at any scale; the
    only double is the final avg_spend display division.

    Scale: one customer-keyed aggregation of the fact table, a 1-row
    totals broadcast, an 8-key regroup. Recency anchor = max order
    date (data-derived, no wall clock — deterministic replays)."""
    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        (dec("o_totalprice") * 100).cast("long").alias("cents"),
    )
    now_d = o.agg(F.max("d").alias("now_d"))
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("d").alias("last_d"),
            F.count(F.lit(1)).alias("f_orders"),
            F.sum("cents").alias("m_cents"),
        )
        .crossJoin(F.broadcast(now_d))
        .select(
            F.datediff("now_d", "last_d").alias("r_days"),
            "f_orders",
            "m_cents",
        )
    )
    tot = cust.agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("r_days").cast("long").alias("sum_r"),
        F.sum("f_orders").cast("long").alias("sum_f"),
        F.sum(F.col("m_cents").cast("decimal(38,0)")).alias("sum_m"),
    )
    seg = cust.crossJoin(F.broadcast(tot)).select(
        (F.col("r_days") * F.col("n_cust") < F.col("sum_r"))
        .cast("int")
        .alias("recent"),
        (F.col("f_orders") * F.col("n_cust") >= F.col("sum_f"))
        .cast("int")
        .alias("frequent"),
        (
            F.col("m_cents").cast("decimal(38,0)") * F.col("n_cust")
            >= F.col("sum_m")
        )
        .cast("int")
        .alias("high_value"),
        "m_cents",
    )
    return seg.groupBy("recent", "frequent", "high_value").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (
            F.sum(F.col("m_cents").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / 100
        ).alias("avg_spend"),
    )


@query(
    "q_abc_analysis",
    oracle="""
    WITH pr AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                   AS rev_cents
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(CAST(rev_cents AS DECIMAL(38,0))) AS DECIMAL(38,0))
                AS total FROM pr),
    ranked AS (
        SELECT l_partkey, rev_cents,
               CAST(SUM(CAST(rev_cents AS DECIMAL(38,0)))
                    OVER (ORDER BY rev_cents DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,0)) AS cum
        FROM pr
    ),
    cls AS (
        SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A'
                    WHEN cum * 20 <= total * 19 THEN 'B'
                    ELSE 'C' END AS abc_class,
               rev_cents
        FROM ranked, tot
    )
    SELECT abc_class, COUNT(*) AS n_parts,
           CAST(SUM(CAST(rev_cents AS DECIMAL(38,0))) AS DOUBLE) / 100
               AS class_revenue
    FROM cls GROUP BY abc_class
    """,
)
def q_abc_analysis(spark, sf_dir):
    """ABC / Pareto 80-95 analysis: parts ranked by revenue, class A
    = the head covering 80% of cumulative revenue, B to 95%, C the
    tail — the inventory-prioritization classic. Class boundaries are
    exact integer cross-multiplications on the DECIMAL(38,0)
    cumulative (cum*5 <= total*4), never a float percentage, so the
    A/B cut cannot drift between engines.

    Scale: the fact table collapses to per-part revenue FIRST (one
    shuffle); the ordered cumulative then runs through
    ``operators/rangebucket.ordered_running`` — approx-percentile
    range buckets that respect the total order, per-bucket PARTITIONED
    windows, broadcast bucket-prefix offsets — so NO Exchange
    SinglePartition feeds a Window (pinned in test_plans) even though
    the part dimension grows linearly with the fact table. The values
    are bit-identical to the global-window form, which is exactly what
    the uncapped oracle replays."""
    from ..operators.rangebucket import ordered_running

    pr = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg((F.sum(dec("l_extendedprice") * 100)).cast("long").alias("rev_cents"))
    )
    tot = pr.agg(
        F.sum(F.col("rev_cents").cast("decimal(38,0)")).alias("total")
    )
    ranked = ordered_running(
        pr, "rev_cents", "l_partkey", descending=True, cum_col="cum"
    )
    cls = ranked.crossJoin(F.broadcast(tot)).select(
        F.when(F.col("cum") * 5 <= F.col("total") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("total") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_cents",
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum(F.col("rev_cents").cast("decimal(38,0)")).cast("double") / 100).alias(
            "class_revenue"
        ),
    )


@query(
    "q_gini_concentration",
    oracle="""
    WITH cr AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i
        FROM cr
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
               CAST(SUM(CAST(i AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0))
                   AS six
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           ROUND(CAST(2 * six - (n + 1) * sx AS DOUBLE)
                 / CAST(n * sx AS DOUBLE), 9) AS gini_r9
    FROM s
    """,
)
def q_gini_concentration(spark, sf_dir):
    """Gini coefficient of revenue concentration across customers
    (the Lorenz-curve summary behind every 'top X% of customers drive
    Y% of revenue' claim; completes the concentration pair with
    q_abc_analysis): G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))
    over ascending-sorted customer revenues. Every sum is an exact
    DECIMAL(38,0) of integer cents; the single double division is
    rounded at 9 decimals because the numerator's unscaled value can
    exceed 2^53 where DECIMAL->DOUBLE conversion is one-ulp
    engine-divergent (the documented gotcha) — rounding absorbs
    exactly that.

    Scale: fact collapses to per-customer revenue first; the global
    rank then comes from ``operators/rangebucket.ordered_running``
    (range buckets + per-bucket partitioned ROW_NUMBER + broadcast
    count offsets), so no single task ever ranks the whole customer
    dimension (~10^9 customers behind a 100 TB order log). Values are
    bit-identical to the single-partition window the oracle replays;
    the no-SinglePartition-Window property is pinned in test_plans."""
    from ..operators.rangebucket import ordered_running

    cr = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg((F.sum(dec("o_totalprice") * 100)).cast("long").alias("cents"))
    )
    ranked = ordered_running(
        cr, "cents", "o_custkey", descending=False, index_col="i"
    ).select("cents", "i")
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias("six"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_customers"),
        F.round(
            (F.lit(2) * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast(
                "double"
            )
            / (F.col("n") * F.col("sx")).cast("double"),
            9,
        ).alias("gini_r9"),
    )
