"""Privacy / data-governance gates and record linkage.

A training-data pipeline that ingests user-adjacent tables (the
reference moves customer data between RDS and BigQuery wholesale —
``bec-aws-bq/rds-to-bq.py`` copies every row of every table) needs
release gates the reference never had: k-anonymity / l-diversity
audits over quasi-identifier groups, and blocked record linkage to
find likely-duplicate entities before they leak into a corpus twice.

Scale posture: every query here is a hash-partitioned groupBy or a
block-bounded self-join over the *distinct-record* table (dedupe
first, pair second — the candidate space is bounded by the attribute
vocabulary, never by the row count), so the plans survive a 100x
scale-up with one shuffle each and no all-pairs stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from ._util import MONEY, dec, t

# Quasi-identifier bucketing: account balance in cents, shifted
# non-negative (min TPC-H acctbal is -999.99), bucketed 2500-wide.
_BAL_SHIFT = 100_000
_BAL_WIDTH = 250_000


@query(
    "q_k_anonymity",
    oracle=f"""
    WITH b AS (
        SELECT c_nationkey, c_mktsegment,
               CAST((CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                     + {_BAL_SHIFT}) // {_BAL_WIDTH} AS INT) AS bal_bucket
        FROM customer
    )
    SELECT c_nationkey, c_mktsegment, bal_bucket,
           COUNT(*) AS group_n,
           CAST(COUNT(*) >= 5 AS INT) AS meets_k
    FROM b GROUP BY 1, 2, 3
    """,
)
def q_k_anonymity(spark, sf_dir):
    """k-anonymity audit (Sweeney 2002): group rows by the
    quasi-identifier tuple (nation, market segment, balance bucket)
    and flag groups smaller than k=5 — the rows a release would have
    to suppress or generalize. Balance bucketing runs in exact integer
    cents (decimal -> cents -> shifted truncating DIV), so the bucket
    boundary is bit-identical across engines and partitionings; the
    whole audit is ONE hash aggregation, no joins.

    Reference parity: the reference copies `customer` wholesale with
    no privacy gate (`bec-aws-bq/rds-to-bq.py`); this is the gate a
    governed pipeline would insert before the copy."""
    c = t(spark, sf_dir, "customer")
    cents = (dec("c_acctbal") * 100).cast("long")
    b = c.select(
        "c_nationkey",
        "c_mktsegment",
        cents.alias("_cents"),
    ).select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(f"CAST((_cents + {_BAL_SHIFT}) DIV {_BAL_WIDTH} AS INT)").alias(
            "bal_bucket"
        ),
    )
    g = b.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).alias("group_n")
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "bal_bucket",
        "group_n",
        (F.col("group_n") >= 5).cast("int").alias("meets_k"),
    )


@query(
    "q_l_diversity",
    oracle="""
    WITH b AS (
        SELECT c_nationkey, c_mktsegment,
               CASE WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 0 THEN 'debt'
                    WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 5000 THEN 'mid'
                    ELSE 'high' END AS sensitive_class
        FROM customer
    )
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS group_n,
           COUNT(DISTINCT sensitive_class) AS l_distinct,
           CAST(COUNT(DISTINCT sensitive_class) >= 2 AS INT) AS meets_l
    FROM b GROUP BY 1, 2
    """,
)
def q_l_diversity(spark, sf_dir):
    """l-diversity audit (Machanavajjhala et al., ICDE 2006): within
    each quasi-identifier group (nation, segment), count DISTINCT
    values of the sensitive attribute (balance class debt/mid/high) —
    a k-anonymous group whose members all share one sensitive value
    still leaks it; l >= 2 is the floor. Class boundaries compare in
    exact decimal. One aggregation with a distinct-count — Spark
    plans it as the standard two-phase partial/final expand, no
    joins, scale-indifferent."""
    c = t(spark, sf_dir, "customer")
    bal = dec("c_acctbal")
    cls = (
        F.when(bal < 0, "debt").when(bal < 5000, "mid").otherwise("high")
    ).alias("sensitive_class")
    g = c.select("c_nationkey", "c_mktsegment", cls).groupBy(
        "c_nationkey", "c_mktsegment"
    ).agg(
        F.count(F.lit(1)).alias("group_n"),
        F.countDistinct("sensitive_class").alias("l_distinct"),
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "group_n",
        "l_distinct",
        (F.col("l_distinct") >= 2).cast("int").alias("meets_l"),
    )


@query(
    "q_entity_resolution",
    oracle="""
    WITH recs AS (
        SELECT p_name, p_brand, p_type, p_size, COUNT(*) AS n,
               string_split(p_name, ' ')[1] AS adj,
               string_split(p_name, ' ')[2] AS noun,
               p_name || '|' || p_type AS rec_key
        FROM part GROUP BY 1, 2, 3, 4
    )
    SELECT a.noun AS block_noun, a.p_size AS p_size, a.p_brand AS p_brand,
           a.p_name AS name_a, b.p_name AS name_b,
           a.p_type AS type_a, b.p_type AS type_b,
           levenshtein(a.adj, b.adj) AS lev_adj,
           CAST(a.p_type = b.p_type AS INT) AS same_type,
           CAST(a.n * b.n AS BIGINT) AS pair_weight
    FROM recs a JOIN recs b
      ON a.noun = b.noun AND a.p_brand = b.p_brand
     AND a.rec_key < b.rec_key
    WHERE levenshtein(a.adj, b.adj) <= 4
      AND abs(a.p_size - b.p_size) <= 1
    """,
)
def q_entity_resolution(spark, sf_dir):
    """Blocked record linkage over part listings: find likely-duplicate
    entities (same noun/brand block, size within 1, adjective within
    edit distance 4 — e.g. 'cold widget' vs 'old widget') with their
    pair weight (product of listing counts).

    The scale move is DEDUPE-FIRST, PAIR-SECOND: rows collapse to
    distinct (name, brand, type, size) records with counts BEFORE any
    pairing, so the self-join input is bounded by the attribute
    vocabulary — at 100 TB the record table is still thousands of
    rows while the raw table is billions; the raw row count only
    feeds the count aggregation (one shuffle). Candidate pairs are a
    block equi-join on (noun, brand) — never all-pairs — with the
    edit-distance and size-proximity filters applied inside the
    block. Levenshtein is an exact integer both engines share."""
    p = t(spark, sf_dir, "part")
    recs = (
        p.groupBy("p_name", "p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            "n",
            F.element_at(F.split("p_name", " "), 1).alias("adj"),
            F.element_at(F.split("p_name", " "), 2).alias("noun"),
            F.concat_ws("|", "p_name", "p_type").alias("rec_key"),
        )
    )
    a, b = recs.alias("a"), recs.alias("b")
    lev = F.levenshtein(F.col("a.adj"), F.col("b.adj"))
    return (
        a.join(
            b,
            on=[
                F.col("a.noun") == F.col("b.noun"),
                F.col("a.p_brand") == F.col("b.p_brand"),
                F.col("a.rec_key") < F.col("b.rec_key"),
            ],
        )
        .where(
            (lev <= 4)
            & (F.abs(F.col("a.p_size") - F.col("b.p_size")) <= 1)
        )
        .select(
            F.col("a.noun").alias("block_noun"),
            F.col("a.p_size").alias("p_size"),
            F.col("a.p_brand").alias("p_brand"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("a.p_type").alias("type_a"),
            F.col("b.p_type").alias("type_b"),
            lev.alias("lev_adj"),
            (F.col("a.p_type") == F.col("b.p_type")).cast("int").alias("same_type"),
            (F.col("a.n") * F.col("b.n")).cast("bigint").alias("pair_weight"),
        )
    )
