"""Prefix-filtered set-similarity join (operators/setsim.py).

The load-bearing property is COMPLETENESS: the prefix filter must be
a pure optimization — the join output must equal a brute-force
all-pairs Jaccard scan exactly, pairs and counts and quotients.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators.dedup import token_shingles
from s3_rds_bq_airflow_spark.operators.setsim import (
    canonical_prefixes,
    setsim_join,
)


def _brute_force(elems, tau_num, tau_den):
    """All-pairs reference: every doc pair, exact intersection."""
    sizes = elems.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    a = elems.select(F.col("_id").alias("id_a"), "_h")
    b = elems.select(F.col("_id").alias("id_b"), "_h")
    inter = (
        a.join(b, "_h")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .where(tau_den * F.col("n_inter") >= tau_num * F.col("n_union"))
        .select("id_a", "id_b", "n_inter", "n_union")
    )


def test_setsim_equals_brute_force(spark, sf_dir):
    from s3_rds_bq_airflow_spark.io.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = token_shingles(docs, "text", "doc_id", k=5, exact=False)
    for tau_num, tau_den in ((1, 2), (1, 3), (4, 5)):
        got = {
            (r.id_a, r.id_b, r.n_inter, r.n_union)
            for r in setsim_join(sh, tau_num, tau_den).collect()
        }
        want = {
            (r.id_a, r.id_b, r.n_inter, r.n_union)
            for r in _brute_force(sh, tau_num, tau_den).collect()
        }
        assert got == want, f"tau={tau_num}/{tau_den}"
        if tau_num == 1 and tau_den == 2:
            assert got, "tau=1/2 must match the planted near-dups (non-empty)"


def test_prefix_shrinks_with_threshold(spark, sf_dir):
    """Higher tau -> shorter prefixes -> fewer join rows. At tau=1
    the prefix is a single element per set."""
    from s3_rds_bq_airflow_spark.io.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = token_shingles(docs, "text", "doc_id", k=5, exact=False)
    n_half = canonical_prefixes(sh, 1, 2).count()
    n_90 = canonical_prefixes(sh, 9, 10).count()
    n_all = canonical_prefixes(sh, 1, 1).count()
    n_docs = sh.select("_id").distinct().count()
    assert n_half > n_90 > n_all
    assert n_all == n_docs  # exactly one prefix element per set at tau=1


def test_setsim_plan_has_no_cartesian(spark, sf_dir):
    from s3_rds_bq_airflow_spark.io.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = token_shingles(docs, "text", "doc_id", k=5, exact=False)
    plan = setsim_join(sh)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
