"""curriculum_buckets: exact (NTILE) vs range-bucketed (100 TB) gears.

The exact gear is oracle-verified via q_curriculum_buckets
(tests/test_oracle_parity.py); here we pin the throughput gear's
plan shape (no per-split sort) and its agreement with the exact
bins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators.curriculum import curriculum_buckets
from s3_rds_bq_airflow_spark.plans.inspect import (
    broadcast_join_count,
    plan_nodes,
    shuffle_count,
)
from s3_rds_bq_airflow_spark.queries._util import t


@pytest.fixture(scope="module")
def scored(spark, sf_dir):
    raw_n = F.length(F.col("text"))
    n = F.greatest(raw_n, F.lit(1))
    n_alpha = raw_n - F.length(F.regexp_replace(F.col("text"), "[a-zA-Z]", ""))
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1", "2"),
        "eval",
    ).otherwise("train")
    return t(spark, sf_dir, "documents").select(
        "doc_id", split.alias("split"), (n_alpha.cast("double") / n).alias("_q")
    )


def test_fast_plan_has_no_sort_or_window(scored):
    """The 100 TB gear must not contain a per-split total order: no
    Window, no Sort anywhere in the plan; the only exchange is the
    config-sized boundary aggregate, and the join-back broadcasts."""
    fast = curriculum_buckets(
        scored, quality_col="_q", split_col="split", id_col="doc_id", n_bins=5
    )
    nodes = plan_nodes(fast)
    assert not any(n.startswith(("Window", "Sort")) for n in nodes), nodes
    assert shuffle_count(fast) <= 1
    assert broadcast_join_count(fast) >= 1


def test_exact_plan_is_the_sort_gear(scored):
    exact = curriculum_buckets(
        scored, quality_col="_q", split_col="split", id_col="doc_id", n_bins=5, exact=True
    )
    assert any(n.startswith("Window") for n in plan_nodes(exact))


def test_fast_bins_track_exact_bins(scored):
    """Range bucketing is approximate only at bin EDGES: every row's
    fast bin is within 1 of its NTILE bin and the bulk agree."""
    kw = dict(quality_col="_q", split_col="split", id_col="doc_id", n_bins=5)
    fast = curriculum_buckets(scored, **kw).select(
        "doc_id", F.col("difficulty_bin").alias("fast_bin")
    )
    exact = curriculum_buckets(scored, exact=True, **kw).select(
        "doc_id", F.col("difficulty_bin").alias("exact_bin")
    )
    pdf = fast.join(exact, "doc_id").toPandas()
    assert len(pdf) > 0
    assert (pdf.fast_bin - pdf.exact_bin).abs().max() <= 1
    assert (pdf.fast_bin == pdf.exact_bin).mean() >= 0.9
    assert pdf.fast_bin.between(1, 5).all()


def test_single_bin_and_validation(scored):
    one = curriculum_buckets(
        scored, quality_col="_q", split_col="split", id_col="doc_id", n_bins=1
    )
    assert one.select(F.min("difficulty_bin"), F.max("difficulty_bin")).first() == (1, 1)
    with pytest.raises(ValueError):
        curriculum_buckets(
            scored, quality_col="_q", split_col="split", id_col="doc_id", n_bins=0
        )


def test_null_quality_lands_in_bin_one(spark):
    df = spark.createDataFrame(
        [(1, "a", 0.1), (2, "a", 0.9), (3, "a", None), (4, "a", 0.5)],
        "id bigint, grp string, q double",
    )
    out = curriculum_buckets(
        df, quality_col="q", split_col="grp", id_col="id", n_bins=2
    )
    rows = {r.id: r.difficulty_bin for r in out.collect()}
    assert rows[3] == 1  # NULL comparisons contribute nothing -> bin 1
    assert rows[1] == 1 and rows[2] == 2
