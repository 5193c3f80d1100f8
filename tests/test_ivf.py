"""IVF ANN (operators/ivf.py): exactness anchor + recall + determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.io.tables import load_table
from s3_rds_bq_airflow_spark.operators.ivf import ivf_assign, ivf_fit, ivf_topk
from s3_rds_bq_airflow_spark.operators.similarity import brute_force_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def fitted(emb):
    centroids = ivf_fit(emb, n_centroids=8, n_iters=2)
    return centroids, ivf_assign(emb, centroids)


def test_fit_produces_full_partition(emb, fitted):
    centroids, assigned = fitted
    assert centroids.count() == 8
    # Every vector lands in exactly one cell.
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()


def test_full_probe_equals_brute_force(emb, fitted):
    centroids, assigned = fitted
    qv = emb.where(F.col("vec_id") == 0)
    ann = ivf_topk(assigned, centroids, qv, k=10, n_probe=8)
    exact = brute_force_topk(emb, qv, 10, exact=False)
    assert [r["vec_id"] for r in ann.collect()] == [
        r["vec_id"] for r in exact.collect()
    ]


def test_partial_probe_recall(emb, fitted):
    centroids, assigned = fitted
    qv = emb.where(F.col("vec_id") == 0)
    ann_ids = {r["vec_id"] for r in ivf_topk(assigned, centroids, qv, k=10, n_probe=3).collect()}
    exact_ids = {r["vec_id"] for r in brute_force_topk(emb, qv, 10, exact=False).collect()}
    # The query's own cell is always probed, so recall can't collapse.
    assert len(ann_ids & exact_ids) >= 5


def test_deterministic_fit(emb):
    c1 = sorted(ivf_fit(emb, n_centroids=8, n_iters=2).collect())
    c2 = sorted(ivf_fit(emb, n_centroids=8, n_iters=2).collect())
    assert c1 == c2


def test_dot_exact_survives_int64_overflow(spark):
    """Centroid norm2 grows quadratically with cell size; the
    DECIMAL(38,0) accumulator must stay exact where a long would
    wrap (components ~3e9 -> dot 3.6e19 > int64 max)."""
    from pyspark.sql import functions as F

    from s3_rds_bq_airflow_spark.operators.ivf import _dot_exact

    comp = 3_000_000_000
    df = spark.createDataFrame([([comp] * 4,)], "v array<long>")
    got = df.select(_dot_exact("v", "v").cast("string").alias("d")).first().d
    assert int(got) == 4 * comp * comp
