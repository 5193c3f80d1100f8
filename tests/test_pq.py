"""Product quantization (operators/pq.py): semantic invariants and
scale-posture plan pins. Cross-engine value equality is covered by
tools/compare.py and the driver oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators.pq import pq_adc_topk, pq_encode, pq_fit
from s3_rds_bq_airflow_spark.queries import all_queries

QUERIES = all_queries()

M, K = 4, 8


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def fitted(emb):
    cb = pq_fit(emb, n_subspaces=M, n_codes=K, n_iters=1, exact=True)
    enc = pq_encode(emb, cb, n_subspaces=M, exact=True).persist()
    return cb, enc


def test_codebook_shape(fitted):
    cb, _ = fitted
    rows = cb.collect()
    assert len(rows) == M * K
    assert {(r["m"], r["cid"]) for r in rows} == {
        (m, c) for m in range(M) for c in range(K)
    }
    for r in rows:
        assert len(r["cvec"]) == 64 // M


def test_every_vector_fully_encoded(emb, fitted):
    _, enc = fitted
    n = emb.count()
    counts = enc.groupBy("vec_id").count().collect()
    assert len(counts) == n
    assert all(r["count"] == M for r in counts)
    codes = enc.select("code").distinct().collect()
    assert all(0 <= r["code"] < K for r in codes)


def test_identical_vector_gets_identical_codes(emb, fitted):
    """The compression contract: an exact copy of a vector must encode
    to the same code tuple (deterministic assignment, cid ties
    broken)."""
    cb, _ = fitted
    copy = emb.where(F.col("vec_id") == 0).select(
        F.lit(999_999).cast("long").alias("vec_id"), "embedding"
    )
    both = pq_encode(
        emb.where(F.col("vec_id") == 0).unionByName(copy), cb,
        n_subspaces=M, exact=True,
    ).collect()
    by_id = {}
    for r in both:
        by_id.setdefault(r["vec_id"], {})[r["m"]] = r["code"]
    assert by_id[0] == by_id[999_999]


def test_adc_scores_bounded_by_subspace_cosines(emb, fitted):
    """Each ADC term is a subspace cosine in [-1, 1] (or the -2
    degenerate key), so the total is <= M."""
    cb, enc = fitted
    qv = emb.where(F.col("vec_id") == 0)
    rows = pq_adc_topk(enc, cb, qv, k=10, n_subspaces=M, exact=True).collect()
    assert len(rows) == 10
    scores = [r["adc_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s <= M + 1e-9 for s in scores)


def test_adc_self_query_ranks_own_codes_top(emb, fitted):
    """The query's own row scores the maximum possible for its code
    tuple: no other vector can out-rank it except by sharing codes
    with higher subspace cosines — so vec 0 must appear in the top-k
    for k >= the size of its code-sharing class. Pin the weaker exact
    invariant: vec 0's score equals the max score."""
    cb, enc = fitted
    qv = emb.where(F.col("vec_id") == 0)
    rows = pq_adc_topk(enc, cb, qv, k=500, n_subspaces=M, exact=True).collect()
    by_id = {r["vec_id"]: r["adc_score"] for r in rows}
    assert 0 in by_id
    # vec 0's own subspace cosines to its assigned centroids are the
    # argmax per subspace, hence its sum is the global max.
    assert by_id[0] == pytest.approx(max(by_id.values()))


def test_fast_gear_same_plan_shape_no_cartesian(spark, emb, fitted):
    from s3_rds_bq_airflow_spark.plans.inspect import plan_nodes

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cb = pq_fit(emb, n_subspaces=M, n_codes=K, n_iters=1, exact=False)
        enc = pq_encode(emb, cb, n_subspaces=M, exact=False)
        out = pq_adc_topk(
            enc, cb, emb.where(F.col("vec_id") == 0), k=10,
            n_subspaces=M, exact=False,
        )
        nodes = plan_nodes(out)
        assert not any("CartesianProduct" in n for n in nodes), nodes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
