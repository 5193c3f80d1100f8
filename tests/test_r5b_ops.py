"""Semantic invariants for the round-5b query tier (beyond the
oracle-parity gate): recursive CTE, skip-gram windows, quantile
normalization, MAD outliers, JL projection."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.queries import all_queries

Q = all_queries()


def test_recursive_walk_invariants(spark, sf_dir):
    rows = {r.node: r for r in Q["q_recursive_cte"](spark, sf_dir).collect()}
    assert rows[0].min_hops == 0  # the start node is reachable at depth 0
    assert all(0 <= r.min_hops <= 6 for r in rows.values())
    # successor closure: every node's two successors reachable in <=6
    # hops must themselves appear if their min depth would be <= 6
    for node, r in rows.items():
        if r.min_hops < 6:
            for succ in ((node * 2 + 1) % 25, (node * 3 + 7) % 25):
                assert succ in rows, f"{succ} missing (succ of {node})"


def test_skipgram_window_superset_of_bigrams(spark, sf_dir):
    """Every adjacent pair countable by q_collocations co-occurs
    within the window too: skip-gram pair count >= bigram count for
    the same unordered pair."""
    sg = {
        (r.x, r.y): r.c_xy
        for r in Q["q_skipgram_cooccur"](spark, sf_dir).collect()
    }
    assert sg, "non-empty"
    bg = {}
    for r in Q["q_collocations"](spark, sf_dir).collect():
        k = tuple(sorted((r.a, r.b)))
        bg[k] = bg.get(k, 0) + r.c_ab
    for k, c in bg.items():
        if k in sg:
            assert sg[k] >= c


def test_quantile_normalize_rank_bounds(spark, sf_dir):
    df = Q["q_quantile_normalize"](spark, sf_dir)
    n = df.count()
    rows = df.collect()
    # 64 dims, 0-based ranks in [0, n-1]; with RANK() ties share the
    # lower rank, so per-dim ranks sum to <= 64 * n*(n-1)/2
    assert all(0 <= r.min_rank0 <= r.max_rank0 <= n - 1 for r in rows)
    assert all(0.0 <= r.avg_pct_rank <= 1.0 for r in rows)
    total = sum(r.sum_rank0 for r in rows)
    assert total <= 64 * n * (n - 1) // 2


def test_mad_outliers_partition_of_events(spark, sf_dir):
    from s3_rds_bq_airflow_spark.io.tables import load_table

    rows = Q["q_mad_outliers"](spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == n_events
    for r in rows:
        assert r.mad >= 0.0
        assert 0 <= r.n_outliers < r.n  # median itself is never an outlier


def test_jl_projection_preserves_cosine_on_twins(spark, sf_dir):
    """JL guarantee, spot-checked: vectors duplicated exactly project
    identically; near-orthogonal random vectors stay near-orthogonal
    in the sketch (|cos| bounded away from 1)."""
    df = Q["q_jl_projection"](spark, sf_dir)
    cols = [f"p{j}" for j in range(16)]
    rows = df.orderBy("vec_id").limit(20).collect()

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    vecs = [[getattr(r, c) for c in cols] for r in rows]
    # identical input vectors -> identical sketches (determinism)
    again = [
        [getattr(r, c) for c in cols]
        for r in df.orderBy("vec_id").limit(20).collect()
    ]
    assert vecs == again
    # distinct random 64-dim vectors: sketch cosines stay within
    # (-0.9, 0.9) overwhelmingly; assert the average is small
    cs = [abs(cos(vecs[i], vecs[j])) for i in range(10) for j in range(i + 1, 10)]
    assert sum(cs) / len(cs) < 0.6


def test_r5b_exchange_budgets(spark, sf_dir):
    """Scale-posture pins for the round-5b tier: JL projection is a
    pure row-local map (ZERO exchanges); the rest stay within small
    fixed shuffle budgets. setsim's larger static count is repeated
    references to the one shingle subtree across its four consumers
    (freq/sizes/prefix/verify) — identical subplans, reused at
    runtime by exchange reuse; the pin catches growth, not reuse."""
    from s3_rds_bq_airflow_spark.plans.inspect import shuffle_count

    budgets = {
        "q_jl_projection": 0,
        "q_gaps_islands": 2,
        "q_split_leakage_guard": 2,
        "q_recursive_cte": 3,
        "q_quantile_normalize": 3,
        "q_temperature_sampling": 4,
        "q_skipgram_cooccur": 5,
        "q_mad_outliers": 5,
        "q_setsim_join": 20,
        "q_lang_confusion": 1,
        # iterative merge rounds: each round re-references the
        # vocabulary subtree (static count; runtime reuses exchanges)
        "q_bpe_merges": 16,
        "q_bpe_encode": 17,
    }
    for name, budget in budgets.items():
        got = shuffle_count(Q[name](spark, sf_dir))
        assert got <= budget, f"{name}: {got} exchanges > budget {budget}"
