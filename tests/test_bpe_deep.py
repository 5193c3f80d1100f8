"""Deep BPE merge learning (queries/textops.learn_bpe_merges).

The oracle-matched q_bpe_merges proves 2 merge rounds bit-for-bit; a
real tokenizer run is thousands of sequential merges, and the risk at
depth is the literal-replace chain growing the Catalyst plan (and the
re-analyzed lineage) linearly per round. These tests drive 64 merges
and pin (a) the plan stays bounded via the periodic localCheckpoint,
(b) per-merge wall time stays flat, (c) the depth-2 prefix equals the
oracle-verified query's merges on the real corpus.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.queries.textops import (
    _US,
    _bpe_top_pair,
    bpe_vocab,
    learn_bpe_merges,
)


def _wrap(word: str) -> str:
    return _US + (_US + _US).join(word) + _US


def _synth_vocab(spark):
    """~120 distinct words with zipf-ish weights — enough structure to
    sustain 64 distinct merges."""
    import itertools

    syll = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr", "st"]
    words = ["".join(p) for p in itertools.product(syll, repeat=2)][:100]
    words += ["".join(p) + "x" for p in itertools.product(syll[:4], repeat=2)]
    rows = [(len(words) - i, _wrap(w)) for i, w in enumerate(words)]
    return spark.createDataFrame(rows, "wn long, s string")


def test_deep_bpe_plan_bounded_and_time_flat(spark):
    vocab0 = _synth_vocab(spark).localCheckpoint(eager=True)

    # instrumented copy of the learn loop: per-round wall time + the
    # analyzed-plan size of the evolving vocabulary
    merges = []
    vocab = vocab0
    times, plan_sizes = [], []
    for r in range(64):
        t0 = time.time()
        rows = _bpe_top_pair(vocab, weight="wn").collect()
        assert rows, f"ran dry at round {r} — synth vocab too small"
        pat, repl = rows[0]["pat"], rows[0]["repl"]
        merges.append((pat, repl))
        vocab = vocab.select(
            "wn", F.replace(F.col("s"), F.lit(pat), F.lit(repl)).alias("s")
        )
        if (r + 1) % 8 == 0:
            vocab = vocab.localCheckpoint(eager=True)
        times.append(time.time() - t0)
        # lineage depth = Project nodes in the analyzed plan (literal
        # LENGTHS legitimately drift as merged tokens grow — structure
        # is the thing the checkpoint must bound)
        plan_sizes.append(
            vocab._jdf.queryExecution().analyzed().toString().count("Project")
        )

    # (a) plan bounded: lineage never exceeds checkpoint_every rounds
    # of replace-chain, so the deepest plan is set by the window size
    # (8 Projects + the head), never by total depth (64).
    assert max(plan_sizes[8:]) <= max(plan_sizes[:8]), (
        f"plan lineage grew with depth: first-window max {max(plan_sizes[:8])} "
        f"Projects, later max {max(plan_sizes[8:])}"
    )

    # (b) flat per-merge wall time: median of the last 16 rounds within
    # 3x the median of rounds 4..20 (both past JIT warmup; generous
    # bound — the signal being killed is the LINEAR per-round growth
    # that an unbounded chain shows, ~8x by round 60).
    med = lambda xs: sorted(xs)[len(xs) // 2]
    early, late = med(times[4:20]), med(times[-16:])
    assert late <= max(3 * early, early + 1.0), (
        f"per-merge time grew: early median {early:.3f}s, late median {late:.3f}s"
    )

    # 64 distinct merges actually learned
    assert len(merges) == 64
    assert len(set(merges)) == 64


def test_learn_bpe_merges_wrapper_and_early_stop(spark):
    # singleton characters only -> no pairs -> stops at 0 merges
    flat = spark.createDataFrame([(5, _wrap("a")), (3, _wrap("b"))], "wn long, s string")
    merges, out = learn_bpe_merges(flat, 8)
    assert merges == []
    assert out.count() == 2

    # wrapper learns the same merges as the instrumented loop shape
    vocab = _synth_vocab(spark)
    merges, out = learn_bpe_merges(vocab, 12, checkpoint_every=4)
    assert len(merges) == 12
    # merged vocabulary conserves total weight
    assert out.agg(F.sum("wn")).first()[0] == vocab.agg(F.sum("wn")).first()[0]


def test_depth2_prefix_matches_oracle_verified_query(spark, sf_dir):
    """The deep learner's first two merges on the real corpus equal the
    merges the hash-green q_bpe_merges declares (merge1/merge2)."""
    from s3_rds_bq_airflow_spark.queries.textops import q_bpe_merges

    merges, _ = learn_bpe_merges(bpe_vocab(spark, sf_dir), 2)
    got = [pat.replace(_US, "") for pat, _ in merges]
    row = q_bpe_merges(spark, sf_dir).select("merge1", "merge2").first()
    assert got == [row["merge1"], row["merge2"]]
