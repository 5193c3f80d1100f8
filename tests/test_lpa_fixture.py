"""Pins for the q_label_propagation clique fixture's scale bounds
(the round-8 straggler lesson applied in round 9):

1. The per-block node cap is a deterministic bottom-k by portable
   md5 — when it bites, exactly `cap` nodes survive per block and
   they are THE k smallest-md5 members (oracle-replayable).
2. Capped edges are the complete clique over the capped set — flat
   in SF once blocks saturate (cap*(cap-1)/2 per block, never more).
3. The salted expansion join emits every pair EXACTLY once: edge
   sets are identical across salt widths (the salt partitions pair
   work, never the pair space).
4. Uncapped proof gear: node_cap=None equals the capped gear
   wherever blocks are below the cap (every block at the test SF).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.queries.clusterq import (
    _LPA_NODE_CAP,
    clique_fixture_from,
    lpa_clique_fixture,
)


def _synthetic_block(spark, n=600, blocks=2):
    """n customers spread over `blocks` (nation, segment) blocks —
    each block far bigger than the cap when n/blocks > cap."""
    rows = [(i, i % blocks, f"SEG{i % blocks}") for i in range(1, n + 1)]
    return spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string"
    )


def test_cap_bites_keeps_bottom_k_by_md5(spark):
    cap = 64
    c = _synthetic_block(spark, n=400, blocks=2)
    nodes, _ = clique_fixture_from(c, node_cap=cap, salt=4)
    kept = {r.id for r in nodes.collect()}
    assert len(kept) == 2 * cap
    # Replay the cap in pure Python: bottom-`cap` by md5 of the
    # decimal string, per block — the exact oracle-side rule.
    for blk in range(2):
        members = [i for i in range(1, 401) if i % 2 == blk]
        expect = set(
            sorted(members, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:cap]
        )
        assert {i for i in kept if i % 2 == blk} == expect


def test_capped_edges_are_complete_clique_over_capped_set(spark):
    cap = 32
    c = _synthetic_block(spark, n=200, blocks=1)
    nodes, edges = clique_fixture_from(c, node_cap=cap, salt=4)
    kept = sorted(r.id for r in nodes.collect())
    got = {(r.src, r.dst) for r in edges.collect()}
    expect = {(a, b) for a in kept for b in kept if a < b}
    assert got == expect  # complete, exactly once, bounded
    assert len(got) == cap * (cap - 1) // 2


def test_salt_width_never_changes_the_pair_set(spark):
    c = _synthetic_block(spark, n=150, blocks=3)
    baseline = None
    for salt in (1, 2, 8):
        _, edges = clique_fixture_from(c, node_cap=40, salt=salt)
        got = sorted((r.src, r.dst) for r in edges.collect())
        if baseline is None:
            baseline = got
        assert got == baseline, f"salt={salt} changed the emitted pairs"


def test_uncapped_gear_equals_capped_below_cap(spark, sf_dir):
    """At the test SF every (nation, segment) block is far below the
    cap, so the uncapped proof gear and the default capped gear must
    build identical graphs — the fuzzy_match_families(df_cap=None)
    discipline."""
    n_cap, e_cap = lpa_clique_fixture(spark, sf_dir, salt=4)
    n_raw, e_raw = lpa_clique_fixture(spark, sf_dir, node_cap=None, salt=4)
    assert sorted(r.id for r in n_cap.collect()) == sorted(
        r.id for r in n_raw.collect()
    )
    assert sorted((r.src, r.dst) for r in e_cap.collect()) == sorted(
        (r.src, r.dst) for r in e_raw.collect()
    )


def test_block_sizes_below_cap_at_test_sf(spark, sf_dir):
    """Guard for the previous test's premise: if a future testdata
    regen pushes a block past the cap, the equivalence pin above must
    be re-scoped, not silently weakened."""
    nodes, _ = lpa_clique_fixture(spark, sf_dir, node_cap=None, salt=2)
    from s3_rds_bq_airflow_spark.queries._util import t

    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") % 7 == 0)
    biggest = (
        c.groupBy("c_nationkey", "c_mktsegment")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert biggest < _LPA_NODE_CAP
