"""Round-12 adaptive-gear equivalence pins.

The round-12 optimizations add data-size-gated execution gears:
q5/q7/q10 switch to dimension prefilter / aggregate-first shapes once
customer outgrows the broadcast threshold, and q_bloom_prefilter
switches to an aggregate-first verification once the bitset saturates.
At the test SFs every gate is OFF, so the oracle-parity sweep alone
never exercises the at-scale branch. These tests force each gate and
pin that the gated gear computes EXACTLY the ungated rows — the
equivalence argument each docstring makes, executed.
"""

from __future__ import annotations

import pytest

from s3_rds_bq_airflow_spark.queries import _util
from s3_rds_bq_airflow_spark.queries.registry import _QUERIES as QUERIES


def _rows(df):
    """Order-insensitive, float-tolerant row multiset."""
    out = []
    for row in df.collect():
        out.append(tuple(round(v, 9) if isinstance(v, float) else v for v in row))
    return sorted(out, key=repr)


# ---------------------------------------------------------------------------
# _size_bytes / dim_outgrows_broadcast unit behavior
# ---------------------------------------------------------------------------


def test_size_bytes_parses_spark_conf_forms():
    sb = _util._size_bytes
    assert sb("10485760") == 10 << 20
    assert sb("10m") == 10 << 20
    assert sb("10MB") == 10 << 20
    assert sb("1048576b") == 1 << 20
    assert sb("1g") == 1 << 30
    assert sb("512k") == 512 << 10
    assert sb("-1") == -1
    assert sb("garbage") == -1


def test_dim_outgrows_broadcast_tracks_threshold(spark, sf_dir):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")
        assert not _util.dim_outgrows_broadcast(spark, sf_dir, "customer")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
        assert _util.dim_outgrows_broadcast(spark, sf_dir, "customer")
        # disabled threshold: nothing auto-broadcasts -> prefilter on
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert _util.dim_outgrows_broadcast(spark, sf_dir, "customer")
        # unreadable table keeps the simple shape
        assert not _util.dim_outgrows_broadcast(spark, sf_dir, "no_such_table")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_t_spread_floor_skips_tiny_files(spark, sf_dir):
    """Below the min_bytes floor a table is a few thousand rows at
    most — the fan-out is pure overhead (round-12 advisor catch), so
    t_spread must NOT repartition it; dropping the floor restores the
    spread (the sf0.1 bench behavior, whose file is above the floor)."""
    floored = _util.t_spread(spark, sf_dir, "embeddings")
    assert floored.rdd.getNumPartitions() <= 2
    forced = _util.t_spread(spark, sf_dir, "embeddings", min_bytes=0)
    assert forced.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


# ---------------------------------------------------------------------------
# q5/q7/q10: gated prefilter/agg-first shapes == ungated rows
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["q5_nation_revenue", "q7_nation_volume", "q10_returned_items"]
)
def test_prefilter_gear_matches_ungated(spark, sf_dir, name):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    base = _rows(QUERIES[name](spark, sf_dir))
    try:
        # Force the gate: with a 1-byte threshold every dimension
        # "outgrows" broadcast, so the builder takes the at-scale
        # branch (the hinted nation/region broadcasts still apply).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
        gated_df = QUERIES[name](spark, sf_dir)
        plan = gated_df._jdf.queryExecution().optimizedPlan().toString()
        gated = _rows(gated_df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert gated == base, f"{name}: gated gear changed the result"
    if name in ("q5_nation_revenue", "q7_nation_volume"):
        # evidence the branch actually engaged: the collected nation
        # keys appear as IN filters over both dimension keys
        import re

        assert re.search(r"c_nationkey#\d+ IN \(", plan), plan[:2000]
        assert re.search(r"s_nationkey#\d+ IN \(", plan), plan[:2000]
    else:
        # q10: the revenue aggregate sits below the customer join
        assert "__rev_dec" in plan, plan[:2000]


# ---------------------------------------------------------------------------
# q_bloom_prefilter: saturated aggregate-first gear == filter-first rows
# ---------------------------------------------------------------------------


def test_bloom_saturated_gear_matches_filter_first(spark, sf_dir, monkeypatch):
    from s3_rds_bq_airflow_spark.queries import skewq

    base = _rows(QUERIES["q_bloom_prefilter"](spark, sf_dir))
    # Force ONLY the gear switch: m (hence the bitset and its false
    # positives) is untouched, so the outputs must be bit-identical.
    monkeypatch.setattr(skewq, "_bloom_saturated", lambda n: True)
    gated_df = QUERIES["q_bloom_prefilter"](spark, sf_dir)
    plan = gated_df._jdf.queryExecution().optimizedPlan().toString()
    gated = _rows(gated_df)
    assert gated == base, "saturated gear changed the bloom output"
    # evidence the agg-first branch ran: the per-key rollup columns
    assert "__rows" in plan, plan[:2000]


def test_bloom_saturated_predicate_boundary():
    """The gear boundary is fp > 1/2, NOT mere cap overflow: below it
    the filter-first plan shuffles only the fp-fraction to the
    verification join and an extra aggregate is pure overhead. The
    boundary is ~69k build keys at the 2^17 cap (fp 0.004 at sf0.1's
    1.9k keys, 0.96 at sf10's 189k, ~1.0 at sf100's 1.89M)."""
    from s3_rds_bq_airflow_spark.queries.skewq import _bloom_saturated

    assert not _bloom_saturated(0)
    assert not _bloom_saturated(8192)  # cap reached but fp ~0.2%: pruned
    assert not _bloom_saturated(30_000)  # fp ~0.12: still filter-first
    assert _bloom_saturated(70_000)  # fp just past 1/2
    assert _bloom_saturated(189_200)  # sf10 pass-through (fp 0.96)
