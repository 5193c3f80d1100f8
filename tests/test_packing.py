"""Sequence packing (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators.packing import boundary_pack, greedy_pack


def _docs(spark):
    rows = [(i, "g%d" % (i % 2), (i * 37) % 90 + 10) for i in range(60)]
    return spark.createDataFrame(rows, ["doc_id", "grp", "n_tokens"])


def test_boundary_pack_overshoot_bounded(spark):
    df = _docs(spark)
    packed = boundary_pack(
        df, capacity=200, weight_col="n_tokens", order_col="doc_id", group_cols=("grp",)
    )
    stats = (
        packed.groupBy("grp", "pack_id")
        .agg(F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    # Every pack <= capacity + (its largest doc - 1); packs contiguous 0..k.
    assert all(r["tok"] <= 200 + r["mx"] - 1 for r in stats)
    for g in ("g0", "g1"):
        ids = sorted(r["pack_id"] for r in stats if r["grp"] == g)
        assert ids == list(range(len(ids)))
    # Deterministic.
    again = boundary_pack(
        df, capacity=200, weight_col="n_tokens", order_col="doc_id", group_cols=("grp",)
    )
    assert sorted(map(tuple, packed.collect())) == sorted(map(tuple, again.collect()))


def test_greedy_pack_hard_cap(spark):
    df = _docs(spark)
    packed = greedy_pack(
        df, capacity=200, weight_col="n_tokens", order_col="doc_id", group_cols=("grp",)
    )
    stats = packed.groupBy("grp", "pack_id").agg(F.sum("n_tokens").alias("tok")).collect()
    assert all(r["tok"] <= 200 for r in stats)  # hard cap, no exceptions
    # All rows preserved exactly once.
    assert packed.count() == 60
    # Order within a pack follows doc order: pack ids non-decreasing in doc_id.
    rows = sorted(packed.collect(), key=lambda r: (r["grp"], r["doc_id"]))
    for a, b in zip(rows, rows[1:]):
        if a["grp"] == b["grp"]:
            assert b["pack_id"] >= a["pack_id"]


def test_greedy_oversized_doc_singleton(spark):
    df = spark.createDataFrame(
        [(1, "g", 50), (2, "g", 500), (3, "g", 50)], ["doc_id", "grp", "n_tokens"]
    )
    packed = {r["doc_id"]: r["pack_id"] for r in greedy_pack(
        df, capacity=100, weight_col="n_tokens", order_col="doc_id", group_cols=("grp",)
    ).collect()}
    assert packed[1] != packed[2] and packed[2] != packed[3]


def test_greedy_sharded_equals_per_shard_single_walks(spark):
    """The sharded scale gear is EXACTLY the proof gear run on each
    (group, doc_id % n_shards) slice: same pack assignments, same
    hard cap — sharding bounds the pandas group payload without
    changing first-fit semantics within a shard."""
    df = _docs(spark)
    sharded = greedy_pack(
        df, capacity=200, weight_col="n_tokens", order_col="doc_id",
        group_cols=("grp",), n_shards=4, shard_key="doc_id",
    )
    got = {
        (r["grp"], r["pack_shard"], r["doc_id"]): r["pack_id"]
        for r in sharded.collect()
    }
    assert len(got) == 60
    for shard in range(4):
        sub = df.where(F.col("doc_id") % 4 == shard)
        walk = greedy_pack(
            sub, capacity=200, weight_col="n_tokens", order_col="doc_id",
            group_cols=("grp",),
        )
        for r in walk.collect():
            assert got[(r["grp"], shard, r["doc_id"])] == r["pack_id"]
    # Hard cap holds per (group, shard) pack.
    stats = (
        sharded.groupBy("grp", "pack_shard", "pack_id")
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    )
    assert all(r["tok"] <= 200 for r in stats)


def test_greedy_sharded_requires_shard_key(spark):
    import pytest

    with pytest.raises(ValueError, match="shard_key"):
        greedy_pack(
            _docs(spark), capacity=200, weight_col="n_tokens",
            order_col="doc_id", group_cols=("grp",), n_shards=4,
        )


def test_greedy_sharded_rejects_negative_shard_key(spark):
    """F.pmod is non-negative while the DuckDB oracle's % keeps the
    sign — a negative shard_key would be a silent parity break, so
    the folded check raises at execution (round-10 advisor note)."""
    import pytest

    df = spark.createDataFrame(
        [("a", -3, 10), ("a", 1, 10)], "grp string, doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="non-negative"):
        greedy_pack(
            df, capacity=200, weight_col="n_tokens", order_col="doc_id",
            group_cols=("grp",), n_shards=4, shard_key="doc_id",
        ).collect()
