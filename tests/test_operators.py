"""Unit tests for merge / reconcile / copy operators."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators import (
    count_reconciliation,
    dedup_latest,
    merge_upsert,
    verified_cleanup_gate,
)
from s3_rds_bq_airflow_spark.operators.copy import full_copy, incremental_since, next_watermark


def test_dedup_latest(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")], ["k", "v", "tag"]
    )
    out = dedup_latest(df, ["k"], ["v"]).orderBy("k").collect()
    assert [(r["k"], r["tag"]) for r in out] == [(1, "new"), (2, "only")]


def test_merge_upsert(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    source = spark.createDataFrame([(2, "B"), (3, "C")], ["k", "v"])
    out = {r["k"]: r["v"] for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "C"}


def test_merge_upsert_dedups_source(spark):
    target = spark.createDataFrame([(1, "a", 0)], ["k", "v", "seq"])
    source = spark.createDataFrame([(1, "mid", 1), (1, "last", 2)], ["k", "v", "seq"])
    out = merge_upsert(target, source, ["k"], source_order=["seq"]).collect()
    assert len(out) == 1 and out[0]["v"] == "last"


def test_count_reconciliation(spark):
    a, b = spark.range(10), spark.range(8)
    rec = count_reconciliation({"t1": (a, a), "t2": (a, b)})
    rows = {r["table_name"]: r for r in rec.collect()}
    assert rows["t1"]["match"] is True and rows["t1"]["difference"] == 0
    assert rows["t2"]["match"] is False and rows["t2"]["difference"] == 2


def test_verified_cleanup_gate(spark):
    assert verified_cleanup_gate(spark.range(100), spark.range(95))
    assert not verified_cleanup_gate(spark.range(100), spark.range(80))
    assert verified_cleanup_gate(spark.range(0), spark.range(0))


def test_full_copy_and_watermark(spark):
    df = spark.range(100).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60)
    )
    dest = os.path.join(tempfile.mkdtemp(prefix="copy_test_"), "t")
    copied = full_copy(df, dest)
    assert copied.count() == 100
    # overwrite is idempotent
    copied = full_copy(df, dest)
    assert copied.count() == 100

    wm = next_watermark(df, "ts")
    sliced = incremental_since(df, "ts", str(wm))
    assert sliced.count() == 1  # inclusive watermark: at-least-once re-read


def test_merge_upsert_source_null_overwrites(spark):
    """A matched source row carrying NULL must overwrite the target
    value (WHEN MATCHED UPDATE SET every column) — CDC updates that
    null a column out must not silently keep the stale value."""
    target = spark.createDataFrame([(1, "stale", 10), (2, "keep", 20)], ["k", "v", "n"])
    source = spark.createDataFrame([(1, None, None)], "k int, v string, n int")
    out = {r["k"]: (r["v"], r["n"]) for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: (None, None), 2: ("keep", 20)}


def test_asof_join_null_payload_atomic(spark):
    """The latest right row is carried ATOMICALLY: a NULL in one of
    its payload columns must surface as NULL, not be backfilled from
    an older right row (DuckDB ASOF JOIN takes the row as-is)."""
    from s3_rds_bq_airflow_spark.operators.temporal import asof_join

    right = spark.createDataFrame(
        [(1, 10, 100.0, "old"), (1, 20, None, "new")],
        "k int, t int, price double, tag string",
    )
    left = spark.createDataFrame([(1, 30)], "k int, t int")
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_values=["t", "price", "tag"], strict=False,
    ).collect()
    assert len(out) == 1
    r = out[0]
    # latest right row is (t=20, price=NULL, tag='new') — price must
    # NOT come from the t=10 row.
    assert r["asof_t"] == 20 and r["asof_price"] is None and r["asof_tag"] == "new"


def test_connected_components_string_ids(spark):
    """Convergence detection must work for non-numeric ids: the chain
    a-b, b-c, c-d needs >1 round to reach the transitive closure."""
    from s3_rds_bq_airflow_spark.operators.cluster import connected_components

    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("z",)], ["id"])
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["id_a", "id_b"]
    )
    labels = {r["id"]: r["cluster_id"] for r in connected_components(nodes, edges).collect()}
    assert labels == {"a": "a", "b": "a", "c": "a", "d": "a", "z": "z"}


def test_star_contraction_matches_label_propagation(spark):
    """Large-star/small-star contraction must produce the same
    labeling as min-label propagation on a mixed graph: a 40-node
    chain (the pathological-diameter shape the algorithm exists for —
    label propagation needs 40 rounds, contraction O(log n)), a
    triangle, and isolated singletons."""
    from s3_rds_bq_airflow_spark.operators.cluster import (
        connected_components,
        star_contraction_components,
    )

    chain = [(i, i + 1) for i in range(100, 140)]  # 41-node path
    tri = [(1, 2), (2, 3), (3, 1)]
    edges = spark.createDataFrame(chain + tri, ["id_a", "id_b"])
    node_ids = sorted({x for e in chain + tri for x in e} | {7, 9})
    nodes = spark.createDataFrame([(i,) for i in node_ids], ["id"])
    star = {
        r["id"]: r["cluster_id"]
        for r in star_contraction_components(nodes, edges).collect()
    }
    lp = {
        r["id"]: r["cluster_id"]
        for r in connected_components(nodes, edges, max_iterations=50).collect()
    }
    assert star == lp
    assert star[140] == 100 and star[3] == 1 and star[7] == 7 and star[9] == 9


def test_star_contraction_string_ids(spark):
    """Same orderable-id contract as connected_components."""
    from s3_rds_bq_airflow_spark.operators.cluster import (
        star_contraction_components,
    )

    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("z",)], ["id"])
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["id_a", "id_b"]
    )
    labels = {
        r["id"]: r["cluster_id"]
        for r in star_contraction_components(nodes, edges).collect()
    }
    assert labels == {"a": "a", "b": "a", "c": "a", "d": "a", "z": "z"}


def test_swap_directory_crash_safety(tmp_path):
    """Every crash point of the rename-aside swap leaves a readable
    current-or-previous version recoverable via recover_directory."""
    from s3_rds_bq_airflow_spark.io.atomic import recover_directory, swap_directory

    target = str(tmp_path / "state")
    tmp = str(tmp_path / "state__tmp")

    os.makedirs(target)
    open(os.path.join(target, "v1"), "w").close()
    os.makedirs(tmp)
    open(os.path.join(tmp, "v2"), "w").close()
    swap_directory(tmp, target)
    assert os.path.exists(os.path.join(target, "v2"))
    assert not os.path.exists(target + "__sdc_old")

    # simulate a crash between rename-aside and promote: target
    # missing, __sdc_old present -> recover restores the old version.
    os.replace(target, target + "__sdc_old")
    assert recover_directory(target) == target
    assert os.path.exists(os.path.join(target, "v2"))


def test_label_propagation_planted_communities(spark):
    from s3_rds_bq_airflow_spark.operators.cluster import label_propagation

    # Two 4-cliques joined by ONE bridge edge: connected components
    # would merge them; LPA must keep two communities (the bridge vote
    # is always outnumbered by in-community votes).
    c1, c2 = [1, 2, 3, 4], [10, 11, 12, 13]
    edges = (
        [(a, b) for a in c1 for b in c1 if a < b]
        + [(a, b) for a in c2 for b in c2 if a < b]
        + [(4, 10)]
    )
    nodes = spark.createDataFrame([(i,) for i in c1 + c2], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["label"] for r in label_propagation(nodes, e).collect()}
    assert all(got[i] == 1 for i in c1)
    assert all(got[i] == 10 for i in c2)


def test_label_propagation_deterministic_and_capped(spark):
    from s3_rds_bq_airflow_spark.operators.cluster import label_propagation

    # Bipartite path — the classic synchronous-LPA oscillator. The
    # self-vote + cap must still terminate with a deterministic
    # labeling (two identical runs agree exactly).
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    e = spark.createDataFrame([(i, i + 1) for i in range(5)], ["src", "dst"])
    r1 = sorted(label_propagation(nodes, e, max_iterations=5).collect())
    r2 = sorted(label_propagation(nodes, e, max_iterations=5).collect())
    assert r1 == r2
    assert all(r["label"] is not None for r in r1)


def test_incremental_exact_dedup_split_invariance(spark, tmp_path):
    from s3_rds_bq_airflow_spark.operators.dedup import (
        exact_dedup,
        incremental_exact_dedup,
    )

    docs = [(i, f"text {i % 7}") for i in range(40)]  # 7 distinct contents
    full = spark.createDataFrame(docs, ["doc_id", "text"])
    oneshot = {r["content_fp"]: (r["keep_id"], r["n_copies"])
               for r in exact_dedup(full).collect()}

    state = str(tmp_path / "dedup_state")
    seen_novel = []
    for lo, hi in ((0, 10), (10, 25), (25, 40)):
        batch = spark.createDataFrame(docs[lo:hi], ["doc_id", "text"])
        novel, store = incremental_exact_dedup(spark, state, batch)
        seen_novel.extend(r["content_fp"] for r in novel.collect())
    got = {r["content_fp"]: (r["keep_id"], r["n_copies"]) for r in store.collect()}
    # Any batch split converges to the one-shot store.
    assert got == oneshot
    # Each distinct content is emitted as novel EXACTLY once across batches.
    assert sorted(seen_novel) == sorted(oneshot.keys())


def test_incremental_exact_dedup_restartable(spark, tmp_path):
    from s3_rds_bq_airflow_spark.operators.dedup import incremental_exact_dedup

    state = str(tmp_path / "s")
    b1 = spark.createDataFrame([(1, "a"), (2, "a")], ["doc_id", "text"])
    novel1, store1 = incremental_exact_dedup(spark, state, b1)
    assert novel1.count() == 1 and store1.collect()[0]["n_copies"] == 2
    # Re-processing the same batch: nothing novel, counts accumulate
    # (at-least-once delivery is visible, not silently double-kept).
    novel2, store2 = incremental_exact_dedup(spark, state, b1)
    assert novel2.count() == 0
    row = store2.collect()[0]
    assert row["keep_id"] == 1 and row["n_copies"] == 4


def test_incremental_dedup_streaming_foreachbatch(spark, tmp_path):
    """The streaming tier of incremental dedup: micro-batches folded
    into the same signature store the batch path uses."""
    import json

    from s3_rds_bq_airflow_spark.operators.dedup import incremental_exact_dedup

    src = tmp_path / "docs_src"
    src.mkdir()
    # 3 files, overlapping contents across files (cross-batch dupes).
    for b in range(3):
        with open(src / f"b{b}.json", "w") as f:
            for i in range(10):
                doc_id = b * 10 + i
                f.write(json.dumps({"doc_id": doc_id, "text": f"content {i % 4}"}) + "\n")
    state = str(tmp_path / "store")
    stream = spark.readStream.schema("doc_id LONG, text STRING").json(str(src))
    q = (
        stream.writeStream.foreachBatch(
            lambda df, epoch: incremental_exact_dedup(spark, state, df)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    store = spark.read.parquet(state)
    rows = {r["keep_id"]: r["n_copies"] for r in store.collect()}
    # 4 distinct contents, 30 docs total; min ids 0..3 survive.
    assert sorted(rows) == [0, 1, 2, 3]
    assert sum(rows.values()) == 30


def test_asof_tolerance_nulls_stale_matches(spark):
    from s3_rds_bq_airflow_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100.0, "a"), (1, 5000.0, "b"), (2, 50.0, "c")],
        "k long, t double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 90.0, "r1"), (2, 60.0, "r2")], "k long, t double, v string"
    )
    out = {
        r.tag: r.asof_v
        for r in asof_join(
            left,
            right,
            on="k",
            left_time="t",
            right_time="t",
            right_values=["v"],
            strict=True,
            tolerance_seconds=100.0,
        ).collect()
    }
    assert out["a"] == "r1"      # 10s old, inside tolerance
    assert out["b"] is None      # 4910s old -> nulled out
    assert out["c"] is None      # right row is LATER, never matches


def test_interval_overlap_equals_direct_predicate(spark):
    """Binned overlap join == the direct nested predicate, including
    touching-but-not-overlapping intervals and bucket boundaries."""
    from s3_rds_bq_airflow_spark.operators.temporal import (
        interval_overlap_join_binned,
    )

    lefts = [(i, float(i * 50), float(i * 50 + 80)) for i in range(20)]
    rights = [(j, float(j * 70 + 5), float(j * 70 + 40)) for j in range(15)]
    ldf = spark.createDataFrame(lefts, "lid long, s double, e double")
    rdf = spark.createDataFrame(rights, "rid long, s2 double, e2 double")
    got = {
        (r.lid, r.rid)
        for r in interval_overlap_join_binned(
            ldf.select("lid", "s", "e"),
            rdf.select("rid", "s2", "e2"),
            left_start=F.col("s"),
            left_end=F.col("e"),
            right_start=F.col("s2"),
            right_end=F.col("e2"),
            bucket_seconds=64,  # deliberately not aligned to intervals
        ).collect()
    }
    want = {
        (li, rj)
        for (li, ls, le) in lefts
        for (rj, rs, re) in rights
        if ls < re and rs < le
    }
    assert got == want
    # half-open: touching endpoints do NOT overlap
    touch = interval_overlap_join_binned(
        spark.createDataFrame([(1, 0.0, 10.0)], "lid long, s double, e double"),
        spark.createDataFrame([(2, 10.0, 20.0)], "rid long, s2 double, e2 double"),
        left_start=F.col("s"),
        left_end=F.col("e"),
        right_start=F.col("s2"),
        right_end=F.col("e2"),
        bucket_seconds=16,
    )
    assert touch.count() == 0


def test_interval_overlap_count_rank_equals_direct(spark):
    """Rank-count overlap gear == per-left count of the direct
    predicate, including the tie boundaries the decomposition hinges
    on: an incident START exactly at a span END (strict <, excluded)
    and an incident END exactly at a span START (<= in the
    subtraction term, excluded from the overlap). Bin width is
    deliberately unaligned to every interval."""
    from s3_rds_bq_airflow_spark.operators.temporal import (
        interval_overlap_count_rank,
    )

    lefts = [(i, float(i * 50), float(i * 50 + 80)) for i in range(20)]
    # rights engineered so some start exactly at a left end (150.0 ==
    # left 1's s+80=130? use explicit touches below) plus the generic lattice
    rights = [(float(j * 70 + 5), float(j * 70 + 40)) for j in range(15)]
    rights += [(80.0, 95.0), (40.0, 50.0)]  # touch left 0's end=80 / start=...
    # left 0 = [0, 80): right (80, 95) starts AT its end -> no overlap;
    # right (40, 50) is inside -> overlap. left 1 = [50, 130): (40, 50)
    # ends AT its start -> no overlap.
    ldf = spark.createDataFrame(lefts, "lid long, s double, e double")
    rdf = spark.createDataFrame(rights, "s2 double, e2 double")
    got = {
        (r.lid, r.n)
        for r in interval_overlap_count_rank(
            ldf,
            rdf,
            left_start=F.col("s"),
            left_end=F.col("e"),
            right_start=F.col("s2"),
            right_end=F.col("e2"),
            key_cols=("lid",),
            count_col="n",
            bin_seconds=64,
        ).collect()
    }
    want = {
        (li, sum(1 for (rs, re) in rights if ls < re and rs < le))
        for (li, ls, le) in lefts
    }
    assert got == want


def test_interval_overlap_rejects_malformed_interval(spark):
    """end < start raises at execution instead of silently generating
    a descending bucket sequence (wrong buckets, dropped overlaps)."""
    import pytest

    from s3_rds_bq_airflow_spark.operators.temporal import (
        interval_overlap_join_binned,
    )

    bad = spark.createDataFrame([(1, 50.0, 10.0)], "lid long, s double, e double")
    ok = spark.createDataFrame([(2, 0.0, 100.0)], "rid long, s2 double, e2 double")
    out = interval_overlap_join_binned(
        bad,
        ok,
        left_start=F.col("s"),
        left_end=F.col("e"),
        right_start=F.col("s2"),
        right_end=F.col("e2"),
        bucket_seconds=16,
    )
    with pytest.raises(Exception, match="end < start"):
        out.collect()


def test_interval_overlap_binned_max_fanout_guard(spark):
    """The explode-fanout audit's executable gear: with max_fanout
    set, an interval covering more buckets than the cap raises at
    execution (one corrupt epoch-zero row would otherwise explode a
    task into millions of bucket rows); inside the cap, results are
    identical to the unguarded operator."""
    import pytest

    from s3_rds_bq_airflow_spark.operators.temporal import (
        interval_overlap_join_binned,
    )

    ldf = spark.createDataFrame(
        [(1, 0.0, 100.0), (2, 50.0, 120.0)], "lid long, s double, e double"
    )
    rdf = spark.createDataFrame([(10, 90.0, 110.0)], "rid long, s2 double, e2 double")

    def run(**kw):
        return interval_overlap_join_binned(
            ldf, rdf,
            left_start=F.col("s"), left_end=F.col("e"),
            right_start=F.col("s2"), right_end=F.col("e2"),
            bucket_seconds=16, **kw,
        ).select("lid", "rid").collect()

    want = sorted(map(tuple, run()))
    # caps generously above the true fanout (100/16 + 1 = 8 buckets):
    assert sorted(map(tuple, run(max_fanout=16))) == want
    with pytest.raises(Exception, match="fanout > 4"):
        run(max_fanout=4)


def test_interval_overlap_count_rank_degenerate_intervals(spark):
    """Zero-length intervals (round-10 hypothesis catch): a
    zero-length right at exactly a zero-length left's point broke the
    rank decomposition's subset argument (returned -1); the
    degenerate-coincidence correction repairs it. Pins: coincident
    degenerates -> 0; degenerate right strictly inside a real left ->
    1; degenerate left straddled by a real right -> 1; touching ->
    0."""
    from s3_rds_bq_airflow_spark.operators.temporal import (
        interval_overlap_count_rank,
    )

    lefts = [
        (0, 10.0, 10.0),   # degenerate left at 10
        (1, 5.0, 15.0),    # real left containing 10
        (2, 10.0, 20.0),   # real left STARTING at 10 (touch, no overlap)
        (3, 30.0, 30.0),   # degenerate left at 30, straddled by (25, 35)
    ]
    rights = [
        (10.0, 10.0),      # degenerate right at 10 (twice)
        (10.0, 10.0),
        (25.0, 35.0),      # real right straddling 30
        (30.0, 30.0),      # degenerate right at 30
    ]
    ldf = spark.createDataFrame(lefts, "lid long, s double, e double")
    rdf = spark.createDataFrame(rights, "s2 double, e2 double")
    got = {
        (r["lid"], r["n"])
        for r in interval_overlap_count_rank(
            ldf, rdf,
            left_start=F.col("s"), left_end=F.col("e"),
            right_start=F.col("s2"), right_end=F.col("e2"),
            key_cols=("lid",), count_col="n", bin_seconds=8,
        ).collect()
    }
    want = {
        (li, sum(1 for (rs, re) in rights if ls < re and rs < le))
        for (li, ls, le) in lefts
    }
    assert want == {(0, 0), (1, 2), (2, 0), (3, 1)}  # sanity on the brute itself
    assert got == want


def test_interval_overlap_count_rank_rejects_malformed(spark):
    """The rank gear's subset argument (|R.end <= L.start| a subset of
    |R.start < L.end|) requires R.start <= R.end; a malformed right
    interval would silently miscount (even negative) — so both gears
    now raise identically on bad input (round-9 advisor parity
    note). NULL endpoints are malformed too."""
    import pytest

    from s3_rds_bq_airflow_spark.operators.temporal import (
        interval_overlap_count_rank,
    )

    ldf = spark.createDataFrame([(1, 0.0, 100.0)], "lid long, s double, e double")

    def run(rights_rows, schema="s2 double, e2 double"):
        rdf = spark.createDataFrame(rights_rows, schema)
        return interval_overlap_count_rank(
            ldf, rdf,
            left_start=F.col("s"), left_end=F.col("e"),
            right_start=F.col("s2"), right_end=F.col("e2"),
            key_cols=("lid",), count_col="n", bin_seconds=64,
        ).collect()

    with pytest.raises(Exception, match="end < start or NULL"):
        run([(50.0, 10.0)])
    with pytest.raises(Exception, match="end < start or NULL"):
        run([(None, 10.0)])
    # Malformed LEFT raises too (same check, left side).
    bad_left = spark.createDataFrame([(1, 100.0, 0.0)], "lid long, s double, e double")
    rdf = spark.createDataFrame([(10.0, 20.0)], "s2 double, e2 double")
    with pytest.raises(Exception, match="end < start or NULL"):
        interval_overlap_count_rank(
            bad_left, rdf,
            left_start=F.col("s"), left_end=F.col("e"),
            right_start=F.col("s2"), right_end=F.col("e2"),
            key_cols=("lid",), count_col="n", bin_seconds=64,
        ).collect()


def test_merge_count_null_inputs(spark):
    """Round-9 advisor catch: a NULL point used to land in a NULL bin
    that sorts FIRST in the cross-bin prefix, inflating EVERY query's
    count (1 query at v=100 over points {10, NULL, 200} returned 2).
    NULL points are dropped; NULL query values raise."""
    import pytest

    from s3_rds_bq_airflow_spark.operators.temporal import _merge_count

    q = spark.createDataFrame([(1, 100.0)], "qid long, v double")
    p = spark.createDataFrame([(10.0,), (None,), (200.0,)], "pv double")
    got = _merge_count(
        q, F.col("v"), p, F.col("pv"),
        key_cols=("qid",), count_col="n", ties_count=False, bin_seconds=32,
    ).collect()
    assert [(r["qid"], r["n"]) for r in got] == [(1, 1)]

    qnull = spark.createDataFrame([(1, None)], "qid long, v double")
    with pytest.raises(Exception, match="query value is NULL"):
        _merge_count(
            qnull, F.col("v"), p, F.col("pv"),
            key_cols=("qid",), count_col="n", ties_count=False, bin_seconds=32,
        ).collect()


def test_bloom_m_python_equals_sql_twin():
    """The adaptive bloom sizing (m = next power of two >= 16*n_build,
    clamped to [2^13, 2^17]) is computed independently in Python (the
    Spark side) and in SQL (the DuckDB oracle's params CTE) — any
    disagreement is a silent parity break, so pin them equal across
    the clamp edges and the power-of-two boundaries."""
    import duckdb

    from s3_rds_bq_airflow_spark.queries.skewq import _BLOOM_M_SQL, _bloom_m

    con = duckdb.connect()
    for n in (0, 1, 180, 511, 512, 513, 1024, 4096, 8191, 8192, 8193, 100000, 10**9):
        sql = f"WITH build AS (SELECT * FROM range({n})) {_BLOOM_M_SQL.replace('COUNT(*)', 'COUNT(*)')}"
        got = con.execute(sql).fetchone()[0]
        assert got == _bloom_m(n), (n, got, _bloom_m(n))
