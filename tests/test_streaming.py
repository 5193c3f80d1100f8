"""Structured Streaming: file-source micro-batches, watermark/late-data
semantics, foreachBatch merge-upsert, and custom per-key state.

Streams are driven with trigger(availableNow=True) so every test is a
finite, deterministic run over staged files.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.streaming import (
    event_schema,
    read_event_stream,
    running_user_totals,
    sessionize,
    stage_as_files,
    stream_upsert_parquet,
    tumbling_event_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def landing_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_landing"))
    paths = stage_as_files(os.path.join(SF_DIR, "events.parquet"), d, n_files=4)
    assert len(paths) >= 2
    return d


def _run_to_memory(stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _batch_events(spark, landing_dir):
    return spark.read.schema(event_schema()).parquet(landing_dir)


def test_tumbling_stream_equals_batch(spark, landing_dir):
    """One availableNow run in complete mode must reproduce the batch
    tumbling aggregate exactly."""
    stream = read_event_stream(spark, landing_dir)
    _run_to_memory(tumbling_event_counts(stream), "t_tumble", "complete")
    got = spark.sql(
        "SELECT window_start, event_type, n_events, total_value FROM t_tumble"
    ).toPandas()
    want = (
        _batch_events(spark, landing_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .toPandas()
    )
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_session_stream_equals_batch(spark, landing_dir):
    stream = read_event_stream(spark, landing_dir)
    _run_to_memory(sessionize(stream, gap="15 minutes"), "t_sess", "complete")
    got = spark.sql("SELECT user_id, session_start, n_events FROM t_sess").toPandas()
    want = (
        _batch_events(spark, landing_dir)
        .groupBy(F.session_window("ts", "15 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        .toPandas()
    )
    key = ["user_id", "session_start"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_watermark_drops_late_data(spark, tmp_path):
    """Fresh data arrives in batches 0-1, then a file a full day older
    in batch 2. By then the watermark (advanced at the end of batch 1;
    Spark applies a newly advanced watermark starting with the NEXT
    batch) is far past the stale events, so their windows never appear
    in append-mode output."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "late_landing")
    os.makedirs(d)

    def write(path, base_ts, n, mtime):
        ts = pd.date_range(base_ts, periods=n, freq="5min")
        tbl = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["click"] * n),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    now = time.time()
    write(os.path.join(d, "fresh_a.parquet"), "2024-01-02 10:00:00", 48, now)
    write(os.path.join(d, "fresh_b.parquet"), "2024-01-02 14:00:00", 12, now + 10)
    write(os.path.join(d, "stale.parquet"), "2024-01-01 10:00:00", 12, now + 20)

    stream = read_event_stream(spark, d, max_files_per_trigger=1)
    agg = tumbling_event_counts(stream, watermark="30 minutes")
    q = _run_to_memory(agg, "t_late", "append")
    got = spark.sql("SELECT window_start, n_events FROM t_late").toPandas()
    assert len(got) > 0
    # nothing from Jan 1 was admitted
    assert (pd.to_datetime(got["window_start"]) >= pd.Timestamp("2024-01-02")).all()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped > 0


def test_stream_upsert_parquet(spark, landing_dir, tmp_path):
    """foreachBatch merge: the target ends at exactly the latest row
    per user, identical to a batch dedup over all staged files."""
    target = str(tmp_path / "user_latest")
    ckpt = str(tmp_path / "ckpt_upsert")
    stream = read_event_stream(spark, landing_dir, max_files_per_trigger=2)
    q = stream_upsert_parquet(
        stream, target, keys=["user_id"], order_cols=["ts", "event_id"], checkpoint_dir=ckpt
    )
    q.awaitTermination(120)
    got = (
        spark.read.parquet(target)
        .select("user_id", "event_id")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    from s3_rds_bq_airflow_spark.operators.merge import dedup_latest

    want = (
        dedup_latest(_batch_events(spark, landing_dir), ["user_id"], ["ts", "event_id"])
        .select("user_id", "event_id")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_stream_stream_interval_join(spark, landing_dir):
    """Watermarked stream-stream join: clicks within 2 hours after a
    signup, both sides unbounded streams. One availableNow pass must
    produce exactly the batch interval-join pairs (state for both
    sides is bounded by the watermark + interval condition)."""
    def side(event_type, alias_prefix):
        s = read_event_stream(spark, landing_dir).where(F.col("event_type") == event_type)
        return s.select(
            F.col("user_id").alias(f"{alias_prefix}_user"),
            F.col("ts").alias(f"{alias_prefix}_ts"),
            F.col("event_id").alias(f"{alias_prefix}_id"),
        ).withWatermark(f"{alias_prefix}_ts", "2 hours")

    signups, clicks = side("signup", "s"), side("click", "c")
    joined = signups.join(
        clicks,
        F.expr(
            "s_user = c_user AND c_ts >= s_ts AND c_ts < s_ts + INTERVAL 2 HOURS"
        ),
    ).select("s_id", "c_id")
    _run_to_memory(joined, "t_ssjoin", "append")
    got = spark.sql("SELECT s_id, c_id FROM t_ssjoin").toPandas()

    batch = _batch_events(spark, landing_dir)
    s_b = batch.where(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"), F.col("event_id").alias("s_id")
    )
    c_b = batch.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    want = (
        s_b.join(
            c_b,
            F.expr("s_user = c_user AND c_ts >= s_ts AND c_ts < s_ts + INTERVAL 2 HOURS"),
        )
        .select("s_id", "c_id")
        .toPandas()
    )
    key = ["s_id", "c_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_transform_with_state_totals(spark, landing_dir):
    """transformWithStateInPandas (Spark 4 stateful API, RocksDB
    provider): converges to the same per-user totals as the
    applyInPandasWithState implementation and the batch aggregate.
    Requires protobuf (the state-server protocol) — skipped where
    it isn't installed."""
    pytest.importorskip("google.protobuf")
    from s3_rds_bq_airflow_spark.streaming import running_user_totals_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, landing_dir, max_files_per_trigger=2)
        _run_to_memory(running_user_totals_tws(stream), "t_tws", "update")
        updates = spark.sql("SELECT * FROM t_tws").toPandas()
        got = (
            updates.sort_values("n_events")
            .groupby("user_id", as_index=False)
            .last()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        want = (
            _batch_events(spark, landing_dir)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_value_cents"),
            )
            .toPandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["user_id", "n_events"]], want[["user_id", "n_events"]]
        )
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_rocksdb_state_store(spark, landing_dir):
    """The engine's streaming aggregations must run on the RocksDB
    state store (the scale backend: state spills to local disk with
    changelog checkpointing instead of living on the executor heap)."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, landing_dir)
        _run_to_memory(tumbling_event_counts(stream), "t_rocks", "complete")
        total = spark.sql("SELECT SUM(n_events) AS s FROM t_rocks").collect()[0]["s"]
        assert total == _batch_events(spark, landing_dir).count()
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_running_user_totals_state(spark, landing_dir):
    """applyInPandasWithState across multiple micro-batches converges
    to the batch per-user totals (latest update per user wins)."""
    stream = read_event_stream(spark, landing_dir, max_files_per_trigger=1)
    _run_to_memory(running_user_totals(stream), "t_state", "update")
    updates = spark.sql("SELECT * FROM t_state").toPandas()
    # update mode re-emits a user's row each batch they appear in; the
    # row with the highest n_events is the final state.
    got = (
        updates.sort_values("n_events")
        .groupby("user_id", as_index=False)
        .last()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want_df = (
        _batch_events(spark, landing_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_value_cents"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["user_id", "n_events"]], want_df[["user_id", "n_events"]]
    )


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate event ids across micro-batches (within the watermark)
    are emitted exactly once."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from s3_rds_bq_airflow_spark.streaming.windows import dedup_events

    d = str(tmp_path / "dup_landing")
    os.makedirs(d)

    def write(path, ids, base_ts, mtime):
        n = len(ids)
        ts = pd.date_range(base_ts, periods=n, freq="1min")
        tbl = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["click"] * n),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    now = time.time()
    write(os.path.join(d, "b0.parquet"), [1, 2, 3], "2024-01-02 10:00:00", now)
    # batch 2 re-delivers ids 2 and 3 (at-least-once upstream) + new 4
    write(os.path.join(d, "b1.parquet"), [2, 3, 4], "2024-01-02 10:30:00", now + 5)

    stream = read_event_stream(spark, d, max_files_per_trigger=1)
    q = (
        dedup_events(stream, watermark="6 hours")
        .writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["event_id"] for r in spark.sql("SELECT event_id FROM t_dedup_stream").collect()
    )
    assert got == [1, 2, 3, 4]


def test_stream_enrich_sees_refreshed_dimension(spark, tmp_path):
    """foreachBatch enrichment re-reads the dimension per micro-batch:
    after the dimension is updated between two runs of the stream, new
    batches join against the NEW dimension rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from s3_rds_bq_airflow_spark.streaming.enrich import stream_enrich_parquet

    d = str(tmp_path / "enrich_landing")
    os.makedirs(d)
    dim_path = str(tmp_path / "dim")
    out = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "ckpt_enrich")

    def write_events(path, ids, mtime):
        n = len(ids)
        ts = pd.date_range("2024-01-02 10:00:00", periods=n, freq="1min")
        tbl = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([u % 3 for u in ids], pa.int64()),
                "event_type": pa.array(["click"] * n),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    def write_dim(rows):
        spark.createDataFrame(rows, ["user_id", "tier"]).write.mode("overwrite").parquet(dim_path)

    now = time.time()
    write_events(os.path.join(d, "e0.parquet"), [0, 1, 2], now)
    write_dim([(0, "bronze"), (1, "bronze"), (2, "bronze")])

    stream = read_event_stream(spark, d)
    q = stream_enrich_parquet(
        stream, dim_path, out, on=["user_id"], checkpoint_dir=ckpt
    )
    q.awaitTermination(120)

    # dimension changes; a new file arrives; the stream resumes
    write_dim([(0, "gold"), (1, "gold"), (2, "gold")])
    write_events(os.path.join(d, "e1.parquet"), [3, 4, 5], now + 30)
    q2 = stream_enrich_parquet(
        read_event_stream(spark, d), dim_path, out, on=["user_id"], checkpoint_dir=ckpt
    )
    q2.awaitTermination(120)

    got = {r["event_id"]: r["tier"] for r in spark.read.parquet(out).collect()}
    assert {k: v for k, v in got.items() if k <= 2} == {0: "bronze", 1: "bronze", 2: "bronze"}
    assert {k: v for k, v in got.items() if k >= 3} == {3: "gold", 4: "gold", 5: "gold"}


def test_stream_stream_left_outer_join_emits_nulls_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join finality: signups with no click
    inside the 2-hour window must surface as null-padded rows — but
    ONLY once the watermark passes the window's upper bound. Run 1
    (availableNow) emits the inner matches and holds the unmatched
    signups in state; a later flush event advances the watermark and
    run 2 (same checkpoint) emits exactly the null rows. Final sink
    content equals the batch left-outer join over the phase-1 events
    — the state is bounded AND nothing is lost or duplicated."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "feed")
    os.makedirs(d)
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def write(name, rows, mtime_off):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        p = os.path.join(d, name)
        pq.write_table(tbl, p)
        now = time.time()
        os.utime(p, (now + mtime_off, now + mtime_off))

    H = dt.timedelta(hours=1)
    phase1 = [
        (1, t0, 101, "signup"),
        (2, t0 + H / 2, 101, "click"),        # match for signup 1
        (3, t0, 102, "signup"),               # never clicks -> null row
        (4, t0 + H, 103, "signup"),
        (5, t0 + 4 * H, 103, "click"),        # outside 2h window -> null row
    ]
    write("phase1.parquet", phase1, 0)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        # one file per micro-batch: outer rows are emitted in the batch
        # AFTER the one whose data advanced the watermark, so the flush
        # needs a successor batch to trigger eviction
        src = read_event_stream(spark, d, max_files_per_trigger=1)
        signups = (
            src.where(F.col("event_type") == "signup")
            .select(
                F.col("user_id").alias("s_user"),
                F.col("ts").alias("s_ts"),
                F.col("event_id").alias("s_id"),
            )
            .withWatermark("s_ts", "1 hour")
        )
        clicks = (
            src.where(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
                F.col("event_id").alias("c_id"),
            )
            .withWatermark("c_ts", "1 hour")
        )
        joined = signups.join(
            clicks,
            F.expr("s_user = c_user AND c_ts >= s_ts AND c_ts < s_ts + INTERVAL 2 HOURS"),
            "leftOuter",
        ).select("s_id", "c_id")
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    start()
    got1 = {(r.s_id, r.c_id) for r in spark.read.parquet(out).collect()}
    assert (1, 2) in got1  # the in-window match lands in run 1
    assert (3, None) not in got1  # outer rows cannot emit yet

    # watermark flush: far-future events on BOTH sides — the join's
    # effective watermark is the MIN across the two withWatermark
    # inputs (multipleWatermarkPolicy=min), so flushing only one side
    # would leave the global watermark pinned at phase-1 time forever;
    # availableNow's trailing no-data batch then performs the eviction
    write(
        "flush.parquet",
        [
            (99, t0 + dt.timedelta(days=10), 999, "click"),
            (98, t0 + dt.timedelta(days=10), 999, "signup"),
        ],
        5,
    )
    start()

    got = {(r.s_id, r.c_id) for r in spark.read.parquet(out).collect()}
    # phase-1 fully resolved: the in-window match, null rows for the
    # never-clicked and late-clicked signups, plus the flush pair's
    # own (immediate, watermark-independent) inner match
    assert got == {(1, 2), (3, None), (4, None), (98, 99)}
