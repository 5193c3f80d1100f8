"""Movement / maintenance / verification queries (SURVEY §2.1 S14-S15,
§2.3 J1, §2.4 A2-A3, §2.11-2.12).

These wrap the reusable operators in ``..operators`` so the driver's
correctness gate exercises the same code paths users would call.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ..operators.copy import full_copy, incremental_since
from ..operators.merge import merge_upsert
from ..operators.reconcile import count_reconciliation
from ..operators.retention import expire_partitions
from .registry import query
from ._util import dec, dsum, t, ts_str


@query(
    "q_merge_upsert",
    oracle="""
    WITH target AS (
        SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
        FROM orders
    ),
    src AS (
        -- product stays at scale 4: decimal scale-down casts round
        -- differently across engines (Spark HALF_UP vs DuckDB trunc)
        SELECT o_orderkey, o_orderstatus,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,2)) AS DECIMAL(22,4)) AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 100000000, 'N', CAST(1.00 AS DECIMAL(22,4))
        FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
           CAST(COALESCE(s.o_totalprice, t.o_totalprice) AS DOUBLE) AS o_totalprice
    FROM target t FULL JOIN src s ON t.o_orderkey = s.o_orderkey
    """,
)
def q_merge_upsert(spark, sf_dir):
    """J1 MERGE-upsert via the engine's window-dedup + full-outer
    composition: 10%-of-keys updated (price uplift), a disjoint key
    range inserted, everything else passes through."""
    orders = t(spark, sf_dir, "orders")
    target = orders.select("o_orderkey", "o_orderstatus", dec("o_totalprice").alias("o_totalprice"))
    updates = orders.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (dec("o_totalprice") * F.lit(1.1).cast("decimal(3,2)"))
        .cast("decimal(22,4)")
        .alias("o_totalprice"),
    )
    inserts = orders.where(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit("1.00").cast("decimal(22,4)").alias("o_totalprice"),
    )
    merged = merge_upsert(target, updates.unionByName(inserts), ["o_orderkey"])
    return merged.select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )


@query(
    "q_incremental_watermark",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY event_type
    """,
)
def q_incremental_watermark(spark, sf_dir):
    """S15 incremental high-watermark sync as a pushed-down predicate
    (replaces the reference's ORDER BY + per-row bookmark loop,
    `incremental.py:57-66`)."""
    sliced = incremental_since(t(spark, sf_dir, "events"), "ts", "2024-01-20 00:00:00")
    return sliced.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        ts_str(F.min("ts")).alias("first_ts"),
        ts_str(F.max("ts")).alias("last_ts"),
        dsum("value").alias("total_value"),
    )


@query(
    "q_full_copy_verified",
    oracle="""
    SELECT 'orders' AS table_name,
           COUNT(*) AS src_cnt,
           COUNT(*) AS dst_cnt,
           0 AS difference,
           1 AS match
    FROM orders
    """,
)
def q_full_copy_verified(spark, sf_dir):
    """S14+M8+A2 end-to-end: full copy with atomic overwrite, read the
    destination back, exact count reconciliation (the reference's
    transfer-verification loop, `rds-to-bq.py:304-313`)."""
    src = t(spark, sf_dir, "orders")
    dest = os.path.join(tempfile.mkdtemp(prefix="engine_copy_"), "orders")
    copied = full_copy(src, dest)
    rec = count_reconciliation({"orders": (src, copied)})
    return rec.select(
        "table_name",
        "src_cnt",
        "dst_cnt",
        F.col("difference").cast("long").alias("difference"),
        F.col("match").cast("long").alias("match"),
    )


@query(
    "q_tolerant_reconcile",
    oracle="""
    SELECT (SELECT COUNT(*) FROM orders) AS src_cnt,
           (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS dst_cnt,
           CAST((SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) >=
                0.9 * (SELECT COUNT(*) FROM orders) AS BIGINT) AS gate_passed
    """,
)
def q_tolerant_reconcile(spark, sf_dir):
    """A3 tolerant (>= 90%) reconciliation — the reference's safety
    gate before destructive cleanup (`delete-rds-after-load.py:310`)."""
    src_cnt = t(spark, sf_dir, "orders").agg(F.count(F.lit(1)).alias("src_cnt"))
    dst_cnt = t(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_orderkey").alias("dst_cnt")
    )
    return (
        src_cnt.crossJoin(dst_cnt)
        .select(
            "src_cnt",
            "dst_cnt",
            (F.col("dst_cnt") >= 0.9 * F.col("src_cnt")).cast("long").alias("gate_passed"),
        )
    )


@query(
    "q_partition_retention",
    oracle="""
    SELECT STRFTIME(o_orderdate, '%Y') AS p_year,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    GROUP BY p_year
    """,
)
def q_partition_retention(spark, sf_dir):
    """M7 tail: partition expiration by policy (the reference's
    ``partition_expiration_days`` on time partitioning,
    `target_bigquery/core.py:468-487`). Orders are laid out
    ``partitionBy(year)``, partitions strictly older than the cutoff
    are dropped as whole directories (no row rewrites — the only
    retention shape that works at 100 TB), and the surviving table is
    aggregated. The oracle filters the source by the same cutoff:
    equality proves expiry dropped exactly the right partitions."""
    o = t(spark, sf_dir, "orders").withColumn(
        "p_year", F.date_format("o_orderdate", "yyyy")
    )
    table_dir = os.path.join(
        tempfile.mkdtemp(prefix="engine_retention_"), "orders_by_year"
    )
    o.write.partitionBy("p_year").parquet(table_dir)
    expire_partitions(
        spark, table_dir, "p_year", cutoff="1998", granularity="year"
    )
    retained = spark.read.parquet(table_dir)
    return retained.groupBy(F.col("p_year").cast("string").alias("p_year")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec("o_totalprice")).cast("double").alias("sum_price"),
    )


@query(
    "q_hilbert_layout",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(MIN(l_partkey) AS BIGINT) AS min_partkey,
           CAST(MAX(l_suppkey) AS BIGINT) AS max_suppkey
    FROM lineitem
    WHERE l_orderkey % 25 = 0
    GROUP BY l_returnflag
    """,
)
def q_hilbert_layout(spark, sf_dir):
    """M7 layout, Hilbert variant (`operators/zorder.py`): rewrite a
    lineitem slice range-partitioned on the Hilbert code of
    (l_partkey, l_suppkey) — each output file a seam-free 2-D box for
    min/max data skipping — then read the layout back and aggregate.
    The oracle aggregates the source directly: equality proves the
    curve rewrite is a pure permutation (no row lost, duplicated, or
    mutated). Locality itself is pinned in tests/test_zorder.py."""
    from ..operators.zorder import hilbert_write

    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 25 == 0)
    path = os.path.join(tempfile.mkdtemp(prefix="engine_hilbert_"), "lineitem_hilbert")
    hilbert_write(
        li.withColumn("__hx", F.col("l_partkey") % 4096)
        .withColumn("__hy", F.col("l_suppkey") % 4096)
        .select(*li.columns, "__hx", "__hy"),
        path,
        cols=["__hx", "__hy"],
        n_files=8,
        bits=12,
    )
    laid = spark.read.parquet(path)
    return laid.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.min("l_partkey").cast("long").alias("min_partkey"),
        F.max("l_suppkey").cast("long").alias("max_suppkey"),
    )


@query(
    "q_format_matrix",
    oracle="""
    SELECT fmt,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           STRFTIME(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_orderdate,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    CROSS JOIN (SELECT UNNEST(['jsonl', 'orc']) AS fmt)
    WHERE o_orderkey % 10 = 0
    GROUP BY fmt
    """,
)
def q_format_matrix(spark, sf_dir):
    """Source/sink format matrix beyond parquet+CSV (`io/formats`):
    the same orders slice round-trips through ORC (columnar twin) and
    JSON Lines (the Singer wire shape, explicit schema — never
    inference), then aggregates per format. Equality with the
    plain-source oracle proves both paths are lossless, including
    timestamp text round-trip through JSON."""
    from ..io.formats import read_format, write_format

    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        dec("o_totalprice").alias("o_totalprice"),
        "o_orderdate",
    )
    base = tempfile.mkdtemp(prefix="engine_formats_")
    legs = []
    for fmt, name in (("json", "jsonl"), ("orc", "orc")):
        path = os.path.join(base, name)
        write_format(o, path, fmt)
        back = read_format(spark, path, fmt, schema=o.schema)
        legs.append(
            back.groupBy(F.lit(name).alias("fmt")).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("o_totalprice").cast("double").alias("sum_price"),
                F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias(
                    "min_orderdate"
                ),
                F.countDistinct("o_orderstatus").alias("n_statuses"),
            )
        )
    return legs[0].unionByName(legs[1])


@query(
    "q_scd2_asof",
    oracle="""
    WITH c AS (
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 4 = 0
    )
    SELECT 'mid' AS as_of, segment, COUNT(*) AS n_customers FROM (
        SELECT CASE WHEN c_custkey % 3 = 0 THEN 'SEG_B'
                    ELSE c_mktsegment END AS segment FROM c)
    GROUP BY segment
    UNION ALL
    SELECT 'late', segment, COUNT(*) FROM (
        SELECT CASE WHEN c_custkey % 6 = 0 THEN 'SEG_C'
                    WHEN c_custkey % 3 = 0 THEN 'SEG_B'
                    ELSE c_mktsegment END AS segment FROM c)
    GROUP BY segment
    """,
)
def q_scd2_asof(spark, sf_dir):
    """SCD Type 2 end-to-end, driver-checkable (`operators/scd`):
    bootstrap a customer dimension, apply two change batches (segment
    reassignments at T1 and T2), then read the history back AS OF two
    instants — between the batches and after both. The oracle states
    each point-in-time result in closed form; equality proves version
    closing, opening, and interval predicates all land exactly."""
    from ..operators.scd import scd2_apply, scd2_as_of, scd2_init

    c = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 4 == 0)
        .select("c_custkey", F.col("c_mktsegment").alias("segment"))
    )
    dim = scd2_init(c, valid_from="2026-01-01 00:00:00")
    upd1 = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, "SEG_B")
        .otherwise(F.col("segment"))
        .alias("segment"),
    )
    dim = scd2_apply(
        dim, upd1, key="c_custkey", attrs=["segment"], batch_ts="2026-02-01 00:00:00"
    )
    upd2 = upd1.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 6 == 0, "SEG_C")
        .otherwise(F.col("segment"))
        .alias("segment"),
    )
    dim = scd2_apply(
        dim, upd2, key="c_custkey", attrs=["segment"], batch_ts="2026-03-01 00:00:00"
    )
    mid = (
        scd2_as_of(dim, "2026-02-15 00:00:00")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("mid").alias("as_of"), "segment", "n_customers")
    )
    late = (
        scd2_as_of(dim, "2026-03-15 00:00:00")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("late").alias("as_of"), "segment", "n_customers")
    )
    return mid.unionByName(late)


@query(
    "q_incremental_rollup",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_incremental_rollup(spark, sf_dir):
    """Materialized-rollup maintenance, driver-checkable
    (`operators/incremental_agg`): orders arrive as three disjoint
    batches folded one at a time into persisted partial-aggregate
    state (count/sum/min/max per status, atomic swap per fold). The
    oracle is the one-shot aggregate over everything: equality proves
    state folding is exactly the partial-aggregation algebra —
    O(batch + state) per refresh, never a history rescan."""
    from ..operators.incremental_agg import incremental_aggregate

    o = t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", dec("o_totalprice").alias("o_totalprice")
    )
    state = os.path.join(tempfile.mkdtemp(prefix="engine_rollup_"), "state")
    final = None
    for r in (0, 1, 2):
        final = incremental_aggregate(
            spark,
            state,
            o.where(F.col("o_orderkey") % 3 == r),
            keys=["o_orderstatus"],
            aggs={
                "n_orders": ("o_orderkey", "count"),
                "sum_price_dec": ("o_totalprice", "sum"),
                "min_key": ("o_orderkey", "min"),
                "max_key": ("o_orderkey", "max"),
            },
        )
    return final.select(
        "o_orderstatus",
        "n_orders",
        F.col("sum_price_dec").cast("double").alias("sum_price"),
        F.col("min_key").cast("long").alias("min_key"),
        F.col("max_key").cast("long").alias("max_key"),
    )


@query(
    "q_ledger_ingest",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(n_nationkey AS BIGINT)) AS BIGINT) AS key_sum,
           CAST(3 AS BIGINT) AS files_round1,
           CAST(0 AS BIGINT) AS files_round2
    FROM nation
    """,
)
def q_ledger_ingest(spark, sf_dir):
    """Exactly-once file ingestion via the processed-file ledger (S8,
    the reference's move-after-load without mutating the source):
    nation is split into three CSV files in a landing dir; round 1
    ingests all three through the ledger, round 2 ingests NOTHING
    (every file already committed), and the staged rows equal the
    source exactly once — counts, key sum, and per-round file counts
    all closed-form."""
    from ..io.csv_source import read_csv_bronze
    from ..io.ledger import ingest_new_files

    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    base = tempfile.mkdtemp(prefix="engine_ledger_")
    landing = os.path.join(base, "landing")
    os.makedirs(landing)
    rows = n.collect()  # 25 rows — a dimension, driver-side by design
    for part in range(3):
        with open(os.path.join(landing, f"nation_{part}.csv"), "w") as f:
            f.write("nation key,Nation-Name,region key\n")
            for r in rows:
                if r["n_nationkey"] % 3 == part:
                    f.write(f"{r['n_nationkey']},{r['n_name']},{r['n_regionkey']}\n")
    staging = os.path.join(base, "staging")
    ledger = os.path.join(base, "ledger")

    def load(files):
        for fp in files:
            read_csv_bronze(spark, fp, audit=False).write.mode("append").parquet(staging)

    round1 = ingest_new_files(spark, landing, ledger, load, suffix=".csv")
    round2 = ingest_new_files(spark, landing, ledger, load, suffix=".csv")
    staged = spark.read.parquet(staging)
    return staged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("nation_key").cast("long")).alias("key_sum"),
        F.lit(len(round1)).cast("long").alias("files_round1"),
        F.lit(len(round2)).cast("long").alias("files_round2"),
    )


@query(
    "q_cdc_tombstones",
    oracle="""
    WITH target AS (
        SELECT o_orderkey, o_orderstatus FROM orders
    )
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 21 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus
    FROM target
    WHERE NOT (o_orderkey % 13 = 0 AND o_orderkey % 21 <> 0)
    """,
)
def q_cdc_tombstones(spark, sf_dir):
    """CDC delete semantics through the merge (the reference's binlog
    path marks deletes with non-null `_sdc_deleted_at`,
    `tap_mysql/sync_strategies/binlog.py:45-53`): one change batch
    carries updates (keys %21 -> status 'U') and tombstones (keys
    %13); where both apply, the LATER update wins (dedup-then-delete
    on the latest row image). The oracle states the surviving table
    in closed form — deleted keys gone, updated keys rewritten,
    everything else untouched."""
    orders = t(spark, sf_dir, "orders")
    target = orders.select("o_orderkey", "o_orderstatus")
    updates = orders.where(F.col("o_orderkey") % 21 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        F.lit(None).cast("timestamp").alias("_sdc_deleted_at"),
        F.lit(2).alias("_seq"),
    )
    deletes = orders.where(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_sdc_deleted_at"),
        F.lit(1).alias("_seq"),
    )
    merged = merge_upsert(
        target,
        updates.unionByName(deletes),
        ["o_orderkey"],
        source_order=["_seq"],
        tombstone_col="_sdc_deleted_at",
    )
    return merged.select("o_orderkey", "o_orderstatus").drop("_seq")


@query(
    "q_compaction",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem WHERE l_orderkey % 20 = 0
    GROUP BY l_returnflag
    """,
)
def q_compaction(spark, sf_dir):
    """Small-file compaction (`operators/storage.compact_parquet`):
    a lineitem slice is deliberately shattered into 64 tiny files
    (the streaming-ingest pathology), compacted back to target-sized
    files, and aggregated from the compacted copy. The oracle
    aggregates the source: equality proves the rewrite is a pure
    re-layout. The compacted file count is asserted inside the query
    (a wrong count raises, failing the driver run)."""
    from ..operators.storage import compact_parquet

    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 20 == 0).select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    base = tempfile.mkdtemp(prefix="engine_compact_")
    shattered = os.path.join(base, "shattered")
    compacted = os.path.join(base, "compacted")
    li.repartition(64).write.parquet(shattered)
    n_files = compact_parquet(spark, shattered, compacted)
    if n_files >= 64:
        raise AssertionError(f"compaction produced {n_files} files")
    return (
        spark.read.parquet(compacted)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


@query(
    "q_incremental_join",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_incremental_join(spark, sf_dir):
    """Materialized JOIN-view maintenance, driver-checkable
    (`operators/incremental_agg.incremental_join`): orders arrive as
    three batches and customers as two, interleaved, each fold
    computing only the delta join dA><B U A><dB U dA><dB and
    appending — history is never re-joined. The oracle is the
    one-shot join over everything: equality proves the delta-join
    algebra is exact under ANY interleaving of side arrivals
    (including folds where one side's delta is absent). Final state
    is aggregated per market segment with exact decimal sums."""
    from ..operators.incremental_agg import incremental_join

    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderkey",
        dec("o_totalprice").alias("o_totalprice"),
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    state = os.path.join(tempfile.mkdtemp(prefix="engine_incjoin_"), "state")
    folds = [
        dict(delta_b=cust.where(F.col("c_custkey") % 2 == 0)),
        dict(delta_a=orders.where(F.col("o_orderkey") % 3 == 0)),
        dict(
            delta_a=orders.where(F.col("o_orderkey") % 3 == 1),
            delta_b=cust.where(F.col("c_custkey") % 2 == 1),
        ),
        dict(delta_a=orders.where(F.col("o_orderkey") % 3 == 2)),
    ]
    view = None
    for kw in folds:
        view = incremental_join(spark, state, on=["c_custkey"], **kw)
    return view.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").cast("double").alias("sum_price"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )


# Snapshot-diff fixture: deterministic mutations of the orders table
# (removed / changed / added slices) so the expected diff is closed-
# form and identical in both engines.
_DIFF_REMOVED_MOD = 37
_DIFF_CHANGED_MOD = 11
_DIFF_ADDED_MOD = 53
_DIFF_ADDED_SHIFT = 100000000


@query(
    "q_snapshot_diff",
    oracle=f"""
    WITH a AS (
        SELECT o_orderkey AS k,
               MD5(CAST(o_orderkey AS VARCHAR) || '|' ||
                   CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
                   CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
                   || '|' || strftime(o_orderdate, '%Y-%m-%d')) AS h
        FROM orders
    ),
    b_rows AS (
        SELECT o_orderkey AS k, o_custkey, o_orderstatus,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   + CASE WHEN o_orderkey % {_DIFF_CHANGED_MOD} = 0
                          THEN 100 ELSE 0 END AS cents,
               strftime(o_orderdate, '%Y-%m-%d') AS d
        FROM orders WHERE o_orderkey % {_DIFF_REMOVED_MOD} <> 0
        UNION ALL
        SELECT o_orderkey + {_DIFF_ADDED_SHIFT}, o_custkey, o_orderstatus,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT),
               strftime(o_orderdate, '%Y-%m-%d')
        FROM orders WHERE o_orderkey % {_DIFF_ADDED_MOD} = 0
    ),
    b AS (
        SELECT k, MD5(CAST(k AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
                      || '|' || o_orderstatus || '|' ||
                      CAST(cents AS VARCHAR) || '|' || d) AS h
        FROM b_rows
    )
    SELECT COALESCE(a.k, b.k) AS o_orderkey,
           CASE WHEN b.k IS NULL THEN 'removed'
                WHEN a.k IS NULL THEN 'added'
                ELSE 'changed' END AS change_type
    FROM a FULL OUTER JOIN b ON a.k = b.k
    WHERE a.k IS NULL OR b.k IS NULL OR a.h <> b.h
    """,
)
def q_snapshot_diff(spark, sf_dir):
    """Row-level snapshot diff — the reconciliation primitive behind
    CDC validation and warehouse audit (the reference's A2/A3 count
    reconciliation, `rds-to-bq.py`, upgraded from "are the counts
    equal" to "WHICH rows differ and how"): full-outer join of two
    snapshots on the primary key comparing a canonical row hash,
    classifying every difference as added / removed / changed.

    The row hash concatenates key columns with doubles pre-quantized
    to integer cents (raw double->string casts format differently
    across engines) and dates rendered at day precision — the same
    canonicalization discipline as the driver's own value hash.

    Scale shape: one hash-partitioned join on the PK; both sides
    shuffle once (at 100 TB, snapshots stored bucketed by PK diff
    with ZERO exchange — see operators/storage bucketing), the hash
    collapses arbitrary row width to 32 bytes before the shuffle, and
    unchanged rows (the overwhelming majority) are filtered at the
    join, so output is proportional to the CHANGE volume, not the
    table."""
    orders = t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")

    def row_hash(key, cents_col):
        return F.md5(
            F.concat_ws(
                "|",
                key.cast("string"),
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                cents_col.cast("string"),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
            )
        )

    a = orders.select(
        F.col("o_orderkey").alias("k"), row_hash(F.col("o_orderkey"), cents).alias("h")
    )
    changed_cents = cents + F.when(
        F.col("o_orderkey") % _DIFF_CHANGED_MOD == 0, 100
    ).otherwise(0)
    b = (
        orders.where(F.col("o_orderkey") % _DIFF_REMOVED_MOD != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            row_hash(F.col("o_orderkey"), changed_cents).alias("h"),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % _DIFF_ADDED_MOD == 0).select(
                (F.col("o_orderkey") + _DIFF_ADDED_SHIFT).alias("k"),
                row_hash(F.col("o_orderkey") + _DIFF_ADDED_SHIFT, cents).alias("h"),
            )
        )
    )
    ab = a.select(F.col("k").alias("ak"), F.col("h").alias("ah")).join(
        b.select(F.col("k").alias("bk"), F.col("h").alias("bh")),
        F.col("ak") == F.col("bk"),
        "full_outer",
    )
    return (
        ab.where(
            F.col("ak").isNull()
            | F.col("bk").isNull()
            | (F.col("ah") != F.col("bh"))
        )
        .select(
            F.coalesce("ak", "bk").alias("o_orderkey"),
            F.when(F.col("bk").isNull(), "removed")
            .when(F.col("ak").isNull(), "added")
            .otherwise("changed")
            .alias("change_type"),
        )
    )


_BKT_N = 8


@query(
    "q_bucketed_join",
    oracle="""
    SELECT o.o_orderstatus, l.l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM (SELECT * FROM orders WHERE o_orderkey % 2 = 0) o
    JOIN (SELECT * FROM lineitem WHERE l_orderkey % 2 = 0) l
      ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus, l.l_returnflag
    """,
)
def q_bucketed_join(spark, sf_dir):
    """Shuffle-free co-located join via bucketed storage (SURVEY M7's
    clustering tier, the Hive/Iceberg bucketing contract): both sides
    written `bucketBy(8, key)` + `sortBy(key)` as managed tables, so
    the join compiles with ZERO Exchange — the property is ASSERTED
    inside the query (shuffle_count == 0 raises on regression, so the
    driver run itself would go red if bucketing ever stopped lining
    up).

    This is THE 100 TB posture for repeated fact-fact joins: pay the
    bucketed write once, then every subsequent join/aggregate on the
    bucket key is exchange-free regardless of table size. The oracle
    is the plain join on the same slices — values prove the bucketed
    re-layout is semantics-preserving."""
    from ..plans.inspect import shuffle_count

    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 2 == 0)
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 2 == 0)
    # External tables at a fresh temp location: bucket METADATA needs a
    # catalog entry (plain .parquet() writes lose it), but a managed
    # table's warehouse dir would collide across driver sessions.
    base = tempfile.mkdtemp(prefix="engine_bkt_")
    spark.sql("DROP TABLE IF EXISTS engine_bkt_orders")
    spark.sql("DROP TABLE IF EXISTS engine_bkt_lineitem")
    (
        o.write.mode("overwrite")
        .option("path", os.path.join(base, "orders"))
        .bucketBy(_BKT_N, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("engine_bkt_orders")
    )
    (
        li.write.mode("overwrite")
        .option("path", os.path.join(base, "lineitem"))
        .bucketBy(_BKT_N, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("engine_bkt_lineitem")
    )
    ob = spark.table("engine_bkt_orders")
    lb = spark.table("engine_bkt_lineitem")
    joined = ob.join(lb, ob["o_orderkey"] == lb["l_orderkey"])
    n_shuffles = shuffle_count(joined)
    if n_shuffles != 0:
        raise AssertionError(
            f"bucketed join compiled with {n_shuffles} exchanges (want 0)"
        )
    return joined.groupBy("o_orderstatus", "l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice").alias("revenue"),
    )


@query(
    "q_partition_checksums",
    oracle="""
    WITH rh AS (
        SELECT CAST(strftime(o_orderdate, '%Y') AS INT) AS yr,
               CAST('0x' || substr(md5(
                   CAST(o_orderkey AS VARCHAR) || '|' ||
                   CAST(o_custkey AS VARCHAR) || '|' ||
                   o_orderstatus || '|' ||
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '|' ||
                   o_orderpriority
               ), 1, 15) AS BIGINT) AS h
        FROM orders
    )
    SELECT yr, COUNT(*) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS checksum
    FROM rh GROUP BY yr
    """,
)
def q_partition_checksums(spark, sf_dir):
    """Partition-level content checksums — reconciliation at 100 TB
    without moving data (the scale form of the reference's
    count-and-compare verification tier): each row canonicalizes to a
    pipe-joined string (money through DECIMAL so both engines render
    identically, timestamps at second precision), hashes to a 60-bit
    md5 integer, and per-partition (order year) the checksum is the
    XOR-fold — order-independent, merge-able, and a single long per
    partition to ship to the other side. A mismatch localizes
    repair to ONE partition instead of a full-table diff
    (q_snapshot_diff is the row-level follow-up for the flagged
    partition).

    One scan, one small aggregate; XOR makes the fold commutative/
    associative so any partitioning computes the same checksum."""
    o = t(spark, sf_dir, "orders")
    row = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        dec("o_totalprice").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.col("o_orderpriority"),
    )
    h = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("long")
    return (
        o.select(F.year("o_orderdate").alias("yr"), h.alias("h"))
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("CAST(bit_xor(h) AS BIGINT)").alias("checksum"),
        )
    )
