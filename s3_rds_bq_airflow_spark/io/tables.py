"""Parquet table loaders for the test datasets.

The driver's synthetic TPC-H-ish tables live as one parquet file per
table under ``/root/testdata/sf*/``. At production scale these would
be directories of many parquet files (possibly partitioned); the same
``spark.read.parquet`` call covers both — Spark splits large files by
``spark.sql.files.maxPartitionBytes`` so a single 100 GB file still
parallelizes across the cluster.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor (region=5, nation=25 rows; supplier is ~1k per SF unit).
BROADCAST_TABLES = frozenset({"region", "nation"})


# Per-session cache of UNRESOLVED LOGICAL PLANS (lazy DataFrames), not
# data: building a table DataFrame re-reads parquet footers for schema
# inference and pays tens of py4j round-trips, which measured at
# 0.1-0.7 s per query at bench SF — driver-side planning cost, not
# computation (optimization guide §7.3). Every action on a cached
# frame still scans parquet; nothing materialized is held. Keyed by
# session and by the file's (mtime, size) so a rewritten table is
# re-planned. NOTE on the weak keying (round-12 advisor catch): the
# cached DataFrames hold a strong reference back to their session, and
# a WeakKeyDictionary keeps strong references to its VALUES — the
# documented value-refers-to-key caveat — so a STOPPED session's
# entries are NOT collectable; they live until the process exits. The
# weak dict only spares live sessions a __hash__ pin. That bound is
# fine for every consumer here (driver, bench, tests: a handful of
# sessions per process, entries are lazy plans a few KB each); a
# process churning many sessions should call `_PLAN_CACHE.clear()`
# (or pop its session) when stopping one.
_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Columns/filters prune+push down via Catalyst.

    The events table carries TIMESTAMP(NANOS) — Spark's reader has no
    nanosecond timestamp type, so nanos are read as long and truncated
    to microsecond timestamps (same truncation DuckDB applies casting
    TIMESTAMP_NS -> TIMESTAMP).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = None  # let spark.read raise its own error below
    per_session = _PLAN_CACHE.setdefault(spark, {})
    if key is not None and key in per_session:
        return per_session[key]
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf locked down — fall through and let the read try
    df = spark.read.parquet(path)
    ns_cols = [f.name for f in df.schema.fields if f.name == "ts" and f.dataType.simpleString() == "bigint"]
    for c in ns_cols:
        # Wall-clock (NTZ) semantics in ANY session timezone, matching
        # how Spark reads the other tables' naive parquet timestamps:
        # epoch-micros -> instant -> shift so the session render equals
        # the UTC wall clock -> drop the zone.
        df = df.withColumn(
            c,
            F.to_utc_timestamp(
                F.timestamp_micros(F.expr(f"{c} div 1000")), F.current_timezone()
            ).cast("timestamp_ntz"),
        )
    if key is not None:
        per_session[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so the SQL surface mirrors the DataFrame one."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
