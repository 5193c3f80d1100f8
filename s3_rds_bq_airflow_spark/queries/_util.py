"""Shared helpers for declared queries.

Cross-engine determinism conventions (Spark vs DuckDB oracle):

- Money/quantity aggregates are computed in DECIMAL (exact, order-
  independent) and the FINAL value is cast to DOUBLE — both engines
  then hold bit-identical float64, immune to partial-aggregation
  order. Never sum raw doubles across rows.
- Averages/ratios are derived as double division of those exact
  values — deterministic IEEE-754 on both sides.
- Dates/timestamps in output are cast to strings (second precision
  for the ns-precision events table) to dodge dtype/timezone
  renderings.
- Top-k orderings always carry a unique-key tie-break.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from ..io.tables import load_table

MONEY = "decimal(18,2)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def t_spread(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    *,
    max_bytes: int = 64 << 20,
    min_bytes: int = 256 << 10,
) -> DataFrame:
    """Load a table and round-robin it across the cluster when the file
    is tiny — for scans feeding HEAVY per-row compute only.

    A sub-``max_bytes`` single-file parquet table often carries ONE row
    group, so the scan — and every downstream per-row expression — runs
    in a single task no matter how many cores the cluster has
    (optimization guide §2.5, unsplittable input: "repartition
    immediately after the read"). The gate is pure file size: above
    ``max_bytes`` the data either splits naturally across row groups or
    the repartition would be a real shuffle of real payload, so
    production-scale scans are untouched (measured: spreading the
    600k-row lineitem scan REGRESSED q1/q5 at bench SF — the shuffle
    cost exceeds the win unless per-row compute dominates, so this
    helper is opt-in per query, not part of ``t``).

    ``min_bytes`` floor (round-12 advisor catch): below ~a quarter MB
    the whole table is a few thousand rows, the per-row compute win is
    nil, and the fan-out still pays a shuffle plus N task launches per
    query — pure overhead on the tiny-SF correctness runs. Measured on
    q_cosine_topk_exact at sf0.001 (190 KB, ~1k vectors): skipping the
    spread is neutral-to-faster there while sf0.1 (780 KB, the bench
    win) still spreads."""
    df = load_table(spark, sf_dir, name)
    try:
        nbytes = os.path.getsize(os.path.join(sf_dir, f"{name}.parquet"))
    except OSError:
        return df
    par = spark.sparkContext.defaultParallelism
    if par > 1 and min_bytes <= nbytes <= max_bytes:
        return df.repartition(par)
    return df


def _size_bytes(value: str) -> int:
    """Parse a Spark byte-size conf string ('10m', '10MB', '1048576b',
    plain digits, '-1') to bytes. Mirrors Spark's JavaUtils suffixes;
    unknown forms parse as -1 (treated as 'no threshold')."""
    s = value.strip().lower()
    mult = 1
    for suffix, factor in (
        ("tb", 1 << 40), ("t", 1 << 40),
        ("gb", 1 << 30), ("g", 1 << 30),
        ("mb", 1 << 20), ("m", 1 << 20),
        ("kb", 1 << 10), ("k", 1 << 10),
        ("b", 1),
    ):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], factor
            break
    try:
        return int(s) * mult
    except ValueError:
        return -1


def dim_outgrows_broadcast(spark: SparkSession, sf_dir: str, name: str) -> bool:
    """True when the planner would NOT auto-broadcast a scan of this
    table — the size probe behind the adaptive prefilter shapes in
    q5/q7/q10 (optimization guide §3.1).

    Compares the parquet file size against the session's
    ``spark.sql.autoBroadcastJoinThreshold`` — the same statistic the
    planner derives a pushed-down scan's sizeInBytes from (file bytes
    x fileCompressionFactor, default 1.0) — so the gate flips exactly
    where the dimension join stops broadcasting: data-size-adaptive,
    never tuned to a core count or a bench SF. A disabled threshold
    (-1) means nothing auto-broadcasts, so the prefilter shape is
    always right. Single-file tables only (the t_spread assumption);
    an unreadable path returns False (keep the simpler shape)."""
    try:
        nbytes = os.path.getsize(os.path.join(sf_dir, f"{name}.parquet"))
    except OSError:
        return False
    try:
        thr = _size_bytes(spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    except Exception:
        thr = 10 << 20  # stock default
    if thr < 0:
        return True
    return nbytes > thr


def dec(col: str | Column, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: str | Column, typ: str = MONEY) -> Column:
    """Exact decimal sum, surfaced as double."""
    return F.sum(dec(col, typ)).cast("double")


def ts_str(col: str | Column) -> Column:
    """Timestamp -> 'yyyy-MM-dd HH:mm:ss' string (second precision)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


def pair_salt_width(spark: SparkSession, max_width: int = 32) -> int:
    """Salt width for pair joins blocked on a handful-cardinality key.

    A pair self-join whose equi-key has only a handful of distinct
    values (lang, (nation, segment), ...) funnels each block's entire
    quadratic pair workload into ONE task — the round-8 straggler
    lesson (q_ngram_jaccard at sf10: one 45-minute task, 31 idle
    cores). Salting splits each block across this many tasks: side A
    takes ``pmod(hash(key), width)``, side B replicates across all
    ``width`` salt values, so every (a, b) pair is still emitted
    exactly once and only the LINEAR build side pays the replication.

    The width is the cluster's scheduling grain, not a data property:
    the largest power of two <= defaultParallelism, capped at
    ``max_width`` so the B-side replication factor stays bounded
    (round-8 advisor note — a fixed 32 replicated the build side 32x
    even where two cores were available). Output never depends on the
    width, only task granularity does.
    """
    par = max(1, spark.sparkContext.defaultParallelism)
    width = 1
    while width * 2 <= min(par, max_width):
        width *= 2
    return width


def bottom_k_by_md5(
    df: DataFrame,
    *,
    group_cols: tuple[str, ...],
    id_col: Column | str,
    k: int,
    salt_width: int | None = None,
) -> DataFrame:
    """Deterministic per-group bottom-``k`` rows by ``md5(id)`` — the
    `lpa_clique_fixture(node_cap=...)` cap discipline, made safe for
    handful-cardinality groups.

    A plain ROW_NUMBER cap shuffles each group to ONE task and sorts
    it there — the very skew it exists to prevent. This runs two
    phases instead: a local bottom-k within (group, salt) partitions
    (each holds ~1/width of the group), then a global bottom-k over
    the <= k*width survivors. Salt-INVARIANT by construction: every
    row of a group's true bottom-k is also in the bottom-k of its own
    salt slice, so phase 1 never drops a winner — the result equals
    the plain single-sort cap for ANY width, which is what lets a SQL
    oracle replay it as one ROW_NUMBER() <= k (pinned in
    tests/test_pandas_udaf.py). ``id_col`` must be unique per row
    (it is also the md5 tie-break). md5 of the decimal id string is
    portable across Spark and DuckDB."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(idc.cast("string"))
    if salt_width is None:
        salt_width = pair_salt_width(df.sparkSession)
    local = W.partitionBy(*group_cols, "__salt").orderBy(h.asc(), idc.asc())
    survivors = (
        df.withColumn("__salt", F.pmod(F.hash(idc), F.lit(salt_width)))
        .withColumn("__rk", F.row_number().over(local))
        .where(F.col("__rk") <= k)
        .drop("__rk", "__salt")
    )
    final = W.partitionBy(*group_cols).orderBy(h.asc(), idc.asc())
    return (
        survivors.withColumn("__rk", F.row_number().over(final))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
