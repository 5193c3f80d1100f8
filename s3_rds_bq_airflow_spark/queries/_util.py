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

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..io.tables import load_table

MONEY = "decimal(18,2)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


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
