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
