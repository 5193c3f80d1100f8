"""Slowly Changing Dimension Type 2 (versioned dimension history).

The reference overwrite-loads dimensions (TRUNCATE-then-APPEND,
`rds-to-bq.py:287-294`) and loses history; its `_sdc_*` lineage
columns and MERGE machinery are exactly the ingredients of the
standard warehouse answer, SCD2: every change closes the current
version row and opens a new one, so any past state is queryable with
``valid_from <= t < valid_to``.

One batch apply = one shuffle of each side on the business key:

  changed   = updates joined to current rows where any tracked
              attribute differs
  closed    = current rows matched by a change, valid_to set
  opened    = changed + brand-new keys, valid_from = batch ts
  untouched = everything else, carried through

Pure DataFrame composition, idempotent per (batch ts): re-applying
the same batch yields the same table (no-op changes never open
versions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

HIGH_DATE = "9999-12-31 00:00:00"


def scd2_init(
    snapshot: DataFrame, *, valid_from: str | Column
) -> DataFrame:
    """Bootstrap a dimension history from a first snapshot."""
    vf = F.lit(valid_from) if isinstance(valid_from, str) else valid_from
    return snapshot.select(
        "*",
        vf.cast("timestamp").alias("valid_from"),
        F.lit(HIGH_DATE).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    attrs: Sequence[str],
    batch_ts: str,
) -> DataFrame:
    """Apply an update snapshot to an SCD2 dimension.

    ``dim``: columns key, attrs..., valid_from, valid_to, is_current.
    ``updates``: columns key, attrs... (current intended state).
    Rows whose tracked attributes are unchanged are left alone; real
    changes close the old version at ``batch_ts`` and open a new one.
    """
    ts = F.lit(batch_ts).cast("timestamp")
    upd = updates.select(
        F.col(key).alias("__u_key"),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
    )
    current = dim.where(F.col("is_current"))
    history = dim.where(~F.col("is_current"))

    joined = current.join(upd, current[key] == F.col("__u_key"), "full_outer")
    differs = F.lit(False)
    for a in attrs:
        differs = differs | ~(
            F.col(a).eqNullSafe(F.col(f"__u_{a}"))
        )

    # current rows with no change (or no update row for their key)
    unchanged = joined.where(
        F.col(key).isNotNull() & (F.col("__u_key").isNull() | ~differs)
    ).select(*dim.columns)
    # current rows superseded by a change -> close them
    closed = (
        joined.where(F.col(key).isNotNull() & F.col("__u_key").isNotNull() & differs)
        .select(
            *[F.col(c) for c in dim.columns if c not in ("valid_to", "is_current")],
            ts.alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
        .select(*dim.columns)
    )
    # new versions: changed keys + brand-new keys
    opened = (
        joined.where(
            F.col("__u_key").isNotNull() & (F.col(key).isNull() | differs)
        )
        .select(
            F.col("__u_key").alias(key),
            *[F.col(f"__u_{a}").alias(a) for a in attrs],
            ts.alias("valid_from"),
            F.lit(HIGH_DATE).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .select(*dim.columns)
    )
    return history.unionByName(unchanged).unionByName(closed).unionByName(opened)


def scd2_as_of(dim: DataFrame, ts: str) -> DataFrame:
    """Point-in-time view: the dimension exactly as it stood at ts."""
    t = F.lit(ts).cast("timestamp")
    return dim.where((F.col("valid_from") <= t) & (F.col("valid_to") > t)).drop(
        "valid_from", "valid_to", "is_current"
    )
