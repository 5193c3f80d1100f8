"""MERGE-upsert and dedup-latest (reference J1 + W1).

The reference's Meltano target emits a BigQuery
``MERGE target USING source ON keys WHEN MATCHED UPDATE / WHEN NOT
MATCHED INSERT`` (`target_bigquery/core.py:547-563`), preceded by a
ROW_NUMBER dedup of the source batch (`core.py:536-545`).

Spark-first: stock Spark SQL over parquet has no MERGE primitive, so
this composes it from a window dedup + full-outer join + coalesce —
shuffle-on-key both sides, no driver data movement. On Delta Lake the
same API would delegate to ``MERGE INTO`` (out of scope here: plain
parquet world).

Scale: both inputs shuffle-hash on the merge keys once. For a huge
target and small source the right physical shape is instead a
broadcast of the source + partition-overwrite of touched partitions —
noted as the Delta/iceberg path; the full-outer form is the portable
fallback.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    *,
    descending: bool = True,
) -> DataFrame:
    """Keep the newest row per key — ROW_NUMBER() = 1 over keys
    ordered by recency (reference W1). ``order_by`` should end with a
    unique column so results are deterministic."""
    ordering = [F.desc(c) if descending else F.asc(c) for c in order_by]
    w = W.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    *,
    source_order: Sequence[str] | None = None,
    tombstone_col: str | None = None,
) -> DataFrame:
    """Upsert ``source`` rows into ``target`` by ``keys``.

    Matched keys take ALL non-key columns from source (reference
    semantics: WHEN MATCHED UPDATE SET every column,
    `target_bigquery/core.py:552-560`); unmatched source rows are
    inserted; unmatched target rows pass through. If ``source_order``
    is given the source is first deduped to its latest row per key.

    ``tombstone_col`` enables CDC delete semantics (the reference's
    binlog path marks deletes with a non-null ``_sdc_deleted_at``,
    `tap_mysql/sync_strategies/binlog.py:45-53`): a source row whose
    tombstone column is non-null REMOVES the key instead of upserting
    it. Dedup-then-delete ordering means a delete followed by a later
    re-insert within one batch resolves to the re-insert (WHEN MATCHED
    AND deleted THEN DELETE, applied on the latest row image).
    """
    if source_order:
        source = dedup_latest(source, keys, source_order)
    if tombstone_col is not None:
        deletes = source.where(F.col(tombstone_col).isNotNull()).select(*keys)
        source = source.where(F.col(tombstone_col).isNull()).drop(tombstone_col)
        target = target.join(deletes, on=list(keys), how="left_anti")
    value_cols = [c for c in target.columns if c not in keys]
    # Presence marker, not coalesce: matched rows must take EVERY
    # source column including NULLs (WHEN MATCHED UPDATE SET every
    # column) — coalesce(__src_c, c) would keep the stale target value
    # whenever a CDC update sets a column to NULL.
    src = source.select(
        *keys,
        F.lit(True).alias("__src_present"),
        *[F.col(c).alias(f"__src_{c}") for c in value_cols],
    )
    joined = target.join(src, on=list(keys), how="full_outer")
    resolved = [
        F.when(F.col("__src_present"), F.col(f"__src_{c}")).otherwise(F.col(c)).alias(c)
        for c in value_cols
    ]
    return joined.select(*keys, *resolved)
