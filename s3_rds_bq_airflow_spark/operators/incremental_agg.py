"""Incremental aggregate maintenance (materialized rollups).

The 100 TB pattern for standing dashboards/rollups: never re-scan
history — store PARTIAL aggregates per key and fold each new batch in:

    state' = combine_by_key(state ∪ partial(batch))

Any associative/commutative aggregate decomposes this way (sum, count,
min, max — and averages as sum+count finalized at read time). Each
update touches O(|batch| + |state|) rows, independent of total
history. This is also exactly what a streaming aggregation's state
store does; here it is an explicit, restartable batch operator with
plain-parquet state (the reference's closest construct is its
run-metadata upsert, `supabase-bq.py:216-235`).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.atomic import swap_directory

_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


def _partial(df: DataFrame, keys: Sequence[str], aggs: dict[str, tuple[str, str]]) -> DataFrame:
    exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            exprs.append(F.count(F.lit(1)).alias(out))
        elif fn in _FNS:
            exprs.append(_FNS[fn](col).alias(out))
        else:
            raise ValueError(f"non-associative aggregate: {fn}")
    return df.groupBy(*keys).agg(*exprs)


def _combine(df: DataFrame, keys: Sequence[str], aggs: dict[str, tuple[str, str]]) -> DataFrame:
    exprs = []
    for out, (_col, fn) in aggs.items():
        combine_fn = F.sum if fn in ("count", "sum") else _FNS[fn]
        exprs.append(combine_fn(out).alias(out))
    return df.groupBy(*keys).agg(*exprs)


def incremental_aggregate(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    *,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold one batch into the materialized aggregate at
    ``state_path`` (atomic swap), returning the updated state."""
    update = _partial(batch, keys, aggs)
    if os.path.exists(state_path):
        state = spark.read.parquet(state_path)
        merged = _combine(state.unionByName(update), keys, aggs)
    else:
        merged = update
    tmp = state_path.rstrip("/") + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    swap_directory(tmp, state_path)
    return spark.read.parquet(state_path)
