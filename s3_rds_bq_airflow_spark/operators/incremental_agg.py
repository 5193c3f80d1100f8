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


def incremental_join(
    spark: SparkSession,
    state_dir: str,
    *,
    on: Sequence[str],
    delta_a: DataFrame | None = None,
    delta_b: DataFrame | None = None,
) -> DataFrame:
    """Incremental JOIN-view maintenance (materialized equi-join).

    The delta-join identity: with accumulated sides A, B and new
    batches dA, dB, the join view J = A' >< B' updates as

        dJ = (dA >< B)  U  (A >< dB)  U  (dA >< dB)
        J' = J U dJ,   A' = A U dA,   B' = B U dB

    so each fold costs O(|delta| * fanout) join work plus appends —
    independent of how much history the view already holds, the same
    never-re-scan-history contract as ``incremental_aggregate``. This
    is what a stream-stream inner join's state store computes; here it
    is an explicit restartable batch operator with plain-parquet state
    (``a/``, ``b/``, ``j/`` under ``state_dir``). Deltas land as
    APPENDED parquet files — history is neither re-read nor
    re-written by a fold (an overwrite-and-swap would make every fold
    O(|history|) I/O and the maintenance quadratic). The trade: a
    fold is not a single atomic swap; a crash mid-fold can leave a
    partial delta, so restart protocols should re-fold from the last
    known-good batch (the ledger pattern, ``io/ledger.py``). At
    warehouse scale the accumulated sides should be written bucketed
    by the join key so the dA >< B probe co-locates without a full
    shuffle of B.

    Returns the full join view. Until BOTH sides have received rows
    the true join schema may be unknowable: with one side only, the
    returned (empty) frame has just that side's columns — capture the
    view for schema-dependent work only once both sides exist.

    Insert-only deltas (the reference's append-style ingest,
    bec-aws-bq/s3-to-rds.py); retractions are the CDC tombstone
    path (operators/merge.py) applied before the fold.

    **Deltas must be deterministic under re-evaluation.** Each delta
    DataFrame is evaluated more than once per fold (the delta-join
    write to ``j/``, then the side append to ``a//b/``); a
    nondeterministic delta — ``rand()``, a ``limit()`` without an
    order, a re-read of a source mutating mid-fold — would leave the
    join view inconsistent with the side state. Pre-materialize such
    deltas first (``df.localCheckpoint()`` or a parquet round-trip),
    the same caveat as a crash between the ``j/`` and side writes.
    """
    on = list(on)
    paths = {k: os.path.join(state_dir, k) for k in ("a", "b", "j")}
    state = {
        k: spark.read.parquet(p) if os.path.exists(p) else None
        for k, p in paths.items()
    }
    parts = []
    if delta_a is not None and state["b"] is not None:
        parts.append(delta_a.join(state["b"], on))
    if delta_b is not None and state["a"] is not None:
        parts.append(state["a"].join(delta_b, on))
    if delta_a is not None and delta_b is not None:
        parts.append(delta_a.join(delta_b, on))
    delta_j = None
    for p in parts:
        delta_j = p if delta_j is None else delta_j.unionByName(p)

    def _append(delta: DataFrame | None, path: str):
        # True append: only the delta's files are written; existing
        # state files are untouched (fold cost O(|delta|), not
        # O(|history|)).
        if delta is not None:
            delta.write.mode("append").parquet(path)

    # Write the join view FIRST: delta_j lazily references the a/ and
    # b/ file listings captured at read time, and appending the side
    # deltas below must not race ahead of materializing it.
    _append(delta_j, paths["j"])
    _append(delta_a, paths["a"])
    _append(delta_b, paths["b"])
    if os.path.exists(paths["j"]):
        return spark.read.parquet(paths["j"])
    # No joinable rows yet (folds so far touched one side only):
    # an empty view with the join schema, if both sides are known.
    if os.path.exists(paths["a"]) and os.path.exists(paths["b"]):
        return (
            spark.read.parquet(paths["a"])
            .limit(0)
            .join(spark.read.parquet(paths["b"]).limit(0), on)
        )
    one = paths["a"] if os.path.exists(paths["a"]) else paths["b"]
    return spark.read.parquet(one).limit(0)
