"""Sequence packing: group documents into training sequences of ~C
tokens (the step between tokenization and batch assembly).

Two forms, both deterministic:

- **Boundary packing** (`boundary_pack`, the default): documents in a
  stable order are cut into packs at cumulative-token boundaries —
  ``pack_id = floor((cumsum - w) / C)``. One window over the ordering
  key; fully SQL-expressible (the DuckDB oracle mirrors it exactly),
  no state, no Python. A pack can overshoot C by at most one
  document — the standard relaxation in data pipelines, where C is a
  target, not a hard limit (truncation happens at tokenization).
- **Greedy first-fit-by-order** (`greedy_pack`): the hard-cap form —
  a running total that RESETS when adding a document would exceed C
  (oversized documents get singleton packs). The reset makes it
  non-expressible as a plain window; it runs as ``applyInPandas``
  per salt group (Arrow-batched, linear scan per group) — use it
  when packs must never exceed C.

At 100 TB: boundary packing is a single window over a
range-partitioned ordering — embarrassingly scalable. Greedy packing
parallelizes per group; the per-group scan is sequential by nature
(each decision depends on the previous), which is inherent to
first-fit, not an implementation artifact. Because ``applyInPandas``
materializes each group as ONE in-memory pandas frame (unlike
iterator-based ``mapInPandas``), a handful-cardinality group key
(lang, source, ...) is an executor OOM at scale — the sharded gear
(``n_shards > 1``) bounds every group to ~1/n_shards of its rows via
a deterministic, oracle-replayable sub-key, at the cost of packs
never spanning shards (first-fit is order-heuristic anyway; sharding
changes WHICH packs form, not their hard-cap validity).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window as W, functions as F, types as T

__all__ = ["boundary_pack", "greedy_pack"]


def boundary_pack(
    df: DataFrame,
    *,
    capacity: int,
    weight_col: str,
    order_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign ``pack_id`` by cumulative-weight boundary within each
    group, documents taken in ``order_col`` order."""
    w = W.partitionBy(*group_cols).orderBy(order_col) if group_cols else W.orderBy(order_col)
    cum = F.sum(weight_col).over(w)
    return df.withColumn(
        "pack_id", F.floor((cum - F.col(weight_col)) / F.lit(capacity)).cast("long")
    )


_PACK_SCHEMA_SUFFIX = [
    T.StructField("pack_id", T.LongType()),
]


def greedy_pack(
    df: DataFrame,
    *,
    capacity: int,
    weight_col: str,
    order_col: str,
    group_cols: tuple[str, ...],
    n_shards: int = 1,
    shard_key: str | None = None,
) -> DataFrame:
    """First-fit-by-order with a HARD cap: within each group (in
    ``order_col`` order) a document joins the current pack unless
    that would push it over ``capacity`` — then a new pack starts.
    Documents heavier than ``capacity`` become singleton packs.
    Returns the input columns + ``pack_id`` (group-local).

    ``n_shards > 1`` is the SCALE gear: a deterministic sub-key
    ``pack_shard = shard_key % n_shards`` (``shard_key`` must name a
    non-negative integral column, e.g. a dense doc id — modulo is
    uniform there and trivially replayable in a SQL oracle) joins the
    grouping, so each pandas group holds ~1/n_shards of its group's
    rows and the per-task payload is bounded by CONFIG, not by data
    growth. ``pack_id`` is then local to (group, shard) and the
    output carries ``pack_shard``; size n_shards so group_rows /
    n_shards fits one task comfortably. ``n_shards=1`` is the
    single-walk proof gear (schema unchanged: no ``pack_shard``
    column) — equivalence with per-shard single walks is pinned in
    tests/test_packing.py."""
    if n_shards > 1:
        if shard_key is None:
            raise ValueError("greedy_pack: n_shards > 1 requires shard_key")
        # Folded non-negativity check (the temporal.py convention):
        # F.pmod is non-negative while a SQL oracle's `%` keeps the
        # sign, so a negative shard_key would be a SILENT parity break
        # — raise instead, riding the used expression so pruning
        # can't drop the check.
        key = F.col(shard_key).cast("long")
        df = df.withColumn(
            "pack_shard",
            F.when(
                key >= 0, F.pmod(key, F.lit(n_shards))
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"greedy_pack: shard_key {shard_key!r} must be "
                            "non-negative (pmod vs SQL % parity), got "
                        ),
                        F.coalesce(key.cast("string"), F.lit("NULL")),
                    )
                ).cast("long")
            ).cast("int"),
        )
        group_cols = (*group_cols, "pack_shard")
    out_schema = T.StructType(list(df.schema.fields) + _PACK_SCHEMA_SUFFIX)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        pack_ids, pid, total = [], 0, 0
        for wgt in pdf[weight_col]:
            if total > 0 and total + wgt > capacity:
                pid, total = pid + 1, 0
            pack_ids.append(pid)
            total += wgt
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        return pdf

    return df.groupBy(*group_cols).applyInPandas(pack, out_schema)
