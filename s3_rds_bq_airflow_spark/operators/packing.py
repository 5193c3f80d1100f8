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
parallelizes per group (e.g. per source/shard); the per-group scan is
sequential by nature (each decision depends on the previous), which
is inherent to first-fit, not an implementation artifact.
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
) -> DataFrame:
    """First-fit-by-order with a HARD cap: within each group (in
    ``order_col`` order) a document joins the current pack unless
    that would push it over ``capacity`` — then a new pack starts.
    Documents heavier than ``capacity`` become singleton packs.
    Returns the input columns + ``pack_id`` (group-local)."""
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
