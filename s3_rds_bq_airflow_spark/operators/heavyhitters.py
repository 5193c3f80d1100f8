"""Two-pass exact heavy hitters with a Misra-Gries candidate pass.

The classic scale pattern for "which items exceed phi of the corpus"
when the distinct-item space is too large to groupBy outright:

- **Pass 1 (zero shuffle)**: every partition runs a Misra-Gries
  summary (Misra & Gries 1982) over its local rows in Arrow batches —
  ``k`` counters, decrement-on-overflow — and emits only its
  surviving candidate items. MG guarantees any item with local
  frequency > n_p/(k+1) survives; by pigeonhole, any GLOBALLY heavy
  item (count > N/(k+1)) is locally heavy in at least one partition,
  so the union of partition candidates is a SUPERSET of the true
  heavy hitters. Candidate volume is <= k per partition — tiny.
- **Pass 2 (bounded shuffle)**: exact recount restricted to the
  candidate set (broadcast semi-join, then a groupBy bounded by the
  candidate count), filtered by the EXACT integer threshold.

The final output is therefore EXACT and deterministic — identical
under any partitioning, row order, or engine — even though pass 1 is
approximate and partitioning-dependent: the sketch only prunes, the
threshold decision never trusts it. This is how a sketch family
becomes hash-checkable against a plain GROUP BY / HAVING oracle
(unlike HLL/KLL, whose outputs ARE the sketch estimates).

Python appears only in the MG loop, Arrow-batched via mapInPandas
with per-partition state carried across batches — never row-at-a-time
UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["heavy_hitters_two_pass"]


def _mg_candidates(k: int):
    """mapInPandas generator: one Misra-Gries summary per PARTITION
    (state carried across the partition's Arrow batches), emitting the
    surviving candidate items once at partition end."""

    def run(batches):
        import pandas as pd

        # Mergeable-summaries form (Agarwal et al. 2013): each Arrow
        # batch's exact value_counts is an error-free summary; merging
        # by counter addition then pruning to k entries — subtract the
        # (k+1)-th largest count from all, drop the non-positive —
        # keeps total undercount <= n_p/(k+1), which is exactly the MG
        # survival guarantee the candidate superset needs.
        counters: dict[str, int] = {}
        for pdf in batches:
            for item, cnt in pdf["item"].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > k:
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {i: c - sub for i, c in counters.items() if c > sub}
        yield pd.DataFrame({"item": list(counters.keys())})

    return run


def heavy_hitters_two_pass(
    df: DataFrame,
    item_col: str,
    *,
    inv_phi: int = 50,
    k: int | None = None,
) -> DataFrame:
    """Items whose exact count exceeds total/``inv_phi``; returns
    (item, n, total) with the threshold decided by exact integer
    comparison ``n * inv_phi > total`` (no float phi anywhere).

    ``k`` (MG counter budget, default 2*inv_phi) must be >= inv_phi
    for the superset guarantee; larger k only shrinks pass-2 work."""
    if k is None:
        k = 2 * inv_phi
    if k < inv_phi:
        raise ValueError(f"k={k} breaks the MG superset guarantee for inv_phi={inv_phi}")
    # cast to string up front: the sketch pass ships items through an
    # Arrow `item string` schema, and the recount must group the SAME
    # representation the sketch saw
    items = df.select(F.col(item_col).cast("string").alias("item"))
    cands = (
        items.mapInPandas(_mg_candidates(k), "item string")
        .distinct()
    )
    total = items.select(F.count(F.lit(1)).alias("total"))
    return (
        items.join(F.broadcast(cands), "item", "leftsemi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n") * inv_phi > F.col("total"))
        .select("item", "n", "total")
    )
