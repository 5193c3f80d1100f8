"""Deterministic weighted domain mixing (training-data composition).

An LLM corpus is a weighted mixture over sources ("50% web, 25%
code, ..."). At 100 TB the sampler must be a pushdown-able FILTER —
stateless, reproducible, shuffle-free — not a rand() (not
reproducible across retries/partitionings) and not a stratified
shuffle (a full repartition just to throw rows away).

The engine's form: keep a row iff the first 6 hex chars of
``md5(key)`` fall below the source's rate threshold
(``rate * 16^6``, quantized to 1/16M ≈ 6e-8 — far below any
meaningful mixing precision). Every engine computes the same md5, so
the SAME rows are selected everywhere — the property that makes
mixtures debuggable and resumable. The filter evaluates per-row at
the scan: no shuffle, no state, prunes with the scan's other
predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["rate_threshold_hex", "weighted_mix"]


def rate_threshold_hex(rate: float) -> str:
    """rate in [0, 1] -> threshold string (row kept iff
    ``md5[:6] < threshold``, lexicographic — which equals numeric
    order for equal-length lowercase hex). rate 1.0 returns ``"g"``:
    above every hex character, so everything passes; ``"1000000"``
    would NOT work (lexicographic '1...' sorts below 'a...')."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate out of [0,1]: {rate}")
    n = round(rate * 16**6)
    return "g" if n >= 16**6 else format(n, "06x")


def weighted_mix(
    df: DataFrame,
    *,
    key_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Filter to the deterministic weighted mixture.

    ``rates`` maps group value -> sampling rate; unlisted groups use
    ``default_rate`` (0.0 = drop, the safe default for unknown
    domains). Pure column expressions — the condition is a CASE over
    the group column and one md5 per row.
    """
    hexpart = F.substring(F.md5(F.col(key_col).cast("string")), 1, 6)
    expr = F.lit(rate_threshold_hex(default_rate))
    for group, rate in sorted(rates.items()):
        expr = F.when(F.col(group_col) == group, F.lit(rate_threshold_hex(rate))).otherwise(expr)
    # rate 1.0 thresholds at "g", above every hex char -> keeps all.
    return df.where(hexpart < expr)
