"""Skew mitigation: salted aggregation and salted join.

At 100 TB a handful of heavy-hitter keys (one mega-customer, one
default enum value) turn a hash shuffle into a single straggler task.
Two standing remedies, both pure DataFrame composition:

- **Salted two-phase aggregation**: shuffle on (key, salt) first —
  heavy keys spread over ``n_salt`` reducers — then combine partials
  by key. Works for any associative/commutative aggregate. (Spark's
  map-side partial aggregation reduces input volume but cannot split
  a heavy REDUCE key; salting does.)

- **Salted join**: the skewed probe side gets a deterministic salt in
  [0, n); the build side is replicated n times, once per salt value;
  the join key becomes (key, salt). Build-side rows multiply by n —
  use only when the build side is small-ish but too big/skew-prone to
  broadcast outright.

AQE's skew-join splitting (enabled in ``session.get_spark``) handles
moderate skew automatically at runtime; explicit salting is the
deterministic tool for pathological keys and for aggregations, which
AQE does not re-balance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# Aggregates that decompose into (partial, combine) with the same
# function — enough for the engine's declared surface.
_ASSOCIATIVE = {"sum": F.sum, "min": F.min, "max": F.max}


def _salt(cols: Sequence[str], n_salt: int) -> Column:
    """Deterministic per-row salt: hash of the full row's listed
    columns — stable under task retries (rand() is not)."""
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salt))


def salted_groupby(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salt: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, min, max, count}. Phase 1 aggregates by (keys..., salt);
    phase 2 combines by keys (counts combine via sum).
    """
    salt_cols = list(salt_cols or df.columns)
    salted = df.withColumn("__salt", _salt(salt_cols, n_salt))
    partial_exprs, final_exprs = [], []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn in _ASSOCIATIVE:
            agg_fn = _ASSOCIATIVE[fn]
            partial_exprs.append(agg_fn(col).alias(f"__p_{out}"))
            final_exprs.append(agg_fn(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-associative aggregate: {fn}")
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    n_salt: int = 16,
    how: str = "inner",
    left_salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: salt the (skewed) left side, explode
    the right side across all salt values, join on (key, salt).

    Only left-preserving join types are valid: the right side is
    replicated ``n_salt`` times, so right/full joins would emit
    duplicate right rows.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join cannot preserve the replicated right side: how={how!r}")
    lx = left.withColumn("__salt", _salt(list(left_salt_cols or left.columns), n_salt))
    rx = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return lx.join(rx, on=[on, "__salt"], how=how).drop("__salt")
