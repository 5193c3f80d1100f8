"""Geo-bucketed exact nearest neighbor (scale upgrade of the
broadcast nested-loop 1-NN in ``queries/statsq.py``).

The reference dataset's geolocation semantics (zip -> lat/lng joins)
only ever need a nearest-location lookup against a small dimension —
fine to broadcast. This operator is the form that survives when the
reference dimension ISN'T broadcastable: a grid-cell equi-join.

Design (exact, not approximate):

1. Assign every point to a square cell of side ``cell`` (floor of
   lat/lng over the cell size) — one projection, no shuffle beyond
   the join's own.
2. Each left point probes its 3x3 neighbor cells; each right point
   sits in exactly one cell. The candidate join is an EQUI-join on
   cell id — Catalyst runs it as a shuffle-hash/sort-merge join on
   the cell key, never a cross product.
3. Geometry guarantee: if the best candidate lies within ``cell``
   (euclidean), every point that close must share the 3x3
   neighborhood (|dlat| <= cell and |dlng| <= cell), so the candidate
   is the TRUE nearest neighbor. Points whose best candidate is
   farther (or whose neighborhood was empty — sparse region) are
   UNRESOLVED: exactness is recovered by brute-forcing only those
   against the broadcast right side. In dense data the unresolved
   residue is a vanishing fraction; the worst case degrades to the
   old broadcast loop, never to a wrong answer.

At 100 TB: the hot path is one equi-join whose fan-out is bounded by
9 x (right points per cell); skewed cells behave like any skewed join
key (AQE skew split applies). No all-pairs stage exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

__all__ = ["grid_nearest_neighbor"]


def _dist2(alat: str, alng: str, blat: str, blng: str) -> Column:
    dlat = F.col(alat) - F.col(blat)
    dlng = F.col(alng) - F.col(blng)
    return dlat * dlat + dlng * dlng


def grid_nearest_neighbor(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_coords: tuple[str, str],
    right_coords: tuple[str, str],
    cell: float,
) -> DataFrame:
    """Exact 1-NN of each ``left`` row against ``right``.

    Returns ``left_key, nearest_<right_key>, dist2`` with the same
    (distance, key) tie-break as a brute-force window — bucketed and
    brute-force answers are bit-identical.
    """
    llat, llng = left_coords
    rlat, rlng = right_coords
    if {llat, llng} & {rlat, rlng}:
        raise ValueError("left/right coordinate column names must differ")
    if left_key == right_key:
        # same key name would make every post-join reference ambiguous
        raise ValueError("left_key and right_key column names must differ")
    lcell = left.select(
        left_key,
        llat,
        llng,
        F.floor(F.col(llat) / cell).alias("__lcx"),
        F.floor(F.col(llng) / cell).alias("__lcy"),
    )
    rcell = right.select(
        right_key,
        rlat,
        rlng,
        F.floor(F.col(rlat) / cell).alias("__rcx"),
        F.floor(F.col(rlng) / cell).alias("__rcy"),
    )
    # 3x3 probe fan-out on the (smaller-per-row) left projection.
    offsets = F.array(*[F.lit(o) for o in (-1, 0, 1)])
    probes = lcell.withColumn("__dx", F.explode(offsets)).withColumn(
        "__dy", F.explode(offsets)
    )
    cand = probes.join(
        rcell,
        (probes["__lcx"] + F.col("__dx") == rcell["__rcx"])
        & (probes["__lcy"] + F.col("__dy") == rcell["__rcy"]),
        "inner",
    ).withColumn("__d2", _dist2(llat, llng, rlat, rlng))
    w = W.partitionBy(left_key).orderBy(F.col("__d2"), F.col(right_key))
    best = (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(left_key, right_key, "__d2")
    )
    # Geometry guarantee holds only within one cell length.
    resolved = best.where(F.col("__d2") <= F.lit(cell * cell))
    unresolved = lcell.join(
        resolved.select(left_key), left_key, "left_anti"
    ).select(left_key, llat, llng)
    fallback = (
        unresolved.crossJoin(F.broadcast(right.select(right_key, rlat, rlng)))
        .withColumn("__d2", _dist2(llat, llng, rlat, rlng))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(left_key, right_key, "__d2")
    )
    return resolved.unionByName(fallback).select(
        left_key,
        F.col(right_key).alias(f"nearest_{right_key}"),
        F.col("__d2").alias("dist2"),
    )
