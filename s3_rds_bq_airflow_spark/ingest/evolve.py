"""Schema evolution across ingest batches (SURVEY §1.3 Layer C tail).

The reference loads with ``autodetect=True`` on EVERY batch
(`rds-to-bq.py:287-294`) and lets BigQuery reconcile drift; Singer
targets similarly version the target schema per message batch. That
implicit behavior becomes an explicit, auditable operator here:

- new columns appear            -> added, NULL-backfilled for history
- columns disappear             -> kept, NULL-filled in the new batch
- a column's type widens        -> target widens (byte<short<int<long
                                   <double; anything -> string)
- a column's type conflicts     -> REJECTED by default (the silent
                                   autodetect failure mode this
                                   operator exists to prevent);
                                   ``coerce_to_string=True`` opts into
                                   the lossless string fallback

Pure projection/cast plans — evolution never rewrites existing data
files; history is re-read through the widened schema (parquet
readers apply the requested schema per file, so old files simply
surface NULL for columns they lack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["SchemaDriftError", "evolve_schema", "evolved_union"]


class SchemaDriftError(ValueError):
    """Incompatible column type drift between batches."""


# Widening lattice: t -> rank; a pair widens to the larger rank if
# both sit on the same chain, else (numeric x numeric) -> double.
_NUM_RANK: dict[type, int] = {
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 3,
    T.LongType: 4,
    T.FloatType: 5,
    T.DoubleType: 6,
}
_RANK_TYPE = {r: t for t, r in _NUM_RANK.items()}


# Decimal digits needed to hold any value of each integer rank
# (byte 3, short 5, int 10, long 19).
_INT_DIGITS = {1: 3, 2: 5, 3: 10, 4: 19}


def _widen_dec_int(dec: T.DecimalType, int_rank: int) -> T.DataType:
    """Decimal x integer widening. The evolved decimal must hold EVERY
    value of the integer type — returning ``dec`` unchanged would let
    ``_conform``'s cast silently NULL an overflowing batch (e.g. a
    Long batch cast to decimal(5,0))."""
    if dec.scale != 0:
        return T.DoubleType()
    return T.DecimalType(min(38, max(dec.precision, _INT_DIGITS[int_rank])), 0)


def _widen(a: T.DataType, b: T.DataType, *, coerce_to_string: bool) -> T.DataType:
    if a == b:
        return a
    ra, rb = _NUM_RANK.get(type(a)), _NUM_RANK.get(type(b))
    if ra is not None and rb is not None:
        return _RANK_TYPE[max(ra, rb)]()
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        # max integer digits + max scale holds every value of either.
        # At the precision-38 cap, SCALE gives way, never integer
        # digits: losing fractional digits rounds (visible, bounded),
        # losing integer digits would silently NULL overflowing
        # values — the exact failure class this widening exists to
        # prevent.
        scale = max(a.scale, b.scale)
        intd = max(a.precision - a.scale, b.precision - b.scale)
        scale = min(scale, 38 - intd)
        return T.DecimalType(intd + scale, scale)
    if isinstance(a, T.DecimalType) and rb is not None:
        return _widen_dec_int(a, rb) if rb <= 4 else T.DoubleType()
    if isinstance(b, T.DecimalType) and ra is not None:
        return _widen_dec_int(b, ra) if ra <= 4 else T.DoubleType()
    if T.StringType() in (a, b):
        return T.StringType()
    if coerce_to_string:
        return T.StringType()
    raise SchemaDriftError(f"incompatible drift: {a.simpleString()} vs {b.simpleString()}")


def evolve_schema(
    current: T.StructType,
    batch: T.StructType,
    *,
    coerce_to_string: bool = False,
) -> T.StructType:
    """The evolved target schema for ``current`` + one new batch.
    Column order: current's columns first (stable layout), then new
    columns in batch order — matching how warehouses append fields."""
    cur = {f.name: f.dataType for f in current.fields}
    new = {f.name: f.dataType for f in batch.fields}
    fields = [
        T.StructField(
            f.name,
            _widen(f.dataType, new[f.name], coerce_to_string=coerce_to_string)
            if f.name in new
            else f.dataType,
            True,
        )
        for f in current.fields
    ]
    fields += [
        T.StructField(f.name, f.dataType, True)
        for f in batch.fields
        if f.name not in cur
    ]
    return T.StructType(fields)


def _conform(df: DataFrame, target: T.StructType) -> DataFrame:
    cols = [
        F.col(f.name).cast(f.dataType).alias(f.name)
        if f.name in df.columns
        else F.lit(None).cast(f.dataType).alias(f.name)
        for f in target.fields
    ]
    return df.select(*cols)


def evolved_union(
    batches: list[DataFrame], *, coerce_to_string: bool = False
) -> DataFrame:
    """Union ingest batches under the evolved common schema: each
    batch is cast/NULL-padded to the final schema, then unioned by
    name. Raises ``SchemaDriftError`` on incompatible drift."""
    if not batches:
        raise ValueError("no batches")
    target = batches[0].schema
    for b in batches[1:]:
        target = evolve_schema(target, b.schema, coerce_to_string=coerce_to_string)
    out = _conform(batches[0], target)
    for b in batches[1:]:
        out = out.unionByName(_conform(b, target))
    return out
