"""Schema evolution operator (ingest/evolve.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from s3_rds_bq_airflow_spark.ingest.evolve import (
    SchemaDriftError,
    evolve_schema,
    evolved_union,
)


def _st(*fields):
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


def test_new_and_missing_columns():
    cur = _st(("a", T.LongType()), ("b", T.StringType()))
    nxt = _st(("a", T.LongType()), ("c", T.DoubleType()))
    out = evolve_schema(cur, nxt)
    assert [f.name for f in out.fields] == ["a", "b", "c"]  # stable order
    assert out["b"].dataType == T.StringType()  # kept though absent in batch
    assert out["c"].dataType == T.DoubleType()


def test_numeric_widening_chain():
    cur = _st(("x", T.IntegerType()))
    assert evolve_schema(cur, _st(("x", T.LongType())))["x"].dataType == T.LongType()
    assert evolve_schema(cur, _st(("x", T.ByteType())))["x"].dataType == T.IntegerType()
    assert (
        evolve_schema(cur, _st(("x", T.DoubleType())))["x"].dataType == T.DoubleType()
    )


def test_decimal_int_widening_no_overflow():
    # decimal(5,0) x long widens to decimal(19,0) — returning the
    # narrow decimal unchanged would silently NULL overflowing longs.
    cur = _st(("x", T.DecimalType(5, 0)))
    assert evolve_schema(cur, _st(("x", T.LongType())))["x"].dataType == T.DecimalType(
        19, 0
    )
    # already-wide decimal stays put
    cur38 = _st(("x", T.DecimalType(38, 0)))
    assert evolve_schema(cur38, _st(("x", T.LongType())))["x"].dataType == T.DecimalType(
        38, 0
    )
    # mirrored (decimal in the batch)
    assert evolve_schema(_st(("x", T.IntegerType())), cur)["x"].dataType == T.DecimalType(
        10, 0
    )
    # fractional decimal x integer -> double (unchanged behavior)
    curf = _st(("x", T.DecimalType(10, 2)))
    assert evolve_schema(curf, _st(("x", T.LongType())))["x"].dataType == T.DoubleType()


def test_decimal_decimal_widening():
    out = evolve_schema(
        _st(("x", T.DecimalType(10, 2))), _st(("x", T.DecimalType(12, 4)))
    )
    assert out["x"].dataType == T.DecimalType(12, 4)
    out = evolve_schema(
        _st(("x", T.DecimalType(20, 0))), _st(("x", T.DecimalType(10, 4)))
    )
    # 20 integer digits + 4 fractional
    assert out["x"].dataType == T.DecimalType(24, 4)
    # At the precision-38 cap, integer digits win and scale gives way:
    # decimal(38,0) x decimal(10,4) must KEEP all 38 integer digits
    # (decimal(38,4) would silently NULL 35+-digit values).
    out = evolve_schema(
        _st(("x", T.DecimalType(38, 0))), _st(("x", T.DecimalType(10, 4)))
    )
    assert out["x"].dataType == T.DecimalType(38, 0)
    out = evolve_schema(
        _st(("x", T.DecimalType(38, 2))), _st(("x", T.DecimalType(38, 10)))
    )
    # 36 integer digits needed -> at most 2 fractional survive
    assert out["x"].dataType == T.DecimalType(38, 2)


def test_evolved_union_decimal_long_values_survive(spark):
    from decimal import Decimal

    big = 9_007_199_254_740_993  # > 2^53 and >> decimal(5,0)
    b1 = spark.createDataFrame(
        [(Decimal(1),)], _st(("x", T.DecimalType(5, 0)))
    )
    b2 = spark.createDataFrame([(big,)], _st(("x", T.LongType())))
    out = evolved_union([b1, b2])
    assert out.schema["x"].dataType == T.DecimalType(19, 0)
    vals = {int(r["x"]) for r in out.collect()}
    assert vals == {1, big}  # no silent NULLs


def test_incompatible_drift_rejected_or_coerced():
    cur = _st(("x", T.TimestampType()))
    nxt = _st(("x", T.BooleanType()))
    with pytest.raises(SchemaDriftError, match="incompatible drift"):
        evolve_schema(cur, nxt)
    out = evolve_schema(cur, nxt, coerce_to_string=True)
    assert out["x"].dataType == T.StringType()
    # String on either side always wins without the flag.
    assert (
        evolve_schema(_st(("x", T.StringType())), nxt)["x"].dataType == T.StringType()
    )


def test_evolved_union_backfills_and_widens(spark):
    b1 = spark.createDataFrame([(1, "a")], ["id", "name"])
    b2 = spark.createDataFrame(
        [(2.5, "b", 10)], ["id", "name", "score"]
    )  # id drifts long->double, score appears
    out = evolved_union([b1, b2])
    assert dict((f.name, f.dataType) for f in out.schema.fields) == {
        "id": T.DoubleType(),
        "name": T.StringType(),
        "score": T.LongType(),
    }
    rows = {r["name"]: r for r in out.collect()}
    assert rows["a"]["id"] == 1.0 and rows["a"]["score"] is None  # backfilled
    assert rows["b"]["score"] == 10


def test_evolved_union_rejects_conflict(spark):
    b1 = spark.createDataFrame([(True,)], ["flag"])
    b2 = spark.createDataFrame([(1.5,)], ["flag"])
    with pytest.raises(SchemaDriftError):
        evolved_union([b1, b2])
    coerced = evolved_union([b1, b2], coerce_to_string=True)
    assert coerced.schema["flag"].dataType == T.StringType()
    assert {r["flag"] for r in coerced.collect()} == {"true", "1.5"}
