"""Driver-gate replica: every declared query with an oracle must match
DuckDB on row count, column names, and order-insensitive values.

This is the same comparison `tools/compare.py` runs, as a pytest so
`pytest tests/ -x -q` keeps the whole catalog honest.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from compare import frame_rows  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def _lint_declared_schema(name, sdf):
    """Declared-output lint (round-2 q_approx_quantiles lesson): the
    driver's pandas canonicalizer crashes on Array/Map cells and
    hashes raw Decimal differently engine-to-engine, so no declared
    query may emit them. No whitelist — convert to scalar doubles or
    posexplode instead."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    bad = (ArrayType, MapType, DecimalType, StructType)

    def walk(dt):
        yield dt
        if isinstance(dt, StructType):
            for f in dt.fields:
                yield from walk(f.dataType)
        elif isinstance(dt, ArrayType):
            yield from walk(dt.elementType)
        elif isinstance(dt, MapType):
            yield from walk(dt.keyType)
            yield from walk(dt.valueType)

    for f in sdf.schema.fields:
        assert not any(isinstance(dt, bad) for dt in walk(f.dataType)), (
            f"{name}: declared output column {f.name!r} is {f.dataType} — "
            "Array/Map/Struct cells crash the driver canonicalizer and raw "
            "Decimal hash-mismatches (top-level or nested); emit scalar "
            "double/string columns"
        )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    frame = QUERIES[name](spark, sf_dir)
    _lint_declared_schema(name, frame)
    sdf = frame.toPandas()
    if name not in ORACLES:
        # rows-only contract: runs, deterministic schema
        assert sdf.shape[0] >= 0
        return
    odf = duck.execute(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), f"{name}: schema mismatch"
    assert len(sdf) == len(odf), f"{name}: rowcount {len(sdf)} != {len(odf)}"
    srows, orows = frame_rows(sdf), frame_rows(odf)
    mismatches = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first {mismatches[:1]}"
