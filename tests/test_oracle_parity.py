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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
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
