"""Local replica of the driver's correctness gate.

Runs every declared query's Spark DataFrame AND its DuckDB oracle SQL
on the same parquet tables, then compares row-count, schema (column
names), and order-insensitive values with STRICT string equality —
stricter than any value-hash the driver might use, so a pass here
should imply a pass there.

Usage:
    python tools/compare.py [--sf /root/testdata/sf0.001] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def canon(v) -> str:
    """Canonical string for a single cell value."""
    if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
        # The driver's pandas canonicalizer dies on list cells
        # (sort_values -> "unhashable type: 'list'", the round-2
        # q_approx_quantiles crash). Fail loudly here so the local
        # gate catches it before the driver does.
        raise TypeError(
            f"declared query emitted a container-typed cell ({type(v).__name__}): "
            "Array/Map outputs crash the driver canonicalizer — emit scalar columns"
        )
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:  # NaN
            return "NULL"
        return repr(v)
    if isinstance(v, Decimal):
        # Scale-SENSITIVE: 1.50 != 1.5. The driver's value hash is
        # type/scale-sensitive (q_math_funcs round-1 lesson), so the
        # local gate must be at least as strict. Declared queries
        # should avoid raw-decimal outputs entirely (cast to double
        # per queries/_util.py convention) — this branch existing at
        # all means a query leaked a decimal.
        return f"DEC:{v}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_rows(df) -> list[tuple]:
    """pandas DataFrame -> column-name-sorted, row-sorted canonical rows."""
    cols = sorted(df.columns)
    rows = [tuple(canon(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from s3_rds_bq_airflow_spark.session import get_spark

    # O(n)-output queries (e.g. q_nearest_supplier: one row per
    # supplier) overflow the stock 1g driver.maxResultSize when the
    # harness collects them for comparison at sf1/sf10 replica scale.
    # That is a COLLECTION limit of this local gate, not an engine
    # plan property — production sinks write distributed. 8g covers
    # the largest O(n) result at sf10 (~1.3 GiB serialized).
    spark = get_spark(
        "compare-oracle", extra_conf={"spark.driver.maxResultSize": "8g"}
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(queries)
    failures = []
    for name in names:
        if name not in queries:
            print(f"?? {name}: not in queries()")
            failures.append(name)
            continue
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"schema spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if not problems:
            try:
                srows, orows = frame_rows(sdf), frame_rows(odf)
            except TypeError as e:
                # container-typed cell (canon raises) — record this
                # query's FAIL and keep checking the rest
                problems.append(str(e))
            else:
                if srows != orows:
                    diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
                    problems.append(f"values: {len(diffs)} differing rows; first: spark={diffs[0][0]} oracle={diffs[0][1]}")
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            failures.append(name)
        else:
            print(f"OK   {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(names)-len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
