"""Robustness probes for the driver contract, runnable standalone:

    python tools/robustness.py tz     # America/New_York session
    python tools/robustness.py tz2    # Asia/Kolkata (half-hour offset)
    python tools/robustness.py par    # local[2], 3 shuffle partitions
    python tools/robustness.py both   # tz + par
    python tools/robustness.py all    # tz + tz2 + par

Each probe builds a VANILLA SparkSession with the perturbed config and
re-checks every oracle-backed query against DuckDB at sf0.01. The
catalog must be bit-stable under session timezone and any parallelism
— these are the two knobs an external driver is most likely to hold
differently than our tuned session.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _run(conf: dict[str, str], master: str) -> list[tuple[str, str]]:
    import duckdb
    from pyspark.sql import SparkSession

    from compare import TABLES, frame_rows

    builder = SparkSession.builder.master(master)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, osql = em.queries(), em.oracle_sql()
    failures: list[tuple[str, str]] = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF).toPandas()
            if name in osql:
                odf = con.execute(osql[name]).df()
                assert sorted(sdf.columns) == sorted(odf.columns), "schema"
                assert frame_rows(sdf) == frame_rows(odf), "values"
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            failures.append((name, repr(ex)[:160]))
    spark.stop()
    return failures


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    rc = 0
    if mode in ("tz", "both", "all"):
        bad = _run({"spark.sql.session.timeZone": "America/New_York"}, "local[8]")
        print(f"TZ probe: {'OK' if not bad else bad}")
        rc |= bool(bad)
    if mode in ("tz2", "all"):
        # half-hour offset: breaks any bucket/epoch arithmetic that
        # assumed whole-hour zones (time-binned joins, windows)
        bad = _run({"spark.sql.session.timeZone": "Asia/Kolkata"}, "local[8]")
        print(f"TZ2 (half-hour offset) probe: {'OK' if not bad else bad}")
        rc |= bool(bad)
    if mode in ("par", "both", "all"):
        bad = _run({"spark.sql.shuffle.partitions": "3"}, "local[2]")
        print(f"Parallelism probe: {'OK' if not bad else bad}")
        rc |= bool(bad)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
