"""Dump `.explain("formatted")` for declared queries to files.

The optimization rounds' evidence contract: for each query whose plan
a round touches, commit `plans/r<N>/<query>_before.txt` and
`..._after.txt` so plan claims (Exchange counts, join strategies,
PushedFilters, BatchEvalPython nodes) are checkable without running
Spark.

Usage:
    python tools/dump_plans.py --sf /root/testdata/sf0.1 \
        --out plans/r11 --suffix _before q18_large_orders q7_nation_volume
    python tools/dump_plans.py --out plans/r11 --suffix _before --headline
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--headline", action="store_true", help="dump every bench.py HEADLINE query")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as em
    from s3_rds_bq_airflow_spark.session import get_spark

    names = list(args.names)
    if args.headline:
        import bench

        names = list(dict.fromkeys(bench.HEADLINE + names))
    if not names:
        ap.error("no query names given (or use --headline)")

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("dump-plans")
    qs = em.queries()
    rc = 0
    for name in names:
        if name not in qs:
            print(f"PLAN {name}: unknown query")
            rc = 1
            continue
        try:
            df = qs[name](spark, args.sf)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - evidence tool reports, not raises
            print(f"PLAN {name}: FAILED {type(exc).__name__}: {exc}")
            rc = 1
            continue
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"PLAN {name} -> {path}")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
