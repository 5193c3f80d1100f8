"""Engine-side-only query runner: time the Spark half of a declared
query without its DuckDB oracle.

The scale-campaign instrument (tools/campaign.py) runs the FULL
compare harness — Spark result + DuckDB oracle + strict diff — so a
campaign TIMEOUT only says the *harness* couldn't finish, not which
side is the cost. Every campaign adjudication so far (r8: the two
nearest-supplier rows + q_knn_join; r9: q_sequence_packing_greedy)
needed the engine-side number alone to attribute the timeout to a
brute-force closed-form oracle. This promotes that ad-hoc snippet to
a tool, per the campaign.py precedent.

Usage:
    python tools/engine_only.py --sf /tmp/sf10 q_haversine_nearest q_feature_hashing

Prints one line per query: `ENGINE <name> (<rows> rows, <sec>s)` —
wall time covers FULL materialization of every output column: a
`.count()` would let Catalyst prune expensive final projections
(q_jl_projection's 16 list_transform columns, q_feature_hashing's
per-token md5 — the round-9 advisor catch), understating engine cost
and misattributing slow campaign rows to the oracle. The action is a
single-pass `count + sum(xxhash64(struct(*cols)))` aggregate — the
hash consumes every column, matching what the compare harness
actually collects, while still returning the row count in one job.
Cold session per process like the campaign harness.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as em

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("engine-only")
        .getOrCreate()
    )
    qs = em.queries()
    rc = 0
    for name in args.names:
        if name not in qs:
            print(f"ENGINE {name}: unknown query")
            rc = 1
            continue
        t0 = time.monotonic()
        try:
            from pyspark.sql import functions as F

            df = qs[name](spark, args.sf)
            # xxhash64 over a struct of ALL columns defeats column
            # pruning — every output expression must be evaluated.
            # Summed in decimal: a long sum of 64-bit hashes overflows
            # under ANSI (Spark 4 default).
            row = df.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64(F.struct(*df.columns)).cast("decimal(38,0)")).alias("h"),
            ).collect()[0]
            n = row["n"]
        except Exception as exc:  # noqa: BLE001 - adjudication tool reports, not raises
            print(f"ENGINE {name}: FAILED {type(exc).__name__}: {exc}")
            rc = 1
            continue
        print(f"ENGINE {name} ({n} rows, {time.monotonic() - t0:.1f}s)", flush=True)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
