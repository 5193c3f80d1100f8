"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed as a full action (count of the result) so the
measured time includes the complete distributed plan, not lazy setup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — join/agg, top-k, scalar agg,
# window, merge, set-op, event-time windows, temporal joins.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q9_product_profit",
    "q10_returned_items",
    "q18_large_orders",
    "q_distinct_agg",
    "q_dedup_latest",
    "q_window_running",
    "q_merge_upsert",
    "q_union_distinct",
    "q_incremental_watermark",
    "q_tumbling_window",
    "q_session_window",
    "q_asof_join",
    "q_range_join",
    "q_dedup_exact",
    "q_cosine_topk_exact",
    "q_token_topk",
]


def wait_for_idle(threshold: float = 1.0, max_wait_s: float = 600.0) -> float:
    """Block (bounded) until the 1-min load average drops below
    ``threshold``; return seconds actually waited.

    Three consecutive rounds of driver bench records absorbed ambient
    load (load_avg ~3 inflating totals 17-49%) that later idle-box
    re-runs disproved. Deferring the measurement is cheaper than
    adjudicating it afterward. Opt out with SPARK_GRAFT_BENCH_NOWAIT=1.
    """
    if os.environ.get("SPARK_GRAFT_BENCH_NOWAIT"):
        return 0.0
    waited = 0.0
    while waited < max_wait_s:
        try:
            load1 = os.getloadavg()[0]
        except OSError:
            return waited
        if load1 < threshold:
            return waited
        time.sleep(10.0)
        waited += 10.0
    return waited


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    waited_s = wait_for_idle()
    try:
        # Ambient load BEFORE the bench's own work inflates it — the
        # end-of-run load_avg field includes the bench itself.
        load_avg_start = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_avg_start = None
    from s3_rds_bq_airflow_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("engine-bench")
    queries = entrymod.queries()
    names = [n for n in HEADLINE if n in queries]
    # Warm the JVM and every table's file listing + parquet footer once
    # (fixed per-session costs, not attributable to whichever query
    # happens to touch a table first).
    from s3_rds_bq_airflow_spark.io.tables import TABLES, load_table

    for tbl in TABLES:
        try:
            load_table(spark, sf_dir, tbl).count()
        except Exception:
            pass
    queries[names[0]](spark, sf_dir).count()

    # Per-query: one untimed warm run (whole-stage-codegen JIT is a
    # per-plan, amortized-in-production cost), then the timed run —
    # steady-state throughput, full distributed action each time.
    # SPARK_GRAFT_BENCH_RUNS>1 takes the best of N timed runs (for
    # ambient-load adjudication); the default single run is the
    # driver contract.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1")))
    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        queries[name](spark, sf_dir).count()
        best = None
        for _ in range(n_runs):
            t0 = time.time()
            queries[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total = round(total + timings[name], 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    try:
        load_avg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_avg = None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "load_avg": load_avg,
                "load_avg_start": load_avg_start,
                "waited_s": round(waited_s, 1),
                "methodology": "per-query steady-state (2nd run timed; codegen warm)",
            }
        )
    )


if __name__ == "__main__":
    main()
