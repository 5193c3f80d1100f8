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


# Pinned clean record for the driver's bench SF (sf0.1): round-6
# best-of-3 on an idle box at this commit (docs/BENCH_NOTES.md). The
# self-adjudication below compares against it.
CLEAN_RECORD_S = 9.422
CLEAN_RECORD_COMMIT = "3758220"
# A hot reading more than 15% over the record triggers the old-commit
# control; readings inside the band are normal variance.
HOT_THRESHOLD = 1.15
# Re-pin escape valve (round-11, codifying the round-9 prose
# criterion): when the box produces NO cool window for this many
# consecutive driver sessions (every recorded control_ratio >=
# HOT_THRESHOLD), the round-6 absolute record is stale-by-epoch and
# the adjudication re-pins to the best CONTROL-NORMALIZED reading of
# the hot streak — value * (CLEAN_RECORD_S / control_s), i.e. what
# HEAD would have read on the record's own box temperature. The
# normalization basis is recorded in the emitted JSON line.
REPIN_AFTER_HOT_SESSIONS = 3


def _driver_bench_history(repo: str) -> list[dict]:
    """Embedded bench JSON lines from the driver's BENCH_r*.json
    records (round order). Each driver record wraps our stdout in a
    "tail" field; unreadable records yield an empty marker dict so a
    gap conservatively breaks any hot streak."""
    import glob
    import re

    out: list[dict] = []
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        doc: dict = {}
        try:
            rec = json.loads(open(path).read())
            for ln in rec.get("tail", "").splitlines():
                ln = ln.strip()
                if ln.startswith("{") and '"metric"' in ln:
                    doc = json.loads(ln)
        except Exception:
            doc = {}
        m = re.search(r"r(\d+)", os.path.basename(path))
        doc["_round"] = int(m.group(1)) if m else -1
        out.append(doc)
    return out


def effective_record(repo: str) -> tuple[float, dict | None]:
    """(record_s, repin_basis): the record to adjudicate against.

    Walks the TRAILING consecutive driver sessions at sf0.1 whose
    control_ratio >= HOT_THRESHOLD (a cool session, a session that
    needed no control, or an unreadable record breaks the streak).
    Streak >= REPIN_AFTER_HOT_SESSIONS -> re-pin to the streak's best
    control-normalized reading; otherwise the pinned absolute record
    stands. Never raises — adjudication must not fail the bench."""
    try:
        history = _driver_bench_history(repo)
        streak: list[dict] = []
        for doc in reversed(history):
            ratio = doc.get("control_ratio")
            if (
                doc.get("sf") == 0.1
                and isinstance(ratio, (int, float))
                and ratio >= HOT_THRESHOLD
                and doc.get("control_s")
            ):
                streak.append(doc)
            else:
                break
        if len(streak) >= REPIN_AFTER_HOT_SESSIONS:
            normalized = [
                (
                    round(d["value"] * CLEAN_RECORD_S / d["control_s"], 3),
                    d["_round"],
                )
                for d in streak
            ]
            best_s, best_round = min(normalized)
            return best_s, {
                "from_round": best_round,
                "hot_streak": [d["_round"] for d in streak],
                "normalization": "value * CLEAN_RECORD_S / control_s",
                "pinned_record_s": CLEAN_RECORD_S,
            }
    except Exception:
        pass
    return CLEAN_RECORD_S, None


def run_noise_control(commit: str) -> float | None:
    """Bench the pinned clean-record commit in a throwaway worktree.

    The recurring failure mode of this box is host-side (microVM
    neighbor) slowdown invisible to guest metrics: load_avg < 1, ~0%
    steal, yet everything uniformly 1.5-3x slower (rounds 3-6,
    docs/BENCH_NOTES.md). The decisive adjudication is a CONTROL: if
    the UNCHANGED old code measures hot in the same window, the
    inflation is environmental, not a regression. Returns the control
    total in seconds, or None if the control could not run (shallow
    clone, missing commit, ...) — adjudication is best-effort and must
    never fail the bench itself.
    """
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    wt = tempfile.mkdtemp(prefix="bench_ctl_")
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_NOWAIT="1",
        SPARK_GRAFT_BENCH_NO_CONTROL="1",
    )
    try:
        subprocess.run(
            ["git", "worktree", "add", "--force", wt, commit],
            cwd=repo,
            check=True,
            capture_output=True,
        )
        out = subprocess.run(
            [sys.executable, "bench.py"],
            cwd=wt,
            env=env,
            capture_output=True,
            text=True,
            check=True,
            timeout=1800,
        )
        return float(json.loads(out.stdout.strip().splitlines()[-1])["value"])
    except Exception:
        return None
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=repo,
            check=False,
            capture_output=True,
        )


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
    doc = {
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
    # Self-adjudication: a hot reading at the driver's bench SF
    # carries its own host-noise proof. control_ratio ~ 1.0 means the
    # box is cool and a hot HEAD total is a real regression;
    # control_ratio tracking value/record means the UNCHANGED pinned
    # commit is equally inflated — environmental, not code.
    # SPARK_GRAFT_BENCH_RECORD_S overrides the pinned record (also the
    # forced-hot demo hook); SPARK_GRAFT_BENCH_NO_CONTROL=1 disables
    # (set inside control runs to terminate the recursion).
    record_env = os.environ.get("SPARK_GRAFT_BENCH_RECORD_S")
    if record_env:
        record_s = float(record_env)
    else:
        record_s, repin_basis = effective_record(
            os.path.dirname(os.path.abspath(__file__))
        )
        if repin_basis is not None:
            doc["record_s"] = record_s
            doc["record_repinned"] = True
            doc["repin_basis"] = repin_basis
    at_record_sf = sf_val == 0.1 or record_env is not None
    if (
        at_record_sf
        and total > HOT_THRESHOLD * record_s
        and not os.environ.get("SPARK_GRAFT_BENCH_NO_CONTROL")
    ):
        # Free this session's executor threads before the control JVM
        # starts — the control must not contend with the bench it
        # adjudicates.
        spark.stop()
        control_s = run_noise_control(CLEAN_RECORD_COMMIT)
        if control_s is not None:
            doc["control_s"] = control_s
            doc["control_commit"] = CLEAN_RECORD_COMMIT
            doc["control_sf"] = sf_val
            # control_ratio divides by the sf0.1 pinned record, so it
            # is only meaningful when the control itself ran at sf0.1
            # (a SPARK_GRAFT_BENCH_RECORD_S override at another SF
            # still records control_s — compare it to `value` directly
            # — but a ratio against the wrong-SF record would be
            # noise; round-7 advisor finding).
            if sf_val == 0.1:
                doc["control_ratio"] = round(control_s / CLEAN_RECORD_S, 3)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
