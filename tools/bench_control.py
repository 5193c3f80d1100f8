"""Controlled bench adjudication: HEAD vs a pinned clean-record commit.

The recurring failure mode of this environment is host-side (microVM
neighbor) slowdown that guest metrics cannot see: load_avg < 1, ~0%
CPU steal, yet every query uniformly 1.5-3x slower (rounds 3-6). The
decisive test is a CONTROL: bench the exact commit of the last clean
record in the same window — if the unchanged old code measures the
same inflated number, the inflation is environmental, not a
regression.

Usage:
    python tools/bench_control.py [<clean-commit>]   # default: the
        commit recorded in docs/BENCH_NOTES.md as the round's clean
        best-of-3 (falls back to 3758220, round 6's 9.422 s record)

Prints one JSON line: {"head_s": ..., "control_s": ..., "ratio": ...}
ratio ~ 1.0 => whatever both measured is the box, not the code.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

DEFAULT_CONTROL = "3758220"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cwd: str) -> float:
    env = dict(os.environ, SPARK_GRAFT_BENCH_NOWAIT="1")
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=cwd, env=env,
        capture_output=True, text=True, check=True,
    )
    return float(json.loads(out.stdout.strip().splitlines()[-1])["value"])


def main() -> None:
    control = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CONTROL
    wt = tempfile.mkdtemp(prefix="bench_control_")
    subprocess.run(
        ["git", "worktree", "add", "--force", wt, control],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        head_s = run_bench(REPO)
        control_s = run_bench(wt)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, check=False, capture_output=True,
        )
    print(
        json.dumps(
            {
                "head_s": head_s,
                "control_s": control_s,
                "control_commit": control,
                "ratio": round(head_s / control_s, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
