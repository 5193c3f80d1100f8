"""Rotation-head scale campaign runner (round-8/9 instrument).

Runs each named query through tools/compare.py as its OWN process
(cold session, strict oracle diff) against a scaled replica —
one-per-process so a single straggling query or oracle can be killed
by the per-query timeout without stalling the sweep. This is the
instrument that caught the q_ngram_jaccard per-language straggler in
round 8 (invisible at the sf0.1 gate) and adjudicated the
q_sequence_packing_greedy recursive-CTE oracle in round 9.

Usage:
    # first 50 = the driver's rotation head for the coming round
    python tools/campaign.py --sf /tmp/sf10 --head 50
    python tools/campaign.py --sf /tmp/sf10 --names q_foo q_bar
    python tools/campaign.py --sf /tmp/sf10 --head 50 \
        --log /tmp/r10_sf10_campaign.log --timeout 1500

Output log lines: the compare.py verdict line per query (OK/FAIL with
rows + seconds), or "TIMEOUT <name> (<limit>s)" when the per-query
cap fires (exit code 124 of the compare child itself — NOT of a
pipeline; a `timeout cmd | grep` pipeline reports grep's status and
silently swallows the 124, which is how round 9's first sweep lost a
timeout line).

--remaining LOG... derives the not-yet-campaigned set (round-9
verdict nit: the remainder was only reconstructible from prose, so a
sweep could double-run or silently skip rows): it prints every
catalog name WITHOUT a verdict line (OK/ok/FAIL/TIMEOUT/ENGINE, or an
explicit "COVERED <name> <provenance>" entry) in the given logs, one
per line, in catalog order — composable as
`--names $(python tools/campaign.py --remaining docs/sf10_campaign_coverage.log)`.
The committed coverage ledger is docs/sf10_campaign_coverage.log;
append each campaign's log to it when the campaign finishes.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# A line that assigns an sf10 verdict (or explicitly records coverage
# with provenance) to a query name.
_VERDICT = re.compile(r"^(?:OK|ok|FAIL|TIMEOUT|ENGINE|COVERED)\s+(\S+)")


def catalog_names() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as em

    return list(em.queries())


def head_names(n: int) -> list[str]:
    return catalog_names()[:n]


def covered_names(log_paths: list[str]) -> set[str]:
    covered: set[str] = set()
    for path in log_paths:
        with open(path) as fh:
            for line in fh:
                m = _VERDICT.match(line.strip())
                if m:
                    covered.add(m.group(1).rstrip(":(").rstrip(":"))
    return covered


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=None, help="scaled replica dir (tools/make_scale.py)")
    ap.add_argument("--head", type=int, default=0, help="run the first N catalog queries")
    ap.add_argument("--names", nargs="*", default=[], help="explicit query names")
    ap.add_argument("--timeout", type=int, default=1500, help="per-query seconds")
    ap.add_argument("--log", default=None, help="also append result lines here")
    ap.add_argument(
        "--remaining", nargs="+", metavar="LOG", default=None,
        help="print catalog names with no verdict in these logs, then exit",
    )
    args = ap.parse_args()

    if args.remaining is not None:
        covered = covered_names(args.remaining)
        for name in catalog_names():
            if name not in covered:
                print(name)
        return 0

    if args.sf is None:
        ap.error("--sf is required unless --remaining is given")
    names = args.names or head_names(args.head or 50)
    logf = open(args.log, "a") if args.log else None

    def emit(line: str) -> None:
        print(line, flush=True)
        if logf:
            logf.write(line + "\n")
            logf.flush()

    n_bad = 0
    for name in names:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "compare.py"),
                 "--sf", args.sf, name],
                cwd=REPO,
                capture_output=True,
                text=True,
                timeout=args.timeout,
            )
        except subprocess.TimeoutExpired:
            emit(f"TIMEOUT {name} ({args.timeout}s)")
            n_bad += 1
            continue
        verdict = [
            ln for ln in proc.stdout.splitlines()
            if ln.startswith(("OK", "FAIL", "ok", "??"))
        ]
        emit(verdict[0] if verdict else f"FAIL {name}: no verdict (rc={proc.returncode})")
        if not verdict or not verdict[0].startswith(("OK", "ok")):
            n_bad += 1
    emit(f"CAMPAIGN_DONE {len(names) - n_bad}/{len(names)} green")
    if logf:
        logf.close()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
