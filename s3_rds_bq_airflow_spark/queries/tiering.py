"""Driver-verification tier ordering derived from CORRECTNESS_r*.json.

The external driver verifies declared queries in iteration order and
caps its per-round batch at ~50 entries, so enumeration order is a
verification-evidence budget. Hand-maintained tier tuples rotted one
round at a time (each round needed a manual re-bookkeeping edit); this
module derives the ordering from the driver's own correctness records
instead, so the rotation is automatic:

1. **Unverified first** (default registration order): declared,
   oracle-backed queries with no fully-green driver row yet — new this
   round or previously red — surface at the head of the budget.
2. **Greens oldest-evidence-first**: queries whose latest fully-green
   row (rows+schema+hash all true) is N rounds old come before ones
   re-confirmed recently, so driver evidence keeps getting refreshed
   against current code instead of going stale.
3. **Rows-only queries dead last**: entries registered without an
   oracle (HLL++/KLL sketches — engine-specific internals that can
   never hash-match a DuckDB oracle by nature) never burn a
   hash-checkable slot.

Ties within a tier preserve registration order (stable).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

# CORRECTNESS_r{N}.json records live at the repo root, two levels above
# this package's queries/ subpackage.
_REPO_ROOT = Path(__file__).resolve().parents[2]


def load_latest_green(root: Path | None = None) -> dict[str, int]:
    """Map query name -> latest round with a fully-green driver row.

    A row is fully green iff rows_match AND schema_match AND hash_match.
    Unreadable or malformed record files are skipped (the ordering then
    simply treats their queries as unverified, which is the safe
    direction — they get verified sooner, not later).
    """
    latest: dict[str, int] = {}
    root = _REPO_ROOT if root is None else root
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            records = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(records, dict):
            continue
        for name, row in records.items():
            if not isinstance(row, dict):
                continue
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def derive_deprioritized(
    registered: list[str],
    oracle_backed: set[str],
    latest_green: dict[str, int],
    refresh: tuple[str, ...] = (),
) -> tuple[str, ...]:
    """Names to move to the END of iteration order, in that end-order.

    Everything except unverified oracle-backed queries is deprioritized:
    greens sorted oldest-evidence-first (stable on registration order),
    then rows-only (no-oracle) queries last.

    ``refresh`` names are treated as UNVERIFIED regardless of their
    green history — the hook for queries whose PLAN was rewritten this
    round (semantics unchanged, so the old hash-green row still
    describes the old plan, not the shipped one): they surface at the
    head of the budget for fresh driver evidence against the current
    code. The caller owns pruning the list once the evidence lands.
    """
    reg_index = {n: i for i, n in enumerate(registered)}
    refresh_set = set(refresh)
    greens = [
        n
        for n in registered
        if n in latest_green and n in oracle_backed and n not in refresh_set
    ]
    greens.sort(key=lambda n: (latest_green[n], reg_index[n]))
    rows_only = [n for n in registered if n not in oracle_backed]
    return tuple(greens + rows_only)
