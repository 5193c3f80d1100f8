"""tools/campaign.py --remaining: the uncampaigned set is COMPUTED
from verdict logs (round-9 verdict nit — a hand-reconstructed
remainder can double-run or silently skip rows)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from campaign import covered_names  # noqa: E402


def test_covered_names_parses_all_verdict_shapes(tmp_path):
    log = tmp_path / "cov.log"
    log.write_text(
        "# comment line ignored\n"
        "OK   q_alpha (3 rows, 1.2s)\n"
        "ok   q_beta: rows-only (3 rows, 0.4s)\n"
        "FAIL q_gamma: values: 1 differing rows\n"
        "TIMEOUT q_delta (1200s)\n"
        "ENGINE q_epsilon (42 rows, 9.9s)\n"
        "COVERED q_zeta r8-head-campaign\n"
        "CAMPAIGN_DONE 5/6 green\n"
        "some prose mentioning q_not_covered\n"
    )
    got = covered_names([str(log)])
    assert got == {"q_alpha", "q_beta", "q_gamma", "q_delta", "q_epsilon", "q_zeta"}


def test_committed_ledger_covers_whole_catalog():
    """The committed coverage ledger must keep --remaining EMPTY: every
    catalog row has an sf10 verdict as of round 10. A new query makes
    this fail until it earns one — that is the point."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ledger = os.path.join(repo, "docs", "sf10_campaign_coverage.log")
    sys.path.insert(0, repo)
    from s3_rds_bq_airflow_spark.queries import all_queries

    covered = covered_names([ledger])
    missing = [n for n in all_queries() if n not in covered]
    assert not missing, (
        f"catalog rows without an sf10 campaign verdict: {missing} — "
        "run tools/campaign.py on them and append the log to the ledger"
    )
