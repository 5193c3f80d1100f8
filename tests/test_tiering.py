"""Pin the derived driver-verification ordering rule (queries/tiering.py).

The driver verifies declared queries in iteration order with a ~50-slot
budget per round; the ordering is derived from CORRECTNESS_r*.json so
stale driver evidence rotates to the head automatically. These tests
pin the rule on synthetic records and sanity-check the live catalog.
"""

from __future__ import annotations

import json

from s3_rds_bq_airflow_spark.queries import tiering


def test_derive_rule_unverified_then_oldest_green_then_rows_only():
    registered = ["a", "b", "c", "d", "e", "sketch"]
    oracle_backed = {"a", "b", "c", "d", "e"}
    latest_green = {"b": 3, "c": 1, "e": 1}  # a,d unverified
    depri = tiering.derive_deprioritized(registered, oracle_backed, latest_green)
    # greens oldest-first (r1 before r3), registration-stable within a
    # round; rows-only dead last
    assert depri == ("c", "e", "b", "sketch")
    # iteration order = unverified first, then the deprioritized tail
    order = [n for n in registered if n not in set(depri)] + list(depri)
    assert order == ["a", "d", "c", "e", "b", "sketch"]


def test_red_row_does_not_count_as_green(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "good": {"rows_match": True, "schema_match": True, "hash_match": True},
                "red": {"rows_match": True, "schema_match": True, "hash_match": False},
            }
        )
    )
    latest = tiering.load_latest_green(tmp_path)
    assert latest == {"good": 1}


def test_latest_round_wins(tmp_path):
    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"q": green}))
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps({"q": green}))
    assert tiering.load_latest_green(tmp_path) == {"q": 4}


def test_malformed_record_file_is_skipped(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("not json {")
    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"q": green}))
    assert tiering.load_latest_green(tmp_path) == {"q": 2}


def test_live_catalog_ordering():
    """The real registry: greens are oldest-evidence-first and the two
    rows-only sketches are dead last; unverified (if any) lead."""
    import __spark_entry__ as entrymod

    from s3_rds_bq_airflow_spark.queries import _REFRESH_R12

    names = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    latest = tiering.load_latest_green()
    # plan-rewritten queries ride the unverified tier this round
    fresh = set(_REFRESH_R12)

    # rows-only sketches close the list
    rows_only = [n for n in names if n not in oracles]
    assert names[-len(rows_only):] == rows_only

    # among oracle-backed greens, latest-green rounds are non-decreasing
    green_rounds = [
        latest[n] for n in names if n in oracles and n in latest and n not in fresh
    ]
    assert green_rounds == sorted(green_rounds)

    # unverified (or refresh-flagged) oracle-backed queries all
    # precede every green one
    unverified_idx = [
        i
        for i, n in enumerate(names)
        if n in oracles and (n not in latest or n in fresh)
    ]
    green_idx = [
        i
        for i, n in enumerate(names)
        if n in oracles and n in latest and n not in fresh
    ]
    if unverified_idx and green_idx:
        assert max(unverified_idx) < min(green_idx)


def test_refresh_names_surface_at_head():
    """A refresh-flagged green is excluded from the deprioritized
    tuple (it stays in registration order at the head), everything
    else unchanged."""
    registered = ["a", "b", "c", "d"]
    oracles = {"a", "b", "c", "d"}
    latest = {"a": 3, "b": 5, "c": 4, "d": 6}
    base = tiering.derive_deprioritized(registered, oracles, latest)
    assert base == ("a", "c", "b", "d")
    got = tiering.derive_deprioritized(registered, oracles, latest, refresh=("b",))
    assert got == ("a", "c", "d")  # b no longer deprioritized
