"""Item-item CF recent-N cap: the pair-fanout bound is a tested code
path, not a docstring promise.

A single power user with a huge purchase history is the scale failure
mode of co-occurrence pairing (one 10^5-item user -> 10^10 pairs from
one key on a 100 TB event log). These tests plant exactly that user
and prove the default gear bounds the pairing while the capped and
uncapped gears agree whenever histories fit under the cap.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.queries.eventsops import (
    cap_recent_items,
    cooccurrence_recommendations,
)

BASE = dt.datetime(2024, 1, 1)


def _purchases(spark, histories):
    """histories: {user_id: n_items} -> (user_id, item, ts) rows where
    item i of a user was bought at BASE + i seconds (so higher item id
    == more recent), with a duplicate older repurchase of item 0 to
    exercise the max(ts) collapse."""
    rows = []
    for user, n in histories.items():
        for i in range(n):
            rows.append((user, i, BASE + dt.timedelta(seconds=i)))
        rows.append((user, 0, BASE - dt.timedelta(days=1)))
    return spark.createDataFrame(rows, "user_id long, item long, ts timestamp")


def test_cap_keeps_most_recent_n(spark):
    df = _purchases(spark, {99: 200, 1: 5})
    capped = cap_recent_items(df, 50)
    by_user = {
        r["user_id"]: r["items"]
        for r in capped.groupBy("user_id")
        .agg(F.sort_array(F.collect_list("item")).alias("items"))
        .collect()
    }
    # Power user: exactly the 50 most recent of 200 items survive.
    assert by_user[99] == list(range(150, 200))
    # Under-cap user: untouched.
    assert by_user[1] == list(range(5))


def test_cap_bounds_pair_fanout(spark):
    """The pairing self-join on the capped ownership emits exactly
    N*(N-1) pairs for the power user — not 200*199."""
    df = _purchases(spark, {99: 200, 1: 5})
    capped = cap_recent_items(df, 50)
    a, b = capped.alias("a"), capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.item") != F.col("b.item")),
    )
    assert pairs.count() == 50 * 49 + 5 * 4


def test_uncapped_mode_unbounded(spark):
    """recent_n=None really is the exact mode: nothing is dropped."""
    df = _purchases(spark, {99: 200})
    assert cap_recent_items(df, None).count() == 200


def test_anti_join_uses_full_ownership(spark):
    """Round-8 fix (round-7 advisor finding): ownership exclusion must
    anti-join against the FULL distinct ownership, not the recent-N
    capped set — a power user owning an item OUTSIDE their recent 50
    must never be recommended it. Plant exactly that: user 99 owns
    items 0..199 (recent 50 = 150..199); user 1 co-purchased items
    {10, 199}, so item 199 (inside 99's recent set) pulls candidate
    rec_item=10 — which user 99 already owns, outside their recent N.
    """
    rows = [(99, i, BASE + dt.timedelta(seconds=i)) for i in range(200)]
    rows += [
        (1, 10, BASE + dt.timedelta(seconds=1)),
        (1, 199, BASE + dt.timedelta(seconds=2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, item long, ts timestamp")
    targets = df.select("user_id").distinct().where(F.col("user_id") == 99)
    recs = cooccurrence_recommendations(df, targets, recent_n=50).collect()
    assert all(r["rec_item"] != 10 for r in recs), recs
    # And in this fixture item 10 was user 99's ONLY candidate.
    assert recs == []


def test_gears_agree_under_cap(spark):
    """Capped and uncapped recommendations are identical when every
    user's history fits under the cap (the driver-fixture situation:
    max 25 distinct items per user at every verified SF)."""
    df = _purchases(spark, {1: 8, 2: 6, 3: 7, 4: 5})
    targets = df.select("user_id").distinct().where(F.col("user_id") <= 2)
    capped = cooccurrence_recommendations(df, targets, recent_n=50)
    exact = cooccurrence_recommendations(df, targets, recent_n=None)
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, exact.collect())
    )
    assert capped.count() > 0
