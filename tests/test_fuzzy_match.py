"""q_fuzzy_match_blocked: FastSS deletion-neighborhood blocking.
Pins each edit-distance-1 case (substitution / insertion / deletion /
exact dup) on crafted names, the far-pair exclusion, and the lossless
property of the blocking against a brute-force Python DP over random
strings."""

from __future__ import annotations

import os
import random

import pytest

import __spark_entry__ as entrymod


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _write_customers(spark, tmp_path_factory, names):
    d = str(tmp_path_factory.mktemp("fuzzy_sf"))
    rows = [(i * 40, n) for i, n in enumerate(names)]
    spark.createDataFrame(rows, ["c_custkey", "c_name"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "customer.parquet"))
    return d, {i * 40: n for i, n in enumerate(names)}


def test_each_edit_kind(spark, tmp_path_factory):
    names = ["abcd", "abzd", "abd", "xabcd", "abcd", "wxyz"]
    d, _ = _write_customers(spark, tmp_path_factory, names)
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in entrymod.queries()["q_fuzzy_match_blocked"](spark, d).collect()
    }
    assert got == {
        (0, 40): 1,  # substitution abcd/abzd
        (0, 80): 1,  # deletion abcd/abd
        (0, 120): 1,  # insertion abcd/xabcd
        (0, 160): 0,  # exact duplicate
        (40, 80): 1,  # abzd/abd is itself one deletion apart
        (40, 160): 1,
        (80, 160): 1,
        (120, 160): 1,
    }


def test_blocking_is_lossless_vs_bruteforce(spark, tmp_path_factory):
    rng = random.Random(7)
    alpha = "abcde"
    names = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(3, 8))) for _ in range(60)
    ]
    d, by_id = _write_customers(spark, tmp_path_factory, names)
    got = {
        (r["id_a"], r["id_b"])
        for r in entrymod.queries()["q_fuzzy_match_blocked"](spark, d).collect()
    }
    ids = sorted(by_id)
    want = {
        (x, y)
        for i, x in enumerate(ids)
        for y in ids[i + 1 :]
        if _lev(by_id[x], by_id[y]) <= 1
    }
    assert got == want


def test_sf0001_matches_digit_structure(spark):
    """On the shipped data every reported pair must differ in exactly
    <=1 character of the Customer#%09d name."""
    rows = entrymod.queries()["q_fuzzy_match_blocked"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "expected at least one near-match pair"
    for r in rows:
        assert _lev(r["name_a"], r["name_b"]) == r["dist"] <= 1
