"""q_fuzzy_match_blocked: FastSS deletion-neighborhood blocking,
round-8 dedupe-first form. Pins each edit-distance-1 case
(substitution / insertion / deletion / exact-dup family) on crafted
names, the far-pair exclusion, the lossless property of the uncapped
blocking against a brute-force Python DP over random strings, the
m=200 clone-family bound (ONE output row, arithmetic pair count), and
the variant-df cap gear.
"""

from __future__ import annotations

import os
import random

import pytest

import __spark_entry__ as entrymod
from s3_rds_bq_airflow_spark.queries.dedup import fuzzy_match_families


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
    return d


def _names_df(spark, names):
    return spark.createDataFrame([(n,) for n in names], ["name"])


def test_each_edit_kind(spark, tmp_path_factory):
    names = ["abcd", "abzd", "abd", "xabcd", "abcd", "wxyz"]
    d = _write_customers(spark, tmp_path_factory, names)
    got = {
        (r["name_a"], r["name_b"]): (r["cnt_a"], r["cnt_b"], r["dist"], r["n_pairs"])
        for r in entrymod.queries()["q_fuzzy_match_blocked"](spark, d).collect()
    }
    assert got == {
        ("abcd", "abzd"): (2, 1, 1, 2),  # substitution
        ("abcd", "abd"): (2, 1, 1, 2),  # deletion
        ("abcd", "xabcd"): (2, 1, 1, 2),  # insertion
        ("abd", "abzd"): (1, 1, 1, 1),  # one deletion apart
        ("abcd", "abcd"): (2, 2, 0, 1),  # exact-dup family of 2
    }


def test_blocking_is_lossless_vs_bruteforce(spark):
    """Uncapped gear (df_cap=None): every distinct-name pair within
    one edit is found — the FastSS completeness property."""
    rng = random.Random(7)
    alpha = "abcde"
    names = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(3, 8))) for _ in range(60)
    ]
    got = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_match_families(_names_df(spark, names), df_cap=None).collect()
        if r["dist"] == 1
    }
    uniq = sorted(set(names))
    want = {
        (x, y)
        for i, x in enumerate(uniq)
        for y in uniq[i + 1 :]
        if _lev(x, y) == 1
    }
    assert got == want


def test_pair_mass_equals_idlevel_bruteforce(spark):
    """The arithmetic n_pairs column carries exactly the old id-level
    semantics: over a random MULTISET of names (duplicates planted),
    sum(n_pairs) must equal the brute-force count of id pairs at
    edit distance <= 1 — family rows account for within-clone pairs,
    cross rows for cnt_a*cnt_b, nothing double- or under-counted."""
    rng = random.Random(13)
    alpha = "abc"
    base = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(2, 5)))
        for _ in range(25)
    ]
    names = [rng.choice(base) for _ in range(120)]  # heavy duplication
    got = sum(
        r["n_pairs"]
        for r in fuzzy_match_families(_names_df(spark, names), df_cap=None).collect()
    )
    want = sum(
        1
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if _lev(names[i], names[j]) <= 1
    )
    assert got == want


def test_clone_family_bounded(spark, tmp_path_factory):
    """The round-7 design-weak spot, closed: m=200 verbatim clones
    produce ONE family row with n_pairs = 200*199/2 arithmetic — not
    m^2 = 39,800 pair rows through the variant join."""
    names = ["clone"] * 200 + ["clonx", "other"]
    d = _write_customers(spark, tmp_path_factory, names)
    rows = entrymod.queries()["q_fuzzy_match_blocked"](spark, d).collect()
    assert len(rows) == 2  # the family row + the clone/clonx match
    by_pair = {(r["name_a"], r["name_b"]): r for r in rows}
    fam = by_pair[("clone", "clone")]
    assert (fam["cnt_a"], fam["cnt_b"], fam["dist"]) == (200, 200, 0)
    assert fam["n_pairs"] == 200 * 199 // 2
    cross = by_pair[("clone", "clonx")]
    assert (cross["cnt_a"], cross["cnt_b"], cross["dist"], cross["n_pairs"]) == (
        200,
        1,
        1,
        200,
    )


def test_variant_df_cap_gears(spark):
    """Default gear drops variant keys hotter than the cap; the
    lossless gear keeps them. 'ab'/'cb'/'db' share ONLY the deletion
    variant 'b' (df=3), so df_cap=2 blocks all three pairs."""
    names = ["ab", "cb", "db"]
    capped = fuzzy_match_families(_names_df(spark, names), df_cap=2).collect()
    assert capped == []
    lossless = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_match_families(_names_df(spark, names), df_cap=None).collect()
    }
    assert lossless == {("ab", "cb"), ("ab", "db"), ("cb", "db")}


def test_cap_stats_counts_dropped_keys(spark):
    """fuzzy_cap_stats (advisor round-8 item): reports how many
    blocking keys the df cap dropped, so capped-gear losses on
    adversarial data are detectable. 'ab'/'cb'/'db' produce variants
    {b, a, ab}/{b, c, cb}/{b, d, db} (FastSS keeps the identity
    variant for insertion matching): 'b' (df=3) is dropped at
    df_cap=2, the other six survive -> dropped=1 of total=7.
    On benign data (distinct long names) dropped must be 0."""
    from s3_rds_bq_airflow_spark.queries.dedup import fuzzy_cap_stats

    row = fuzzy_cap_stats(_names_df(spark, ["ab", "cb", "db"]), df_cap=2).collect()[0]
    assert (row["dropped_keys"], row["total_keys"]) == (1, 7)

    benign = fuzzy_cap_stats(
        _names_df(spark, ["abcdef", "abcdeg", "zzzzzz"])
    ).collect()[0]
    assert benign["dropped_keys"] == 0


def test_sf0001_matches_digit_structure(spark):
    """On the shipped data every reported pair must differ in exactly
    <=1 character of the Customer#%09d name, and n_pairs must equal
    the multiplicity product (all counts 1 on unique TPC-H names)."""
    rows = entrymod.queries()["q_fuzzy_match_blocked"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "expected at least one near-match pair"
    for r in rows:
        assert _lev(r["name_a"], r["name_b"]) == r["dist"] <= 1
        assert r["n_pairs"] == r["cnt_a"] * r["cnt_b"] == 1
