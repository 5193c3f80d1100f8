"""Weighted domain mixing (operators/mixing.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.operators.mixing import (
    rate_threshold_hex,
    weighted_mix,
)


def test_thresholds():
    assert rate_threshold_hex(0.0) == "000000"
    assert rate_threshold_hex(0.5) == "800000"
    assert rate_threshold_hex(0.25) == "400000"
    # 1.0 must sort above EVERY hex prefix — '1000000' would not
    # (lexicographic '1' < 'a'), hence the 'g' sentinel.
    assert rate_threshold_hex(1.0) == "g"
    assert "ffffff" < "g"
    with pytest.raises(ValueError):
        rate_threshold_hex(1.5)


@pytest.fixture()
def corpus(spark):
    rows = [(i, ["web", "code", "junk"][i % 3]) for i in range(600)]
    return spark.createDataFrame(rows, ["id", "source"])


def test_rates_and_reproducibility(spark, corpus):
    mixed = weighted_mix(
        corpus, key_col="id", group_col="source", rates={"web": 1.0, "code": 0.5}
    )
    counts = {r["source"]: r["n"] for r in
              mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["web"] == 200          # rate 1.0 keeps every row
    assert 60 <= counts.get("code", 0) <= 140   # ~0.5 of 200
    assert "junk" not in counts          # default_rate 0 drops unlisted
    # Exactly reproducible: same ids selected on a re-run.
    again = weighted_mix(
        corpus, key_col="id", group_col="source", rates={"web": 1.0, "code": 0.5}
    )
    assert sorted(r["id"] for r in mixed.collect()) == sorted(
        r["id"] for r in again.collect()
    )


def test_selection_matches_reference_md5(spark, corpus):
    # The engine must select exactly the ids whose md5 prefix clears
    # the threshold — verifiable with stdlib hashlib.
    mixed = weighted_mix(
        corpus, key_col="id", group_col="source",
        rates={"web": 0.25}, default_rate=0.0,
    )
    got = sorted(r["id"] for r in mixed.collect())
    want = sorted(
        i for i in range(600)
        if i % 3 == 0 and hashlib.md5(str(i).encode()).hexdigest()[:6] < "400000"
    )
    assert got == want
