"""q_char_diversity_gate: integer inverse-Simpson effective alphabet.
Crafted documents pin the exact integers (uniform alphabet, repeated
single char, empty text -> div-by-zero guard) and oracle equality."""

from __future__ import annotations

import os
import string
import sys

import duckdb
import pytest

import __spark_entry__ as entrymod

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from compare import frame_rows  # noqa: E402

CRAFTED = [
    (0, "abcdefghijklmnopqrstuvwxyz"),  # uniform: eff = 26
    (1, "aaaa aaaa aaaa"),  # one char: eff = 1
    (2, ""),  # empty: guard path, eff = 0
    (3, "aab"),  # n=3, coll=4+1=5, eff = 9 div 5 = 1
]


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("chardiv_sf"))
    spark.createDataFrame(CRAFTED, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_exact_integers(spark, crafted_dir):
    got = {
        r["doc_id"]: r
        for r in entrymod.queries()["q_char_diversity_gate"](spark, crafted_dir).collect()
    }
    assert (got[0]["eff_alphabet"], got[0]["keep"]) == (26, 1)
    assert (got[1]["n_chars"], got[1]["eff_alphabet"], got[1]["keep"]) == (12, 1, 0)
    assert (got[2]["n_chars"], got[2]["eff_alphabet"], got[2]["keep"]) == (0, 0, 0)
    assert (got[3]["collision_sum"], got[3]["eff_alphabet"]) == (5, 1)


def test_crafted_matches_oracle(spark, crafted_dir):
    sdf = entrymod.queries()["q_char_diversity_gate"](spark, crafted_dir).toPandas()
    con = duckdb.connect()
    p = os.path.join(crafted_dir, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    odf = con.execute(entrymod.oracle_sql()["q_char_diversity_gate"]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert frame_rows(sdf) == frame_rows(odf)


def test_both_classes_present_at_sf0001(spark):
    from pyspark.sql import functions as F

    agg = (
        entrymod.queries()["q_char_diversity_gate"](spark, "/root/testdata/sf0.001")
        .agg(F.sum("keep").alias("kept"), F.count(F.lit(1)).alias("n"))
        .first()
    )
    assert 0 < agg["kept"] < agg["n"]
