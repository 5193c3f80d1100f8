"""q_winnowing: Schleimer/Wilkerson/Aiken winnowing fingerprints.
Pins the selection rule (window-min, rightmost tie-break) on crafted
documents with hand-derivable structure, the Spark==DuckDB mirror on
the same corpus, and the paper's coverage guarantee (consecutive
selected positions <= W apart) on the shipped sf0.001 corpus."""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pytest

import __spark_entry__ as entrymod
from s3_rds_bq_airflow_spark.queries.textops import (
    _WINNOW_K,
    _WINNOW_M31,
    _WINNOW_W,
)

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from compare import frame_rows  # noqa: E402


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % _WINNOW_M31


def _winnow_py(text: str) -> set[tuple[int, int]]:
    """Reference implementation straight from the paper's definition."""
    toks = " ".join(text.lower().split()).split(" ")
    n_grams = max(len(toks) - _WINNOW_K + 1, 1)
    hs = [_h(" ".join(toks[i : i + _WINNOW_K])) for i in range(n_grams)]
    out = set()
    for i in range(max(len(hs) - _WINNOW_W + 1, 1)):
        win = hs[i : i + _WINNOW_W]
        mn = min(win)
        # rightmost minimal position, 1-based
        pos = i + max(j for j, v in enumerate(win) if v == mn) + 1
        out.add((pos, mn))
    return out


CRAFTED = [
    (0, "a b c d e f g a b c d e f g"),  # repeated half: shared fp at two positions
    (1, "x y"),  # shorter than K: one clamped short gram, one window
    (2, "t t t t t t t t"),  # all grams identical: rightmost tie-break path
    (3, "p q r s t u v w x y z a b c d"),
]


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("winnow_sf"))
    spark.createDataFrame(CRAFTED, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_selection_rule_matches_paper_reference(spark, crafted_dir):
    got = {}
    for r in entrymod.queries()["q_winnowing"](spark, crafted_dir).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for doc_id, text in CRAFTED:
        assert got[doc_id] == _winnow_py(text), f"doc {doc_id}"


def test_rightmost_tie_break(spark, crafted_dir):
    # doc 2: 8 identical tokens -> 5 identical gram hashes, 2 windows;
    # rightmost tie-break selects position i+W-1 in each: {4, 5}.
    rows = (
        entrymod.queries()["q_winnowing"](spark, crafted_dir)
        .where("doc_id = 2")
        .collect()
    )
    assert sorted(r["pos"] for r in rows) == [4, 5]
    assert len({r["fp"] for r in rows}) == 1


def test_crafted_matches_oracle(spark, crafted_dir):
    sdf = entrymod.queries()["q_winnowing"](spark, crafted_dir).toPandas()
    con = duckdb.connect()
    p = os.path.join(crafted_dir, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    odf = con.execute(entrymod.oracle_sql()["q_winnowing"]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert frame_rows(sdf) == frame_rows(odf)


def test_coverage_guarantee_at_sf0001(spark):
    """Every gap between consecutive selected positions is <= W, and
    the density is near the paper's 2/(W+1) expectation."""
    from pyspark.sql import Window, functions as F

    df = entrymod.queries()["q_winnowing"](spark, "/root/testdata/sf0.001")
    w = Window.partitionBy("doc_id").orderBy("pos")
    gaps = (
        df.select("doc_id", "pos")
        .distinct()
        .withColumn("gap", F.col("pos") - F.lag("pos").over(w))
        .agg(F.max("gap").alias("max_gap"), F.count(F.lit(1)).alias("n"))
        .first()
    )
    assert gaps["max_gap"] <= _WINNOW_W
    # density over gram positions: selected distinct positions / grams
    toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.greatest(
            F.size(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "))
            - (_WINNOW_K - 1),
            F.lit(1),
        ).alias("g")
    )
    n_grams = toks.agg(F.sum("g")).first()[0]
    density = gaps["n"] / n_grams
    assert 0.25 < density < 0.55  # 2/(W+1) = 0.4 expected


# ---- q_winnow_overlap ----


def test_overlap_reports_planted_copied_run(spark, tmp_path_factory):
    words = ["w%d" % i for i in range(40)]
    run = " ".join(words[:20])  # 20-token verbatim run shared by 0 and 1
    rows = [
        (0, run + " alpha beta gamma delta " + " ".join(words[20:30])),
        (1, "omega " + " ".join(words[30:40]) + " " + run),
        (2, " ".join(reversed(words))),  # no shared 4-gram run
    ]
    d = str(tmp_path_factory.mktemp("winnow_ov"))
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in entrymod.queries()["q_winnow_overlap"](spark, d).collect()
    }
    assert (0, 1) in got and got[(0, 1)] >= 2
    assert all(p == (0, 1) for p in got)


def test_overlap_df_cap_drops_corpus_stopword_fps(spark, tmp_path_factory):
    from s3_rds_bq_airflow_spark.queries.textops import _WINNOW_DF_CAP

    # DF_CAP+10 identical docs: every fingerprint's document frequency
    # exceeds the cap, so NO pairs are reported — hot shingles carry
    # no dedup signal and must not fan out
    n = _WINNOW_DF_CAP + 10
    rows = [(i, "a b c d e f g h i j k l m n o p") for i in range(n)]
    d = str(tmp_path_factory.mktemp("winnow_cap"))
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    assert entrymod.queries()["q_winnow_overlap"](spark, d).count() == 0
