"""q_inverted_index / q_bm25: retrieval-side operators.

The BM25 pin is the strong one: the per-document score is replayed in
pure Python over the SAME IEEE-754 expression tree (Python floats are
doubles; identical operands + identical op order = identical bits),
so Spark, DuckDB, and the reference arithmetic must agree exactly.
"""

from __future__ import annotations

import os
import sys

import pytest

import __spark_entry__ as entrymod
from s3_rds_bq_airflow_spark.plans import assert_broadcast_joins
from s3_rds_bq_airflow_spark.plans.inspect import plan_nodes
from s3_rds_bq_airflow_spark.queries.searchops import (
    _BM25_TERMS,
    _BM25_TOPK,
    _POSTING_PREFIX,
    _TOPN_TERMS,
)

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

# Default: the small fixture. The round-7 scale step re-runs this file
# with SPARK_GRAFT_SEARCHOPS_SF=/tmp/sf10 (500k docs) — the posting-
# prefix cut, broadcast term list, TakeOrdered plan, and the bitwise
# BM25 replay are scale-invariant claims, so the SAME assertions must
# hold two decades up.
SF = os.environ.get("SPARK_GRAFT_SEARCHOPS_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    rows = [
        (0, "spark join window spark"),
        (1, "join the line"),
        (2, "window window window window join"),
        (3, "other words only here"),
    ]
    d = str(tmp_path_factory.mktemp("search_sf"))
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_inverted_index_crafted(spark, crafted_dir):
    rows = {
        r["term"]: r
        for r in entrymod.queries()["q_inverted_index"](spark, crafted_dir).collect()
    }
    assert rows["join"]["df"] == 3 and rows["join"]["cf"] == 3
    assert rows["join"]["posting_prefix"] == "0,1,2"
    assert rows["window"]["df"] == 2 and rows["window"]["cf"] == 5
    assert rows["spark"]["df"] == 1 and rows["spark"]["cf"] == 2
    assert rows["spark"]["min_doc"] == 0 and rows["spark"]["max_doc"] == 0


def test_inverted_index_shape(spark):
    rows = entrymod.queries()["q_inverted_index"](spark, SF).collect()
    assert len(rows) == _TOPN_TERMS
    for r in rows:
        ids = [int(x) for x in r["posting_prefix"].split(",")]
        assert len(ids) == min(r["df"], _POSTING_PREFIX)
        assert ids == sorted(ids)
        assert ids[0] == r["min_doc"]
        assert r["cf"] >= r["df"]


def test_inverted_index_truncates_distributedly(spark):
    """The posting-prefix collect_list must sit ABOVE the rn<=8 cut:
    no executor may aggregate a full posting list."""
    df = entrymod.queries()["q_inverted_index"](spark, SF)
    assert_broadcast_joins(df, 1)  # top-20 term list broadcast back


def _bm25_py(tf, df, dl, n, tot):
    idf = ((n - df) + 0.5) / (df + 0.5)
    den = tf + 1.2 * (0.25 + 0.75 * ((dl * n) / tot))
    return (idf * (tf * 2.2)) / den


def test_bm25_bitwise_matches_python_replay(spark):
    """Replay every returned score in pure Python IEEE-754 — exact
    equality, not approx."""
    from pyspark.sql import functions as F

    # corpus scalars, computed independently of the query under test
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tk = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    def tf_col(term):
        return F.size(F.filter(tk, lambda x: x == F.lit(term)))

    base = docs.select(
        *[tf_col(term).alias(f"tf{i}") for i, term in enumerate(_BM25_TERMS, 1)],
        F.size(tk).alias("dl"),
    )
    sc = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("tot"),
        *[F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}") for i in (1, 2, 3)],
    ).first()
    rows = entrymod.queries()["q_bm25"](spark, SF).collect()
    assert len(rows) == _BM25_TOPK
    prev = None
    for r in rows:
        expect = sum(
            [
                _bm25_py(r[f"tf{i}"], sc[f"df{i}"], r["dl"], sc["n"], sc["tot"])
                for i in (1, 2, 3)
            ][:2]
        ) + _bm25_py(r["tf3"], sc["df3"], r["dl"], sc["n"], sc["tot"])
        assert r["score"] == expect  # bitwise
        if prev is not None:
            assert r["score"] <= prev
        prev = r["score"]
        assert r["tf1"] + r["tf2"] + r["tf3"] > 0


def test_bm25_plan_is_take_ordered(spark):
    nodes = plan_nodes(entrymod.queries()["q_bm25"](spark, SF))
    assert "TakeOrderedAndProject" in nodes
