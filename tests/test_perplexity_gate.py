"""q_perplexity_gate: the CCNet/Gopher-style LM-surprisal filter in
its exact-rational gear. A hand-computable crafted corpus pins the
integer arithmetic (inverse frequencies, totals, the keep cut) and
Spark==DuckDB equality; the shipped corpus pins the planted 5%
high-perplexity tail at sf0.001."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

import __spark_entry__ as entrymod

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from compare import frame_rows  # noqa: E402


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    # corpus: c x100 in doc 0, three hapaxes in doc 1 -> n_total=103
    # inv(c) = 103 div 100 = 1; inv(hapax) = 103 div 1 = 103
    rows = [(0, " ".join(["c"] * 100)), (1, "x y z")]
    d = str(tmp_path_factory.mktemp("pplx_sf"))
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_exact_integer_arithmetic_and_cut(spark, crafted_dir):
    got = {
        r["doc_id"]: r
        for r in entrymod.queries()["q_perplexity_gate"](spark, crafted_dir).collect()
    }
    d0, d1 = got[0], got[1]
    assert (d0["n_tokens"], d0["total_inv"], d0["keep"]) == (100, 100, 1)
    assert d0["mean_inv"] == 1.0
    assert (d1["n_tokens"], d1["total_inv"], d1["keep"]) == (3, 309, 0)
    assert d1["mean_inv"] == 103.0  # 309/3, the high-perplexity tail


def test_crafted_docs_match_oracle(spark, crafted_dir):
    sdf = entrymod.queries()["q_perplexity_gate"](spark, crafted_dir).toPandas()
    con = duckdb.connect()
    p = os.path.join(crafted_dir, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    odf = con.execute(entrymod.oracle_sql()["q_perplexity_gate"]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert frame_rows(sdf) == frame_rows(odf)


def test_planted_tail_cut_at_sf0001(spark):
    df = entrymod.queries()["q_perplexity_gate"](spark, "/root/testdata/sf0.001")
    from pyspark.sql import functions as F

    agg = df.agg(
        F.count(F.lit(1)).alias("docs"), F.sum("keep").alias("kept")
    ).first()
    assert agg["docs"] == 500
    assert agg["kept"] == 475  # the planted rare-token-dense 5% fails
