"""q_gopher_repetition: every reject reason must be reachable and
engine-portable. The synthetic corpus only exercises three of the five
rules, so this test crafts one document per reason, runs the SAME
declared query and the SAME DuckDB oracle on them, and pins both the
expected reason per document and Spark==DuckDB equality."""

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


def _crafted_docs():
    u = [f"u{i:03d}" for i in range(1, 200)]  # unique 4-char tokens
    docs = {
        # < 20 tokens
        "too_short": "aaa bbb ccc",
        # 25 tokens of length 2 -> mean word len 2 < 3
        "word_len": " ".join(["ab"] * 25),
        # 25 tokens of length 12 -> mean word len 12 > 10
        "word_len_hi": " ".join(["abcdefghijkl"] * 25),
        # 40 tokens, 2 distinct bigrams of 39 -> dup2 >> 0.04
        "dup_2gram": " ".join(["xxx", "yyy"] * 20),
        # 80 tokens, one repeated 4-gram far apart:
        # dup2 = 3/79 <= 0.04, dup3 = 2/78 > 0.02, top2 = 2/79 <= 0.06
        "dup_3gram": " ".join(
            u[0:38] + ["rrr1", "rrr2", "rrr3", "rrr4"]
            + u[38:72] + ["rrr1", "rrr2", "rrr3", "rrr4"]
        ),
        # 33 tokens, one bigram appearing twice:
        # dup2 = 1/32 <= 0.04, top2 = 2/32 > 0.06, dup3 = 0
        "top_2gram": " ".join(
            ["xxx", "yyy"] + u[100:114] + ["xxx", "yyy"] + u[114:129]
        ),
        # 30 unique tokens -> passes every rule
        "ok": " ".join(u[130:160]),
    }
    return docs


EXPECTED = {
    0: "too_short",
    1: "word_len",
    2: "word_len",
    3: "dup_2gram",
    4: "dup_3gram",
    5: "top_2gram",
    6: "ok",
}


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    docs = _crafted_docs()
    rows = [(i, text) for i, text in enumerate(docs.values())]
    d = str(tmp_path_factory.mktemp("gopher_sf"))
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_every_reject_reason_fires(spark, crafted_dir):
    df = entrymod.queries()["q_gopher_repetition"](spark, crafted_dir)
    got = {r["doc_id"]: (r["reject_reason"], r["keep"]) for r in df.collect()}
    assert {k: v[0] for k, v in got.items()} == EXPECTED
    assert all((v[1] == 1) == (v[0] == "ok") for v in got.values())


def test_crafted_docs_match_oracle(spark, crafted_dir):
    sdf = entrymod.queries()["q_gopher_repetition"](spark, crafted_dir).toPandas()
    con = duckdb.connect()
    p = os.path.join(crafted_dir, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    odf = con.execute(entrymod.oracle_sql()["q_gopher_repetition"]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert frame_rows(sdf) == frame_rows(odf)
