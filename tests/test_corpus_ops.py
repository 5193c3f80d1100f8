"""Round-5 corpus-analysis additions: C4 quality gate, TF-IDF top
terms, sliding-window chunking, and SemDeDup-style semantic dedup.

Cross-engine value equality is covered by tools/compare.py and the
driver; these tests pin SEMANTIC invariants (hand-computable
properties) and the plan shapes that make each op scale.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.queries import all_queries

QUERIES = all_queries()


@pytest.fixture(scope="module")
def c4_rows(spark, sf_dir):
    return {r["doc_id"]: r for r in QUERIES["q_c4_quality_gate"](spark, sf_dir).collect()}


def test_c4_gate_keep_is_conjunction_of_flags(c4_rows):
    flags = (
        "pass_min_words",
        "pass_max_words",
        "pass_word_len",
        "pass_no_brace",
        "pass_no_lorem",
        "pass_stopwords",
    )
    for r in c4_rows.values():
        assert r["keep"] == int(all(r[f] == 1 for f in flags)), r


def test_c4_gate_splits_the_corpus(c4_rows):
    """Thresholds must be inside the data's range — a gate that keeps
    (or rejects) everything verifies nothing."""
    keeps = {r["keep"] for r in c4_rows.values()}
    assert keeps == {0, 1}


def test_c4_gate_matches_handcount(spark, sf_dir, c4_rows):
    doc = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    toks = doc["text"].lower().split()
    r = c4_rows[doc["doc_id"]]
    assert r["n_tokens"] == len(toks)
    assert r["pass_min_words"] == int(len(toks) >= 40)
    padded = " " + " ".join(toks) + " "
    hits = sum(padded.count(w) for w in (" the ", " a ", " of ", " and "))
    assert r["stopword_hits"] == hits


def test_tfidf_ranking_invariants(spark, sf_dir):
    rows = QUERIES["q_tfidf_topterms"](spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["rn"])
        assert [r["rn"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        # scores non-increasing in rank; ties broken by term ascending
        for a, b in zip(rs, rs[1:]):
            assert (a["score"], ) >= (b["score"], )
            if a["score"] == b["score"]:
                assert a["term"] < b["term"]
        for r in rs:
            assert r["score"] == pytest.approx(r["tf"] * len(by_doc) / r["df"])


def test_tfidf_df_is_document_frequency(spark, sf_dir):
    rows = QUERIES["q_tfidf_topterms"](spark, sf_dir).collect()
    term, df = rows[0]["term"], rows[0]["df"]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    true_df = sum(1 for d in docs if term in d["text"].lower().split())
    assert df == true_df


def test_chunk_overlap_reconstructs_documents(spark, sf_dir):
    """Chunk manifest invariants: chunk count = floor((n-1)/24)+1,
    sizes clamp at the stream end, and the first chunk's hash equals a
    Python md5 of the first 32 tokens."""
    chunks = QUERIES["q_chunk_overlap"](spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    docs = {
        d["doc_id"]: " ".join(d["text"].lower().split()).split()
        for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert set(by_doc) == set(docs)
    for doc_id, toks in docs.items():
        rs = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        n = len(toks)
        assert len(rs) == (n - 1) // 24 + 1
        for r in rs:
            start = r["start_tok"]
            assert r["chunk_idx"] == start // 24
            assert r["n_chunk_tokens"] == min(32, n - start)
        first = " ".join(toks[:32])
        assert rs[0]["chunk_hash"] == hashlib.md5(first.encode()).hexdigest()


def test_semantic_dedup_drops_exactly_the_planted_twins(spark, sf_dir):
    rows = QUERIES["q_semantic_dedup"](spark, sf_dir).collect()
    assert rows, "planted twins must be detected"
    for r in rows:
        # every drop decision points at a strictly lower keeper
        assert r["keeper_id"] < r["dropped_id"]
        assert r["n_matches"] >= 1
    # the planted twins (id >= 1_000_000) are all dropped, each kept
    # by its original (the only cosine>=0.999 bucket-mate)
    twins = [r for r in rows if r["dropped_id"] >= 1_000_000]
    assert {r["dropped_id"] - 1_000_000 == r["keeper_id"] for r in twins} == {True}
    n_expected = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(F.col("vec_id") % 29 == 0)
        .count()
    )
    assert len(twins) == n_expected


def test_semantic_dedup_fast_gear_agrees_on_planted_twins(spark, sf_dir):
    """The double-projection throughput gear must reach the same drop
    decisions as the exact-decimal verification gear on the planted
    corpus (1-ulp projection skew can only flip empty buckets, not a
    0.9999+ cosine)."""
    from s3_rds_bq_airflow_spark.operators.similarity import semantic_dedup_keep_one

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    twins = emb.where(F.col("vec_id") % 29 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: (x.cast("double") * 1.0001).cast("float")
        ).alias("embedding"),
    )
    corpus = emb.unionByName(twins)
    fast = {
        (r["dropped_id"], r["keeper_id"])
        for r in semantic_dedup_keep_one(corpus, exact=False).collect()
    }
    exact = {
        (r["dropped_id"], r["keeper_id"])
        for r in QUERIES["q_semantic_dedup"](spark, sf_dir).collect()
    }
    assert fast == exact


def test_new_ops_plan_shapes(spark, sf_dir):
    """Scale-posture pins: the gate and chunker are zero-shuffle maps;
    semantic dedup's pair join is an equi-join (bucket key), never a
    cartesian/nested-loop, even with auto-broadcast off."""
    from s3_rds_bq_airflow_spark.plans.inspect import plan_nodes

    gate_nodes = plan_nodes(QUERIES["q_c4_quality_gate"](spark, sf_dir))
    assert not any("Exchange" in n for n in gate_nodes), gate_nodes
    chunk_nodes = plan_nodes(QUERIES["q_chunk_overlap"](spark, sf_dir))
    assert not any("Exchange" in n for n in chunk_nodes), chunk_nodes

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sd_nodes = plan_nodes(QUERIES["q_semantic_dedup"](spark, sf_dir))
        assert not any("CartesianProduct" in n for n in sd_nodes), sd_nodes
        assert not any("BroadcastNestedLoopJoin" in n for n in sd_nodes), sd_nodes
        assert any("SortMergeJoin" in n or "ShuffledHashJoin" in n for n in sd_nodes)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_dedup_canonical_invariants(spark, sf_dir):
    """One canonical per cluster; the canonical maximizes the quality
    score (doc_id tie-break); sizes sum back to the corpus."""
    rows = QUERIES["q_dedup_canonical"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        canon = [r for r in members if r["is_canonical"] == 1]
        assert len(canon) == 1, cid
        assert all(r["canonical_doc_id"] == canon[0]["doc_id"] for r in members)
        assert all(r["cluster_size"] == len(members) for r in members)
        # members of one planted range-cluster share doc_id // 25
        assert {r["doc_id"] // 25 for r in members} == {cid // 25}


def test_dup_span_detect_planted_prefixes(spark, sf_dir):
    """Every planted copy (id >= 1M) must report AT LEAST the 20
    copied prefix tokens as covered (natural cross-doc 13-grams can
    extend coverage); its fraction is covered/n; docs with no
    cross-document 13-gram stay at zero."""
    rows = QUERIES["q_dup_span_detect"](spark, sf_dir).collect()
    planted = [r for r in rows if r["doc_id"] >= 1_000_000]
    assert planted
    for r in planted:
        assert 20 <= r["covered_tokens"] <= r["n_tokens"], r
        assert r["n_tokens"] == 23
    originals = {r["doc_id"]: r for r in rows if r["doc_id"] < 1_000_000}
    for r in planted:
        orig = originals[r["doc_id"] - 1_000_000]
        # the source of the copy is covered for at least its prefix
        assert orig["covered_tokens"] >= 20
    assert any(r["covered_tokens"] == 0 for r in originals.values())
    for r in rows:
        assert r["dup_token_frac"] == pytest.approx(r["covered_tokens"] / r["n_tokens"])


def test_triangle_counts_planted_structure(spark, sf_dir):
    """Each full 10-doc range contributes exactly one triangle over
    its rank-1/2/3 members; everything else is on the zero path."""
    rows = {r["doc_id"]: r["n_triangles"] for r in
            QUERIES["q_triangle_counts"](spark, sf_dir).collect()}
    doc_ids = sorted(rows)
    by_g: dict[int, list] = {}
    for d in doc_ids:
        by_g.setdefault(d // 10, []).append(d)
    for g, members in by_g.items():
        if len(members) >= 3:
            tri_nodes = members[:3]
            for d in members:
                assert rows[d] == (1 if d in tri_nodes else 0), (g, d)
        else:
            for d in members:
                assert rows[d] == 0


def test_round5_shuffle_budgets(spark, sf_dir):
    """Exchange-count ceilings for the round-5 additions — the pins
    that keep their scale posture from regressing: tfidf = tf agg +
    df agg + join + per-doc window; feature hashing = (doc,bucket)
    agg + per-doc agg; heavy hitters = one DATA-BEARING shuffle (the
    candidate recount) plus two config-sized exchanges (candidate
    distinct, 1-row total) — the MG pass itself must add none."""
    from s3_rds_bq_airflow_spark.plans.inspect import assert_max_shuffles

    assert_max_shuffles(QUERIES["q_tfidf_topterms"](spark, sf_dir), 5)
    assert_max_shuffles(QUERIES["q_feature_hashing"](spark, sf_dir), 2)
    assert_max_shuffles(QUERIES["q_heavy_hitters"](spark, sf_dir), 3)


def test_pipeline_v2_consistent_with_standalone_stages(spark, sf_dir):
    """The composed pipeline must agree with its standalone stages:
    docs kept per language == C4 gate keeps, and chunk totals == the
    chunk manifest restricted to kept docs."""
    kept_ids = {
        r["doc_id"]
        for r in QUERIES["q_c4_quality_gate"](spark, sf_dir).collect()
        if r["keep"] == 1
    }
    langs = {
        d["doc_id"]: d["lang"]
        for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    chunks = [
        r for r in QUERIES["q_chunk_overlap"](spark, sf_dir).collect()
        if r["doc_id"] in kept_ids
    ]
    expect: dict[str, dict] = {}
    for r in chunks:
        lang = langs[r["doc_id"]]
        e = expect.setdefault(lang, {"docs": set(), "chunks": 0, "tokens": 0})
        e["docs"].add(r["doc_id"])
        e["chunks"] += 1
        e["tokens"] += r["n_chunk_tokens"]
    got = {r["lang"]: r for r in QUERIES["q_corpus_pipeline_v2"](spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for lang, e in expect.items():
        assert got[lang]["n_docs_kept"] == len(e["docs"])
        assert got[lang]["n_chunks"] == e["chunks"]
        assert got[lang]["total_chunk_tokens"] == e["tokens"]


def test_bpe_merge_semantics_and_ranking(spark, sf_dir):
    """The separator-wrap makes merging (b,b) over 'bbb' yield
    [bb, b] (left-to-right non-overlapping) — the defining BPE edge
    case; plus ranking invariants on the declared output."""
    from pyspark.sql import functions as F
    from s3_rds_bq_airflow_spark.queries.textops import (
        _US,
        _bpe_tokens,
        _bpe_top_pair,
    )

    w = spark.createDataFrame([("bbb",)], "w string").select(
        F.concat(
            F.lit(_US), F.concat_ws(_US + _US, F.split(F.col("w"), "")), F.lit(_US)
        ).alias("s")
    )
    top = _bpe_top_pair(w).collect()[0]
    assert top["repl"] == _US + "bb" + _US
    merged = w.crossJoin(
        F.broadcast(spark.createDataFrame([(top["pat"], top["repl"])], "pat string, repl string"))
    ).select(F.replace(F.col("s"), F.col("pat"), F.col("repl")).alias("s"))
    toks = merged.select(_bpe_tokens(F.col("s")).alias("t")).collect()[0]["t"]
    assert toks == ["bb", "b"]

    rows = QUERIES["q_bpe_merges"](spark, sf_dir).collect()
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, 11)
    )
    ns = [r["n"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert ns == sorted(ns, reverse=True)
    m1, m2 = rows[0]["merge1"], rows[0]["merge2"]
    assert len(m1) >= 2 and len(m2) >= 2 and m1 != m2
