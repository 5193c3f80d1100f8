"""Python UDTF (table function) surface: SQL lateral usage must agree
with the JVM explode-expression equivalent."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.io.tables import load_table
from s3_rds_bq_airflow_spark.operators.udtf_ops import register_udtfs


def test_sentence_split_udtf_matches_jvm_explode(spark, sf_dir):
    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 50 == 0)
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_tokens
        FROM udtf_docs d, LATERAL sentence_split(d.text) s
        """
    ).collect()

    jvm = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.filter(
                    F.transform(F.split("text", r"\."), lambda x: F.trim(x)),
                    lambda x: x != "",
                )
            ).alias("sentence_idx", "sentence"),
        )
        .withColumn("n_tokens", F.size(F.split("sentence", r"\s+")))
        .collect()
    )
    key = lambda r: (r["doc_id"], r["sentence_idx"])  # noqa: E731
    got_s = sorted([(r["doc_id"], r["sentence_idx"], r["sentence"], r["n_tokens"]) for r in got])
    jvm_s = sorted([(r["doc_id"], r["sentence_idx"], r["sentence"], r["n_tokens"]) for r in jvm])
    assert got_s == jvm_s
    assert len(got_s) > 0
