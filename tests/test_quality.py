"""Data-quality expectations: quarantine split + schema evolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.io.tables import load_table
from s3_rds_bq_airflow_spark.operators.quality import apply_expectations


def test_quarantine_split(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0), (2, None, 20.0), (3, "X", -5.0), (4, "F", 0.0)],
        ["k", "status", "price"],
    )
    passed, quarantined = apply_expectations(
        df,
        {
            "status_not_null": F.col("status").isNotNull(),
            "status_in_domain": F.col("status").isin("O", "F", "P"),
            "price_positive": F.col("price") > 0,
        },
    )
    assert [r["k"] for r in passed.collect()] == [1]
    q = {r["k"]: sorted(r["_failed_rules"]) for r in quarantined.collect()}
    assert q[2] == ["status_in_domain", "status_not_null"]
    assert q[3] == ["price_positive", "status_in_domain"]
    assert q[4] == ["price_positive"]
    # split is a partition: no row lost or duplicated
    assert passed.count() + quarantined.count() == df.count()


def test_parquet_schema_evolution(spark, sf_dir, tmp_path):
    """Long-lived tables gain columns over time: mergeSchema reads
    old + new files as one table, old rows null for new columns."""
    d = str(tmp_path / "evolving")
    v1 = load_table(spark, sf_dir, "region")
    v1.write.parquet(d + "/batch=1")
    v2 = v1.withColumn("r_comment", F.concat(F.lit("about "), "r_name"))
    v2.write.parquet(d + "/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(d)
    assert set(merged.columns) >= {"r_regionkey", "r_name", "r_comment"}
    assert merged.count() == 2 * v1.count()
    assert merged.where(F.col("r_comment").isNull()).count() == v1.count()
