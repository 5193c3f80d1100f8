"""s3_rds_bq_airflow_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the data-processing capabilities of the
reference pipeline ``rubyferdianto/s3-rds-bq-airflow`` (CSV -> S3 ->
RDS MySQL staging -> BigQuery warehouse), re-expressed as an idiomatic
Spark DataFrame/SQL library:

- ``session``    — tuned SparkSession factory (AQE, UTC, Arrow).
- ``io``         — sources/sinks: parquet/CSV bronze ingest, JDBC scan
                   specs, processed-file ledger, catalog scans.
- ``ingest``     — the reference's signature ingestion semantics as
                   reusable transforms: column sanitization, audit and
                   lineage columns, bronze(all-string)->silver(typed).
- ``operators``  — movement/maintenance ops (merge-upsert, verified
                   cleanup, full/incremental copy) plus the large-scale
                   training-data pipeline kit (dedup, similarity
                   search, text analysis, multimodal columns).
- ``queries``    — declared query registry (the driver contract):
                   every operator has a DataFrame builder and, where
                   SQL-expressible, a DuckDB oracle string.
- ``streaming``  — Structured Streaming surface over the events table.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the behavior of the public reference repo.
"""

__version__ = "0.1.0"
