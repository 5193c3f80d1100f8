"""Ingestion-semantics queries (SURVEY §2.1/2.2: P1, P2, S6, §1.3).

Declared-query form of the reference's signature behaviors: column
sanitization, audit stamping, and the all-TEXT bronze -> typed silver
staging pair. All pure column projections/casts — collapsed into the
scan by Catalyst, zero extra passes.
"""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from ..ingest import sanitize_columns, to_bronze, to_silver, with_audit_column
from .registry import query
from ._util import dec, dsum, t


@query(
    "q_sanitize_columns",
    oracle="""
    SELECT c_custkey AS cust_key, UPPER(c_name) AS customer_name, c_mktsegment AS market_segment
    FROM customer WHERE c_custkey % 25 = 0
    """,
)
def q_sanitize_columns(spark, sf_dir):
    """P1 column sanitization applied to deliberately-messy headers
    (BOM, quotes, spaces, camelCase, leading digits — the shapes
    `s3-to-rds.py:147-157` handles). The oracle states the expected
    cleaned names directly."""
    messy = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 25 == 0)
        .select(
            F.col("c_custkey").alias("﻿ Cust-Key "),
            F.upper("c_name").alias('"CustomerName"'),
            F.col("c_mktsegment").alias("Market Segment!"),
        )
    )
    return sanitize_columns(messy)


@query(
    "q_bronze_silver_roundtrip",
    oracle="""
    WITH bronze AS (
        SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey,
               CAST(l_linenumber AS VARCHAR) AS l_linenumber,
               CAST(l_quantity AS VARCHAR) AS l_quantity,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS l_extendedprice,
               CAST(l_returnflag AS VARCHAR) AS l_returnflag,
               CAST(l_shipdate AS VARCHAR) AS l_shipdate
        FROM lineitem
    ),
    silver AS (
        SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
               CAST(l_linenumber AS BIGINT) AS l_linenumber,
               CAST(l_quantity AS DOUBLE) AS l_quantity,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS l_extendedprice,
               l_returnflag,
               CAST(l_shipdate AS TIMESTAMP) AS l_shipdate
        FROM bronze
    )
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(l_extendedprice) AS DOUBLE) AS sum_price,
           CAST(MIN(l_shipdate) AS VARCHAR) AS min_shipdate,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey
    FROM silver
    GROUP BY l_returnflag
    """,
)
def q_bronze_silver_roundtrip(spark, sf_dir):
    """§1.3's two-layer type system end-to-end: typed -> all-string
    bronze (the reference's TEXT staging, `s3-to-rds.py:164-183`) ->
    explicitly-typed silver (the autodetect/JSON-schema layer) ->
    aggregate. Proves values survive the staging representation."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        dec("l_extendedprice").alias("l_extendedprice"),
        "l_returnflag",
        "l_shipdate",
    )
    bronze = to_bronze(li)
    silver = to_silver(
        bronze,
        {
            "l_orderkey": T.LongType(),
            "l_linenumber": T.LongType(),
            "l_quantity": T.DoubleType(),
            "l_extendedprice": T.DecimalType(18, 2),
            "l_returnflag": T.StringType(),
            "l_shipdate": T.TimestampType(),
        },
    )
    return silver.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum("l_extendedprice").cast("double").alias("sum_price"),
        F.min("l_shipdate").cast("string").alias("min_shipdate"),
        F.max("l_orderkey").cast("long").alias("max_orderkey"),
    )


@query(
    "q_audit_stamping",
    oracle="""
    SELECT COUNT(*) AS n_rows, COUNT(*) AS n_stamped
    FROM supplier
    """,
)
def q_audit_stamping(spark, sf_dir):
    """P2 audit column: every ingested row carries a non-null ingest
    timestamp (`s3-to-rds.py:226-229`). The stamp itself is wall-clock
    (excluded from value comparison per SURVEY §7.3); the checkable
    invariant is full coverage: n_stamped == n_rows."""
    stamped = with_audit_column(t(spark, sf_dir, "supplier"))
    return stamped.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("created_date").alias("n_stamped"),
    )


@query(
    "q_null_normalize",
    oracle="""
    SELECT o_orderkey,
           COALESCE(CAST(o_orderstatus AS VARCHAR), '') AS status_filled,
           COALESCE(o_totalprice, 0.0) AS price_filled,
           CAST(o_totalprice IS NULL AS BOOLEAN) AS price_was_null
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_totalprice END AS o_totalprice
        FROM orders
    )
    WHERE o_orderkey % 5 = 0
    """,
)
def q_null_normalize(spark, sf_dir):
    """Null normalization (P3): the reference blanket-fills NaN/None
    before loading (`rds-to-bq.py:281`, `s3-to-rds.py:400-405`). The
    engine's form: ``na.fill`` per type + an explicit was-null flag so
    the fill is auditable. Nulls are injected deterministically since
    the synthetic tables have none."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 5 == 0)
    with_nulls = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 11 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return with_nulls.select(
        "o_orderkey",
        F.col("o_orderstatus").isNull().alias("_status_null"),
        F.col("o_totalprice").isNull().alias("price_was_null"),
        "o_orderstatus",
        "o_totalprice",
    ).na.fill({"o_orderstatus": "", "o_totalprice": 0.0}).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status_filled"),
        F.col("o_totalprice").alias("price_filled"),
        "price_was_null",
    )
