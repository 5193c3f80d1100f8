"""Ingestion-semantics queries (SURVEY §2.1/2.2: P1, P2, S6, §1.3).

Declared-query form of the reference's signature behaviors: column
sanitization, audit stamping, and the all-TEXT bronze -> typed silver
staging pair. All pure column projections/casts — collapsed into the
scan by Catalyst, zero extra passes.
"""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from ..ingest import (
    sanitize_columns,
    silver_from_jsonschema,
    to_bronze,
    to_silver,
    unpack_fixed,
    with_audit_column,
    wrap_fixed,
)
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


@query(
    "q_jsonschema_silver",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custkeys,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           STRFTIME(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_orderdate,
           CAST(SUM(o_orderkey % 5) AS DOUBLE) / COUNT(*) AS avg_prio_rank,
           CAST(SUM(2) AS BIGINT) AS n_tags
    FROM orders
    WHERE o_orderkey % 20 = 0
    GROUP BY o_orderstatus
    """,
)
def q_jsonschema_silver(spark, sf_dir):
    """JSON-schema -> Spark type translation end-to-end (SURVEY §1.3
    Layer B/C; `tap_mysql/discover_utils.py:241-299`,
    `target_bigquery/core.py:1076-1097,806-820`): an all-string bronze
    frame is silvered via a JSON-schema spec exercising integer
    byte-width bounds (int32 custkey, uint8 prio_rank), decimal
    ``multipleOf`` (price -> DECIMAL scale 2), ``date-time`` format,
    nested object -> struct and array -> repeated — then aggregated.
    The oracle computes the same values from the typed table directly:
    equality proves the translation is lossless."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    typed = o.select(
        "o_orderkey",
        "o_custkey",
        dec("o_totalprice").alias("o_totalprice"),
        "o_orderdate",
        "o_orderstatus",
        F.to_json(
            F.struct(
                F.col("o_orderpriority").alias("prio_label"),
                (F.col("o_orderkey") % 5).alias("prio_rank"),
                F.array("o_orderstatus", "o_orderpriority").alias("tags"),
            )
        ).alias("payload"),
    )
    bronze = to_bronze(typed)
    silver = silver_from_jsonschema(
        bronze,
        {
            "properties": {
                "o_orderkey": {
                    "type": ["null", "integer"],
                    "minimum": -(2**63),
                    "maximum": 2**63 - 1,
                },
                "o_custkey": {
                    "type": ["null", "integer"],
                    "minimum": -(2**31),
                    "maximum": 2**31 - 1,
                },
                "o_totalprice": {"type": ["null", "number"], "multipleOf": 0.01},
                "o_orderdate": {"type": ["null", "string"], "format": "date-time"},
                "o_orderstatus": {"type": ["null", "string"], "maxLength": 1},
                "payload": {
                    "type": ["null", "object"],
                    "properties": {
                        "prio_label": {"type": ["null", "string"]},
                        "prio_rank": {
                            "type": ["null", "integer"],
                            "minimum": 0,
                            "maximum": 255,
                        },
                        "tags": {
                            "type": "array",
                            "items": {"type": ["null", "string"]},
                        },
                    },
                },
            }
        },
    )
    return silver.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").cast("long").alias("n_custkeys"),
        F.sum("o_totalprice").cast("double").alias("sum_price"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias(
            "min_orderdate"
        ),
        F.avg("payload.prio_rank").alias("avg_prio_rank"),
        F.sum(F.size("payload.tags")).cast("long").alias("n_tags"),
    )


@query(
    "q_fixed_wrap_roundtrip",
    oracle="""
    SELECT s_nationkey,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
           MAX(s_name) AS max_name,
           CAST(COUNT(*) AS BIGINT) AS n_stamped,
           CAST(MIN(s_suppkey) AS BIGINT) AS min_sequence
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def q_fixed_wrap_roundtrip(spark, sf_dir):
    """"Fixed" ingestion mode wrap -> unpack roundtrip
    (`target_bigquery/core.py:448-465` preprocess_record +
    `core.py:765-790` generated view): supplier rows are wrapped as a
    single ``data`` JSON column + ``_sdc_*`` lineage (deterministic
    stamps — sequence = suppkey, fixed extract time), then unpacked
    through the JSON-schema-translated StructType and aggregated.
    Equality with the plain-table oracle proves the fixed encoding is
    lossless, including float round-trip through JSON text."""
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        dec("s_acctbal").alias("s_acctbal"),
    )
    wrapped = wrap_fixed(
        s,
        meta={
            "_sdc_extracted_at": F.to_timestamp(F.lit("2026-01-01 00:00:00")),
            "_sdc_sequence": F.col("s_suppkey"),
            "_sdc_table_version": F.lit(1),
        },
    )
    unpacked = unpack_fixed(
        wrapped,
        {
            "properties": {
                "s_suppkey": {
                    "type": ["null", "integer"],
                    "minimum": -(2**63),
                    "maximum": 2**63 - 1,
                },
                "s_name": {"type": ["null", "string"]},
                "s_nationkey": {
                    "type": ["null", "integer"],
                    "minimum": -(2**31),
                    "maximum": 2**31 - 1,
                },
                "s_acctbal": {"type": ["null", "number"], "multipleOf": 0.01},
            }
        },
        keep_meta=True,
    )
    return unpacked.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("s_acctbal").cast("double").alias("sum_acctbal"),
        F.max("s_name").alias("max_name"),
        F.count("_sdc_extracted_at").cast("long").alias("n_stamped"),
        F.min("_sdc_sequence").cast("long").alias("min_sequence"),
    )


@query(
    "q_ts_serialization",
    oracle="""
    SELECT event_id,
           CASE WHEN strftime(ts, '%f') = '000000'
                THEN strftime(ts, '%Y-%m-%dT%H:%M:%S') || '+00:00'
                ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || '+00:00'
           END AS ts_iso,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') || 'T00:00:00+00:00' AS date_iso,
           strftime(ts, '%H:%M:%S') AS time_hms
    FROM events
    WHERE event_id % 97 = 0
    """,
)
def q_ts_serialization(spark, sf_dir):
    """Singer row-serialization parity (`tap_mysql/sync_strategies/
    common.py:97-110`): datetime -> ``isoformat()+'+00:00'``
    (microseconds emitted only when non-zero, Python isoformat
    semantics), date -> ``isoformat()+'T00:00:00+00:00'``, and
    TIME-typed values -> ``'HH:MM:SS'`` — the reference's signature
    row encoding, mirrored in DuckDB via strftime."""
    e = t(spark, sf_dir, "events").where(F.col("event_id") % 97 == 0)
    frac = F.date_format("ts", "SSSSSS")
    return e.select(
        "event_id",
        F.concat(
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
            F.when(frac != "000000", F.concat(F.lit("."), frac)).otherwise(
                F.lit("")
            ),
            F.lit("+00:00"),
        ).alias("ts_iso"),
        F.concat(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd"),
            F.lit("T00:00:00+00:00"),
        ).alias("date_iso"),
        F.date_format("ts", "HH:mm:ss").alias("time_hms"),
    )


@query(
    "q_schema_evolution",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey % 3 <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_status,
           CAST(SUM(CASE WHEN o_orderkey % 3 <> 0
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_price,
           CAST(MAX(o_orderkey) AS DOUBLE) AS max_key
    FROM orders
    """,
)
def q_schema_evolution(spark, sf_dir):
    """Schema evolution across ingest batches (`ingest/evolve.py` —
    the explicit form of the reference's per-batch BigQuery
    autodetect, `rds-to-bq.py:287-294`): three batches with drifting
    schemas — a column missing, a column added, the key type widening
    long -> double — union under the evolved schema with NULL
    backfill. The oracle recomputes from the un-drifted source:
    equality proves evolution loses nothing and widens exactly."""
    from ..ingest.evolve import evolved_union

    o = t(spark, sf_dir, "orders")
    b1 = o.where(F.col("o_orderkey") % 3 == 0).select("o_orderkey", "o_orderstatus")
    b2 = o.where(F.col("o_orderkey") % 3 == 1).select(
        F.col("o_orderkey").cast("double").alias("o_orderkey"),
        dec("o_totalprice").alias("o_totalprice"),
    )
    b3 = o.where(F.col("o_orderkey") % 3 == 2).select(
        "o_orderkey", "o_orderstatus", dec("o_totalprice").alias("o_totalprice")
    )
    evolved = evolved_union([b1, b2, b3])
    return evolved.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderstatus").cast("long").alias("n_status"),
        F.sum("o_totalprice").cast("double").alias("sum_price"),
        F.max("o_orderkey").cast("double").alias("max_key"),
    )


@query(
    "q_rare_category_collapse",
    oracle="""
    WITH counts AS (
        SELECT props ->> '$.k' AS raw_k, COUNT(*) AS n
        FROM events GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_cats FROM counts),
    mapped AS (
        SELECT CASE WHEN 10 * n * tot.n_cats >= 9 * tot.total THEN raw_k
                    ELSE '__OTHER__' END AS category, n
        FROM counts, tot
    )
    SELECT category,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_raw_values
    FROM mapped
    GROUP BY category
    """,
)
def q_rare_category_collapse(spark, sf_dir):
    """Rare-category collapsing — the cardinality-control step before
    one-hot/embedding feature encoding (and before any groupBy whose
    key cardinality would explode state): categories seen fewer than
    200 times fold into '__OTHER__', each surviving category reports
    its event mass and how many raw values it absorbed.

    Scale shape: the decision runs on the CATEGORY-COUNT aggregate
    (map-side combined; key-cardinality-sized, not corpus-sized), so
    the collapse map is small enough to broadcast back for row-level
    re-labeling at 100 TB — here the re-labeled rollup is derived
    directly from the counts, proving the mapping without a second
    corpus pass."""
    counts = (
        t(spark, sf_dir, "events")
        .select(
            F.get_json_object("props", "$.k").alias("raw_k"),
        )
        .groupBy("raw_k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_cats")
    )
    mapped = counts.crossJoin(F.broadcast(tot)).select(
        F.when(
            10 * F.col("n") * F.col("n_cats") >= 9 * F.col("total"),
            F.col("raw_k"),
        )
        .otherwise("__OTHER__")
        .alias("category"),
        "n",
    )
    return mapped.groupBy("category").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_raw_values"),
    )


@query(
    "q_dead_letter_parse",
    oracle="""
    WITH raw AS (
        SELECT event_type,
               CASE WHEN event_id % 13 = 0
                    THEN substr(props, 1, len(props) - 1)
                    ELSE props END AS payload
        FROM events WHERE props IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN json_valid(payload) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_parsed,
           CAST(SUM(CASE WHEN json_valid(payload) THEN 0 ELSE 1 END)
                AS BIGINT) AS n_dead_letter
    FROM raw GROUP BY event_type
    """,
)
def q_dead_letter_parse(spark, sf_dir):
    """Dead-letter accounting for malformed payloads — the ingestion
    contract every production pipeline needs (reference S6's
    all-TEXT staging exists precisely so bad rows land somewhere
    recoverable): payloads are deterministically corrupted (every
    13th row loses its closing byte), parsed permissively, and rows
    that fail to parse are COUNTED per type rather than crashing the
    job or silently dropping. Parse-failure detection is engine-
    equivalent (get_json_object('$.k') -> NULL in Spark iff
    json_valid() false in DuckDB, since every intact payload carries
    $.k), which the hash check certifies.

    Scale shape: zero-shuffle row-local parse + one small rollup; the
    dead-letter SINK path (write failed rows aside with their error)
    is `ingest/bronze_silver` + the multimodal dead-letter pattern —
    this query pins the classification logic."""
    raw = (
        t(spark, sf_dir, "events")
        .where(F.col("props").isNotNull())
        .select(
            "event_type",
            F.when(
                F.col("event_id") % 13 == 0,
                F.expr("substring(props, 1, length(props) - 1)"),
            )
            .otherwise(F.col("props"))
            .alias("payload"),
        )
    )
    # PERMISSIVE from_json yields a NON-null struct of nulls for
    # malformed input, so struct-null is not a failure signal; the
    # portable detector is path extraction (null iff unparseable,
    # given every valid payload carries $.k).
    parsed = raw.withColumn(
        "ok", F.get_json_object("payload", "$.k").isNotNull()
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("long").alias("n_parsed"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1))
        .cast("long")
        .alias("n_dead_letter"),
    )
