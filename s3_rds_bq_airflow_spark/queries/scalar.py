"""Scalar-function operators (SURVEY §2.8: F1-F8).

String cleaning, date/time, math, JSON extraction, boolean/CASE
logic — all JVM-side `pyspark.sql.functions`, fully inside
whole-stage codegen; no Python in the row path.

Cross-engine notes: only functions with identical semantics in Spark
and DuckDB appear in oracle-checked outputs (e.g. `dayofweek` is
avoided — Spark counts 1=Sunday, DuckDB 0=Sunday; `pow` is avoided —
library-dependent rounding; `sqrt` is IEEE-exact so it's fine).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from ._util import dec, dsum, t


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS segment_lower,
           LENGTH(c_name) AS name_len,
           SUBSTRING(c_name, 1, 9) AS name_prefix,
           c_name || '/' || c_mktsegment AS name_seg,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           TRIM(LPAD(CAST(c_custkey AS VARCHAR), 10, '0')) AS key_padded,
           REVERSE(c_mktsegment) AS segment_rev
    FROM customer
    """,
)
def q_string_funcs(spark, sf_dir):
    """String family (F1): case, length, substring, concat, replace,
    pad, reverse — the reference's sanitization vocabulary exposed as
    row-level expressions."""
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.trim(F.lpad(F.col("c_custkey").cast("string"), 10, "0")).alias("key_padded"),
        F.reverse(F.col("c_mktsegment")).alias("segment_rev"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS order_quarter,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS first_day,
           CAST(MAX(DATE_DIFF('day', CAST(TIMESTAMP '1995-01-01 00:00:00' AS DATE), CAST(o_orderdate AS DATE))) AS BIGINT) AS max_days_since_epoch0
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def q_date_funcs(spark, sf_dir):
    """Date/time family (F2): extract parts, truncate, day diffs —
    time-bucketed revenue (the canonical warehouse rollup)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
            F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
            F.min(F.col("o_orderdate").cast("date")).cast("string").alias("first_day"),
            F.max(
                F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            ).cast("long").alias("max_days_since_epoch0"),
        )
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ABS(CAST(l_extendedprice AS DECIMAL(18,2)) - 1000) AS DOUBLE) AS price_minus_1k,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           l_linenumber % 3 AS line_mod3,
           SQRT(l_quantity) AS qty_sqrt,
           GREATEST(l_quantity, 10.0) AS qty_at_least_10,
           LEAST(l_quantity, 40.0) AS qty_at_most_40,
           CAST(SIGN(l_quantity - 25) AS BIGINT) AS qty_sign
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def q_math_funcs(spark, sf_dir):
    """Math family (F3): abs/ceil/floor/mod/sqrt/greatest/least/sign."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(dec("l_extendedprice") - 1000).cast("double").alias("price_minus_1k"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        (F.col("l_linenumber") % 3).alias("line_mod3"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.greatest(F.col("l_quantity"), F.lit(10.0)).alias("qty_at_least_10"),
        F.least(F.col("l_quantity"), F.lit(40.0)).alias("qty_at_most_40"),
        F.signum(F.col("l_quantity") - 25).cast("long").alias("qty_sign"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def q_json_funcs(spark, sf_dir):
    """JSON family (F7): extract scalar from a JSON string column
    (`get_json_object` — JVM-side JSON path, no UDF)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


@query(
    "q_case_expr",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS balance_tier,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_or_other,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY 1, 2
    """,
)
def q_case_expr(spark, sf_dir):
    """CASE / COALESCE / NULLIF conditional logic."""
    tier = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        t(spark, sf_dir, "customer")
        .groupBy(
            tier.alias("balance_tier"),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
                "segment_or_other"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_hash_funcs",
    oracle="""
    SELECT c_custkey,
           MD5(c_name) AS name_md5,
           SUBSTRING(MD5(c_name || '/' || c_mktsegment), 1, 16) AS composite_fp
    FROM customer
    WHERE c_custkey % 50 = 0
    """,
)
def q_hash_funcs(spark, sf_dir):
    """Hash family (F5-ish): MD5 content hashes — the engine's
    fingerprinting primitive (also the basis of exact dedup)."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") % 50 == 0)
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("name_md5"),
        F.substring(F.md5(F.concat_ws("/", "c_name", "c_mktsegment")), 1, 16).alias("composite_fp"),
    )


@query(
    "q_regexp_funcs",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)$', 1) AS key_digits,
           CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS key_parsed,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
           CAST(regexp_matches(c_mktsegment, '^(AUTO|BUIL)') AS BOOLEAN) AS seg_prefix_match
    FROM customer
    WHERE c_custkey % 30 = 0
    """,
)
def q_regexp_funcs(spark, sf_dir):
    """Regexp family: capture-group extraction, global replacement,
    pattern predicates — all JVM-side (regexp_extract/replace/rlike),
    the workhorses of the text-cleaning tier."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") % 30 == 0)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("key_digits"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("long").alias("key_parsed"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("name_masked"),
        F.col("c_mktsegment").rlike("^(AUTO|BUIL)").alias("seg_prefix_match"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT user_id,
           COUNT(DISTINCT event_type) AS n_types,
           NULLIF(COUNT(*) FILTER (WHERE event_type = 'click'), 0) AS clicks,
           NULLIF(COUNT(*) FILTER (WHERE event_type = 'purchase'), 0) AS purchases
    FROM events
    WHERE user_id % 10 = 0
    GROUP BY user_id
    """,
)
def q_map_funcs(spark, sf_dir):
    """Map type family: build a real map<string,bigint> column
    (collect_list -> map_from_entries) and read it back with
    size/element_at — the oracle states the same scalars
    relationally (missing key -> NULL on both sides)."""
    e = t(spark, sf_dir, "events").where(F.col("user_id") % 10 == 0)
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    mapped = (
        counts.groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
            ).alias("type_counts")
        )
    )
    return mapped.select(
        "user_id",
        F.size("type_counts").alias("n_types"),
        F.element_at("type_counts", "click").alias("clicks"),
        F.element_at("type_counts", "purchase").alias("purchases"),
    )


@query(
    "q_null_semantics",
    oracle="""
    SELECT o_orderkey,
           status_n IS DISTINCT FROM 'O' AS not_open_null_safe,
           status_n IS NOT DISTINCT FROM NULL AS is_null_strict,
           COALESCE(status_n, prio_n, 'NONE') AS first_non_null,
           CAST(status_n = 'O' AS BOOLEAN) AS three_valued_eq
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS status_n,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END AS prio_n
        FROM orders
    )
    WHERE o_orderkey % 4 = 0
    """,
)
def q_null_semantics(spark, sf_dir):
    """Three-valued logic surface: null-safe (IS [NOT] DISTINCT FROM /
    eqNullSafe) vs three-valued equality, coalesce chains — injected
    nulls make every branch observable."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 4 == 0)
    status_n = F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(F.col("o_orderstatus"))
    prio_n = F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(F.col("o_orderpriority"))
    return o.select(
        "o_orderkey",
        (~status_n.eqNullSafe(F.lit("O"))).alias("not_open_null_safe"),
        status_n.eqNullSafe(F.lit(None)).alias("is_null_strict"),
        F.coalesce(status_n, prio_n, F.lit("NONE")).alias("first_non_null"),
        (status_n == "O").alias("three_valued_eq"),
    )


@query(
    "q_geojson_points",
    oracle="""
    WITH g AS (
        SELECT s_suppkey,
               '{"type":"Point","coordinates":['
                 || CAST(s_suppkey % 360 - 180 AS VARCHAR) || ','
                 || CAST(s_suppkey % 180 - 90 AS VARCHAR) || ']}' AS geojson
        FROM supplier
    )
    SELECT s_suppkey, geojson,
           json_extract_string(geojson, '$.type') AS geom_type,
           CAST(json_extract_string(geojson, '$.coordinates[0]') AS BIGINT) AS lng_back,
           CAST(json_extract_string(geojson, '$.coordinates[1]') AS BIGINT) AS lat_back
    FROM g
    """,
)
def q_geojson_points(spark, sf_dir):
    """F6 spatial -> JSON: the reference rewrites spatial columns to
    GeoJSON in scan projections (`tap_mysql` discovery ST_AsGeoJSON,
    SURVEY S17/F6 — marked n/a in round 1 because neither dataset
    carries spatial columns; synthetic key-derived coordinates close
    the gap). Emits RFC-7946 Point features as text and proves the
    encoding is parseable by extracting type + coordinates back via
    JSON-path on both engines. Integer-valued coordinates keep the
    text rendering engine-portable."""
    s = t(spark, sf_dir, "supplier")
    geojson = F.concat(
        F.lit('{"type":"Point","coordinates":['),
        (F.col("s_suppkey") % 360 - 180).cast("string"),
        F.lit(","),
        (F.col("s_suppkey") % 180 - 90).cast("string"),
        F.lit("]}"),
    )
    return s.select(
        "s_suppkey",
        geojson.alias("geojson"),
        F.get_json_object(geojson, "$.type").alias("geom_type"),
        F.get_json_object(geojson, "$.coordinates[0]").cast("long").alias("lng_back"),
        F.get_json_object(geojson, "$.coordinates[1]").cast("long").alias("lat_back"),
    )


@query(
    "q_geojson_geometries",
    oracle="""
    WITH base AS (
        SELECT s_suppkey,
               CAST(s_suppkey % 360 - 180 AS VARCHAR) AS x,
               CAST(s_suppkey % 180 - 90 AS VARCHAR) AS y,
               CAST(s_suppkey % 360 - 179 AS VARCHAR) AS x1,
               CAST(s_suppkey % 180 - 89 AS VARCHAR) AS y1
        FROM supplier
    ),
    g AS (
        SELECT s_suppkey,
               CASE WHEN s_suppkey % 2 = 0
                    THEN '{"type":"LineString","coordinates":[['
                         || x || ',' || y || '],[' || x1 || ',' || y || '],['
                         || x1 || ',' || y1 || ']]}'
                    ELSE '{"type":"Polygon","coordinates":[[['
                         || x || ',' || y || '],[' || x1 || ',' || y || '],['
                         || x1 || ',' || y1 || '],[' || x || ',' || y || ']]]}'
               END AS geojson
        FROM base
    )
    SELECT s_suppkey, geojson,
           json_extract_string(geojson, '$.type') AS geom_type,
           CAST(json_array_length(CASE WHEN json_extract_string(geojson, '$.type') = 'Polygon'
                     THEN json_extract(geojson, '$.coordinates[0]')
                     ELSE json_extract(geojson, '$.coordinates') END) AS BIGINT) AS n_vertices,
           CAST(CASE WHEN json_extract_string(geojson, '$.type') = 'Polygon'
                     THEN json_extract_string(geojson, '$.coordinates[0][0]')
                          = json_extract_string(geojson, '$.coordinates[0][3]')
                     ELSE FALSE END AS BIGINT) AS ring_closed,
           CAST(CASE WHEN json_extract_string(geojson, '$.type') = 'Polygon'
                     THEN json_extract_string(geojson, '$.coordinates[0][0][0]')
                     ELSE json_extract_string(geojson, '$.coordinates[0][0]') END
                AS BIGINT) AS first_x
    FROM g
    """,
)
def q_geojson_geometries(spark, sf_dir):
    """F6/S17 beyond Points: ST_AsGeoJSON emits ANY geometry in the
    reference's scan projections (`tap_mysql/sync_strategies/
    common.py:79-81`); this closes the LineString/Polygon shapes with
    RFC-7946 text built from key-derived integer coordinates —
    alternating geometry type per key, Polygon rings CLOSED (first
    vertex repeated last). Parse-back proves well-formedness on both
    engines: type tag, vertex count (ring vs line path depth), ring
    closure, and the first coordinate, all via JSON paths. Pure
    JVM-side string/JSON expressions — zero shuffle, scan-projection
    shaped, exactly like the reference's per-row rewrite."""
    s = t(spark, sf_dir, "supplier")
    x = (F.col("s_suppkey") % 360 - 180).cast("string")
    y = (F.col("s_suppkey") % 180 - 90).cast("string")
    x1 = (F.col("s_suppkey") % 360 - 179).cast("string")
    y1 = (F.col("s_suppkey") % 180 - 89).cast("string")

    def pt(px, py):
        return F.concat(F.lit("["), px, F.lit(","), py, F.lit("]"))

    line = F.concat(
        F.lit('{"type":"LineString","coordinates":['),
        pt(x, y), F.lit(","), pt(x1, y), F.lit(","), pt(x1, y1),
        F.lit("]}"),
    )
    poly = F.concat(
        F.lit('{"type":"Polygon","coordinates":[['),
        pt(x, y), F.lit(","), pt(x1, y), F.lit(","), pt(x1, y1), F.lit(","), pt(x, y),
        F.lit("]]}"),
    )
    geojson = F.when(F.col("s_suppkey") % 2 == 0, line).otherwise(poly)
    gtype = F.get_json_object(geojson, "$.type")
    is_poly = gtype == "Polygon"
    ring = F.when(is_poly, F.get_json_object(geojson, "$.coordinates[0]")).otherwise(
        F.get_json_object(geojson, "$.coordinates")
    )
    ring_closed = F.when(
        is_poly,
        F.get_json_object(geojson, "$.coordinates[0][0]")
        == F.get_json_object(geojson, "$.coordinates[0][3]"),
    ).otherwise(F.lit(False))
    first_x = F.when(
        is_poly, F.get_json_object(geojson, "$.coordinates[0][0][0]")
    ).otherwise(F.get_json_object(geojson, "$.coordinates[0][0]"))
    return s.select(
        "s_suppkey",
        geojson.alias("geojson"),
        gtype.alias("geom_type"),
        F.json_array_length(ring).cast("long").alias("n_vertices"),
        ring_closed.cast("long").alias("ring_closed"),
        first_x.cast("long").alias("first_x"),
    )


@query(
    "q_geojson_multi",
    oracle="""
    WITH base AS (
        SELECT s_suppkey,
               s_suppkey % 4 AS m,
               CAST(s_suppkey % 360 - 180 AS VARCHAR) AS x,
               CAST(s_suppkey % 180 - 90 AS VARCHAR) AS y,
               CAST(s_suppkey % 360 - 179 AS VARCHAR) AS x1,
               CAST(s_suppkey % 180 - 89 AS VARCHAR) AS y1
        FROM supplier
    ),
    g AS (
        SELECT s_suppkey, m,
               CASE m
                 WHEN 0 THEN '{"type":"MultiPoint","coordinates":[['
                      || x || ',' || y || '],[' || x1 || ',' || y1 || ']]}'
                 WHEN 1 THEN '{"type":"MultiLineString","coordinates":[[['
                      || x || ',' || y || '],[' || x1 || ',' || y || ']],[['
                      || x1 || ',' || y1 || '],[' || x || ',' || y1 || ']]]}'
                 WHEN 2 THEN '{"type":"MultiPolygon","coordinates":[[[['
                      || x || ',' || y || '],[' || x1 || ',' || y || '],['
                      || x1 || ',' || y1 || '],[' || x || ',' || y || ']]]]}'
                 ELSE '{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":['
                      || x || ',' || y || ']},{"type":"LineString","coordinates":[['
                      || x || ',' || y || '],[' || x1 || ',' || y1 || ']]}]}'
               END AS geojson
        FROM base
    )
    SELECT s_suppkey, geojson,
           json_extract_string(geojson, '$.type') AS geom_type,
           CAST(json_array_length(CASE WHEN m = 3
                     THEN json_extract(geojson, '$.geometries')
                     ELSE json_extract(geojson, '$.coordinates') END) AS BIGINT)
               AS n_parts,
           CAST(CASE m
                 WHEN 0 THEN json_extract_string(geojson, '$.coordinates[0][0]')
                 WHEN 1 THEN json_extract_string(geojson, '$.coordinates[0][0][0]')
                 WHEN 2 THEN json_extract_string(geojson, '$.coordinates[0][0][0][0]')
                 ELSE json_extract_string(geojson, '$.geometries[0].coordinates[0]')
               END AS BIGINT) AS first_x,
           CAST(CASE WHEN m = 2
                     THEN json_extract_string(geojson, '$.coordinates[0][0][0]')
                          = json_extract_string(geojson, '$.coordinates[0][0][3]')
                     ELSE FALSE END AS BIGINT) AS ring_closed,
           CASE WHEN m = 3
                THEN json_extract_string(geojson, '$.geometries[1].type')
                ELSE NULL END AS member1_type
    FROM g
    """,
)
def q_geojson_multi(spark, sf_dir):
    """F6/S17 surface completion: ST_AsGeoJSON can emit ANY of the
    seven RFC-7946 geometry types in the reference's scan projections
    (`tap_mysql/sync_strategies/common.py:79-81`); with Point (
    q_geojson_points) and LineString/Polygon (q_geojson_geometries)
    covered, this adds the remaining four — MultiPoint,
    MultiLineString, MultiPolygon, GeometryCollection — cycling by
    key, coordinates key-derived integers for engine-portable text.
    Parse-back proves well-formedness on both engines: type tag,
    member/part count (geometries[] vs coordinates[] depth), the first
    coordinate at each type's nesting depth, MultiPolygon ring
    closure, and the collection's second member type. Pure JVM-side
    string/JSON expressions — zero shuffle, scan-projection shaped."""
    s = t(spark, sf_dir, "supplier")
    m = F.col("s_suppkey") % 4
    x = (F.col("s_suppkey") % 360 - 180).cast("string")
    y = (F.col("s_suppkey") % 180 - 90).cast("string")
    x1 = (F.col("s_suppkey") % 360 - 179).cast("string")
    y1 = (F.col("s_suppkey") % 180 - 89).cast("string")

    def pt(px, py):
        return F.concat(F.lit("["), px, F.lit(","), py, F.lit("]"))

    multipoint = F.concat(
        F.lit('{"type":"MultiPoint","coordinates":['),
        pt(x, y), F.lit(","), pt(x1, y1), F.lit("]}"),
    )
    multiline = F.concat(
        F.lit('{"type":"MultiLineString","coordinates":[['),
        pt(x, y), F.lit(","), pt(x1, y), F.lit("],["),
        pt(x1, y1), F.lit(","), pt(x, y1), F.lit("]]}"),
    )
    multipoly = F.concat(
        F.lit('{"type":"MultiPolygon","coordinates":[[['),
        pt(x, y), F.lit(","), pt(x1, y), F.lit(","), pt(x1, y1), F.lit(","), pt(x, y),
        F.lit("]]]}"),
    )
    collection = F.concat(
        F.lit('{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":['),
        x, F.lit(","), y,
        F.lit(']},{"type":"LineString","coordinates":['),
        pt(x, y), F.lit(","), pt(x1, y1), F.lit("]}]}"),
    )
    geojson = (
        F.when(m == 0, multipoint)
        .when(m == 1, multiline)
        .when(m == 2, multipoly)
        .otherwise(collection)
    )
    n_parts = F.json_array_length(
        F.when(m == 3, F.get_json_object(geojson, "$.geometries")).otherwise(
            F.get_json_object(geojson, "$.coordinates")
        )
    ).cast("long")
    first_x = (
        F.when(m == 0, F.get_json_object(geojson, "$.coordinates[0][0]"))
        .when(m == 1, F.get_json_object(geojson, "$.coordinates[0][0][0]"))
        .when(m == 2, F.get_json_object(geojson, "$.coordinates[0][0][0][0]"))
        .otherwise(F.get_json_object(geojson, "$.geometries[0].coordinates[0]"))
        .cast("long")
    )
    ring_closed = F.when(
        m == 2,
        F.get_json_object(geojson, "$.coordinates[0][0][0]")
        == F.get_json_object(geojson, "$.coordinates[0][0][3]"),
    ).otherwise(F.lit(False))
    member1_type = F.when(m == 3, F.get_json_object(geojson, "$.geometries[1].type"))
    return s.select(
        "s_suppkey",
        geojson.alias("geojson"),
        F.get_json_object(geojson, "$.type").alias("geom_type"),
        n_parts.alias("n_parts"),
        first_x.alias("first_x"),
        ring_closed.cast("long").alias("ring_closed"),
        member1_type.alias("member1_type"),
    )


# UUIDv3 bit surgery: nibble 13 is the version ('3' = name-based MD5),
# nibble 17 carries the variant ((n & 0x3) | 0x8 -> 8/9/a/b).
_UUID_VARIANT_SQL = """CASE WHEN SUBSTRING(h, 17, 1) IN ('0','4','8','c') THEN '8'
         WHEN SUBSTRING(h, 17, 1) IN ('1','5','9','d') THEN '9'
         WHEN SUBSTRING(h, 17, 1) IN ('2','6','a','e') THEN 'a'
         ELSE 'b' END"""


@query(
    "q_uuid_deterministic",
    oracle=f"""
    WITH m AS (
        SELECT o_orderkey, MD5('orders:' || CAST(o_orderkey AS VARCHAR)) AS h
        FROM orders WHERE o_orderkey % 50 = 0
    )
    SELECT o_orderkey,
           SUBSTRING(h, 1, 8) || '-' || SUBSTRING(h, 9, 4) || '-3'
             || SUBSTRING(h, 14, 3) || '-' || {_UUID_VARIANT_SQL}
             || SUBSTRING(h, 18, 3) || '-' || SUBSTRING(h, 21, 12) AS row_uuid
    FROM m
    """,
)
def q_uuid_deterministic(spark, sf_dir):
    """F8 UUID, determinized: the reference's `uuid.uuid4()` row ids
    are unverifiable by construction; the engine's form is a
    name-based UUIDv3 (RFC 4122: MD5 of a namespace:key name, version
    nibble 3, variant bits 10xx) — same format, replayable, so the
    driver CAN hash-check it. Pure JVM md5/substring expressions."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 50 == 0)
    h = F.md5(F.concat(F.lit("orders:"), F.col("o_orderkey").cast("string")))
    m = o.select("o_orderkey", h.alias("h"))
    n17 = F.substring("h", 17, 1)
    variant = (
        F.when(n17.isin("0", "4", "8", "c"), "8")
        .when(n17.isin("1", "5", "9", "d"), "9")
        .when(n17.isin("2", "6", "a", "e"), "a")
        .otherwise("b")
    )
    return m.select(
        "o_orderkey",
        F.concat(
            F.substring("h", 1, 8), F.lit("-"),
            F.substring("h", 9, 4), F.lit("-3"),
            F.substring("h", 14, 3), F.lit("-"),
            variant,
            F.substring("h", 18, 3), F.lit("-"),
            F.substring("h", 21, 12),
        ).alias("row_uuid"),
    )


@query(
    "q_unpivot",
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS gross,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 0.1 AS DOUBLE) AS tax,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 0.9 AS DOUBLE) AS net
        FROM orders WHERE o_orderkey % 100 = 0
    )
    SELECT o_orderkey, 'gross' AS metric, gross AS amount FROM base
    UNION ALL SELECT o_orderkey, 'tax', tax FROM base
    UNION ALL SELECT o_orderkey, 'net', net FROM base
    """,
)
def q_unpivot(spark, sf_dir):
    """UNPIVOT — wide metrics to long (metric, amount) rows, the
    inverse of q_pivot_event_type: Spark's native ``unpivot`` (melt)
    against a UNION-ALL oracle. A pure generator projection: rows
    fan out 3x with no shuffle."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 100 == 0)
    base = o.select(
        "o_orderkey",
        dec("o_totalprice").cast("double").alias("gross"),
        (dec("o_totalprice") * F.lit("0.1").cast("decimal(2,1)")).cast("double").alias("tax"),
        (dec("o_totalprice") * F.lit("0.9").cast("decimal(2,1)")).cast("double").alias("net"),
    )
    return base.unpivot(
        ids=["o_orderkey"],
        values=["gross", "tax", "net"],
        variableColumnName="metric",
        valueColumnName="amount",
    )


@query(
    "q_array_lambda",
    oracle="""
    WITH k AS (
        SELECT c_custkey, c_custkey % 20 + 3 AS k
        FROM customer WHERE c_custkey % 30 = 0
    )
    SELECT c_custkey,
           CAST(k AS BIGINT) AS n_elems,
           CAST(k * (k + 1) * (2 * k + 1) // 6 AS BIGINT) AS sum_squares,
           CAST(k // 2 AS BIGINT) AS n_even,
           CAST(k * (k + 1) AS BIGINT) AS zip_sum,
           TRUE AS has_large
    FROM k
    """,
)
def q_array_lambda(spark, sf_dir):
    """Higher-order array lambdas (transform / filter / aggregate /
    zip_with / exists) — the Catalyst functional-collection surface
    that keeps array logic JVM-side where row-at-a-time UDFs would
    otherwise creep in. Each lambda's result has a closed form over
    the generated sequence(1, k): sum of squares k(k+1)(2k+1)/6,
    even count floor(k/2), zip_with(arr, reverse(arr), +) summing to
    k(k+1) — the oracle states the formulas directly."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") % 30 == 0)
    k = (F.col("c_custkey") % 20 + 3).cast("int")
    arr = F.sequence(F.lit(1), k)
    return c.select(
        "c_custkey",
        F.size(arr).cast("long").alias("n_elems"),
        F.aggregate(
            F.transform(arr, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_squares"),
        F.size(F.filter(arr, lambda x: x % 2 == 0)).cast("long").alias("n_even"),
        F.aggregate(
            F.zip_with(arr, F.reverse(arr), lambda a, b: (a + b).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("zip_sum"),
        F.exists(arr, lambda x: x >= k).alias("has_large"),
    )
