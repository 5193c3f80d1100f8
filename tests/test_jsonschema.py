"""Unit tests for JSON-schema -> Spark translation and fixed-mode wrap.

Reference semantics under test: ``tap_mysql/discover_utils.py:241-299``
(integer bounds, decimal multipleOf, format tags),
``target_bigquery/core.py:1076-1097`` (type decision order),
``core.py:806-820`` (object -> RECORD, array -> REPEATED),
``core.py:448-465`` (fixed-mode preprocess_record).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F, types as T

from s3_rds_bq_airflow_spark.ingest import (
    SDC_META_COLS,
    silver_from_jsonschema,
    spark_type_for_property,
    struct_for_jsonschema,
    unpack_fixed,
    unpack_view_sql,
    wrap_fixed,
)


def _p(**kw):
    return kw


def test_format_tags_win_over_type():
    assert spark_type_for_property(
        _p(type=["null", "string"], format="date-time")
    ) == T.TimestampType()
    assert spark_type_for_property(
        _p(type=["null", "string"], format="date")
    ) == T.DateType()
    # Spark has no TIME type — ISO 'HH:MM:SS' string retained.
    assert spark_type_for_property(
        _p(type=["null", "string"], format="time")
    ) == T.StringType()
    assert spark_type_for_property(
        _p(type=["null", "string"], format="binary")
    ) == T.BinaryType()


def test_integer_byte_width_bounds():
    # Signed widths, as the tap emits ±2^(bits-1) (discover_utils:258-265).
    def intp(lo, hi):
        return spark_type_for_property(_p(type=["null", "integer"], minimum=lo, maximum=hi))

    assert intp(-(2**7), 2**7 - 1) == T.ByteType()
    assert intp(-(2**15), 2**15 - 1) == T.ShortType()
    assert intp(-(2**31), 2**31 - 1) == T.IntegerType()
    assert intp(-(2**63), 2**63 - 1) == T.LongType()
    # Unsigned widths widen: 0..255 needs int16, 0..2^64-1 exceeds int64.
    assert intp(0, 2**8 - 1) == T.ShortType()
    assert intp(0, 2**32 - 1) == T.LongType()
    assert intp(0, 2**64 - 1) == T.DecimalType(20, 0)
    # No bounds -> long.
    assert spark_type_for_property(_p(type=["null", "integer"])) == T.LongType()


def test_number_decimal_multiple_of():
    assert spark_type_for_property(_p(type=["null", "number"])) == T.DoubleType()
    assert spark_type_for_property(
        _p(type=["null", "number"], multipleOf=0.01)
    ) == T.DecimalType(38, 2)
    assert spark_type_for_property(
        _p(type=["null", "number"], multipleOf=1e-6)
    ) == T.DecimalType(38, 6)
    assert spark_type_for_property(
        _p(type=["null", "number"], multipleOf=1)
    ) == T.DecimalType(38, 0)


def test_bigquery_type_decision_order():
    # integer+string -> string (core.py:1088-1089).
    assert spark_type_for_property(
        _p(type=["null", "integer", "string"])
    ) == T.StringType()
    assert spark_type_for_property(_p(type=["null", "boolean"])) == T.BooleanType()
    # Unknown -> string fallback.
    assert spark_type_for_property(_p(type=["null", "weird"])) == T.StringType()
    # Scalar (non-list) type value accepted.
    assert spark_type_for_property(_p(type="integer")) == T.LongType()
    # anyOf: first branch wins (core.py:796-801).
    assert spark_type_for_property(
        _p(anyOf=[{"type": "string", "format": "date-time"}, {"type": "string"}])
    ) == T.TimestampType()


def test_nested_object_and_array():
    typ = spark_type_for_property(
        _p(
            type=["null", "object"],
            properties={
                "a": {"type": ["null", "integer"]},
                "tags": {"type": "array", "items": {"type": "string"}},
            },
        )
    )
    assert isinstance(typ, T.StructType)
    assert typ["a"].dataType == T.LongType()
    assert typ["tags"].dataType == T.ArrayType(T.StringType(), True)
    # Schemaless object / itemless array -> JSON-string fallbacks.
    assert spark_type_for_property(_p(type=["null", "object"])) == T.StringType()
    assert spark_type_for_property(_p(type=["null", "array"])) == T.ArrayType(
        T.StringType()
    )


def test_silver_from_jsonschema_casts(spark):
    bronze = spark.createDataFrame(
        [("1", "2.50", "2024-03-05 06:07:08", '{"k": 9, "tags": ["x"]}', "keep"),
         ("oops", None, "not-a-date", None, "keep2")],
        ["i", "price", "at", "obj", "extra"],
    )
    silver = silver_from_jsonschema(
        bronze,
        {
            "properties": {
                "i": {"type": ["null", "integer"], "minimum": -128, "maximum": 127},
                "price": {"type": ["null", "number"], "multipleOf": 0.01},
                "at": {"type": ["null", "string"], "format": "date-time"},
                "obj": {
                    "type": ["null", "object"],
                    "properties": {
                        "k": {"type": ["null", "integer"]},
                        "tags": {"type": "array", "items": {"type": "string"}},
                    },
                },
            }
        },
    )
    assert [f.dataType for f in silver.schema.fields] == [
        T.ByteType(),
        T.DecimalType(38, 2),
        T.TimestampType(),
        T.StructType(
            [
                T.StructField("k", T.LongType(), True),
                T.StructField("tags", T.ArrayType(T.StringType(), True), True),
            ]
        ),
        T.StringType(),
    ]
    good, bad = silver.orderBy("extra").collect()
    assert good["i"] == 1 and str(good["price"]) == "2.50"
    assert good["at"] == datetime.datetime(2024, 3, 5, 6, 7, 8)
    assert good["obj"]["k"] == 9 and good["obj"]["tags"] == ["x"]
    # Permissive try_cast: bad values become NULL, row survives.
    assert bad["i"] is None and bad["at"] is None


def test_wrap_fixed_pops_sdc_and_stamps_meta(spark):
    df = spark.createDataFrame(
        [(1, "a", datetime.datetime(2026, 1, 1))],
        ["id", "name", "_sdc_extracted_at"],
    )
    wrapped = wrap_fixed(df, meta={"_sdc_sequence": F.col("id").cast("long")})
    assert wrapped.columns == ["data"] + list(SDC_META_COLS)
    row = wrapped.collect()[0]
    # _sdc_ column popped out of the payload (core.py:455-464)...
    assert "_sdc_extracted_at" not in row["data"]
    assert '"id":1' in row["data"] and '"name":"a"' in row["data"]
    # ...but preserved as a meta column; absent metas are typed NULL.
    assert row["_sdc_extracted_at"] == datetime.datetime(2026, 1, 1)
    assert row["_sdc_sequence"] == 1
    assert row["_sdc_deleted_at"] is None


def test_fixed_roundtrip_and_view(spark):
    df = spark.createDataFrame([(7, "x", 1.5), (8, None, -2.25)], ["id", "s", "v"])
    schema = {
        "properties": {
            "id": {"type": ["null", "integer"]},
            "s": {"type": ["null", "string"]},
            "v": {"type": ["null", "number"]},
        }
    }
    wrapped = wrap_fixed(df)
    back = unpack_fixed(wrapped, schema).orderBy("id").collect()
    assert [(r["id"], r["s"], r["v"]) for r in back] == [(7, "x", 1.5), (8, None, -2.25)]
    # SQL view twin produces the same typed projection.
    wrapped.createOrReplaceTempView("fixed_t")
    sql = unpack_view_sql("fixed_v", "fixed_t", struct_for_jsonschema(schema))
    spark.sql(sql)
    got = spark.sql("SELECT id, s, v FROM fixed_v ORDER BY id").collect()
    assert [(r["id"], r["s"], r["v"]) for r in got] == [(7, "x", 1.5), (8, None, -2.25)]


def test_discovery_roundtrip_identity():
    from s3_rds_bq_airflow_spark.ingest import (
        jsonschema_for_struct,
        property_for_spark_type,
    )

    # Forward(Back(t)) == t on the supported lattice.
    lattice = [
        T.BooleanType(),
        T.ByteType(),
        T.ShortType(),
        T.IntegerType(),
        T.LongType(),
        T.DoubleType(),
        T.DecimalType(38, 2),
        T.TimestampType(),
        T.DateType(),
        T.BinaryType(),
        T.StringType(),
        T.ArrayType(T.LongType(), True),
        T.StructType([T.StructField("k", T.DoubleType(), True)]),
    ]
    for typ in lattice:
        prop = property_for_spark_type(typ)
        back = spark_type_for_property(prop)
        if isinstance(typ, T.DecimalType):
            # Scale survives; precision normalizes to the translator's 38.
            assert isinstance(back, T.DecimalType) and back.scale == typ.scale
        else:
            assert back == typ, typ
    # Unsigned-bigint widening round-trips through its bounds emission.
    assert spark_type_for_property(
        property_for_spark_type(T.DecimalType(20, 0))
    ) == T.DecimalType(20, 0)
    # Whole-struct emission matches the per-field one.
    st = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), True),
        ]
    )
    schema = jsonschema_for_struct(st)
    assert schema["type"] == "object"
    assert set(schema["properties"]) == {"a", "b"}
