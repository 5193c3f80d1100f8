"""JSON-schema -> Spark type translation (SURVEY §1.3 Layer B/C).

The reference's Meltano path types data twice: discovery emits a
JSON-schema per column (``tap_mysql/discover_utils.py:241-299`` —
integer byte-width ``minimum``/``maximum`` bounds, decimal
``multipleOf = 10^-scale``, ``format`` tags for date-time/time/binary,
``object`` for JSON/spatial), and the loader deterministically
translates that JSON-schema to warehouse types
(``target_bigquery/core.py:1076-1097``; nested object -> RECORD and
array -> REPEATED at ``core.py:806-820``).

This module is the Spark-native equivalent of that Layer B -> C hop:
a JSON-schema property dict becomes a ``pyspark.sql.types`` type, a
whole schema becomes a ``StructType``, and ``silver_from_jsonschema``
emits the typed cast plan over an all-string bronze frame — pure
Catalyst ``try_cast`` / ``from_json`` expressions, codegen'd, no
Python in the row path.

Decision order mirrors ``bigquery_type`` (core.py:1076-1097):
format first (date-time -> timestamp, date -> date, time -> string —
Spark has no TIME type — binary -> binary), then number (with the
tap's decimal ``multipleOf`` recovering an exact DecimalType),
integer+string -> string, integer (narrowed by the tap's byte-width
bounds), boolean, object -> struct, array -> repeated, else string.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F, types as T

__all__ = [
    "spark_type_for_property",
    "struct_for_jsonschema",
    "silver_from_jsonschema",
    "jsonschema_for_struct",
    "property_for_spark_type",
]

# Signed two's-complement bounds per byte width — the inverse of the
# tap's BYTES_FOR_INTEGER_TYPE emission (discover_utils.py:258-265).
_INT_BOUNDS: tuple[tuple[int, int, T.DataType], ...] = (
    (-(2**7), 2**7 - 1, T.ByteType()),
    (-(2**15), 2**15 - 1, T.ShortType()),
    (-(2**31), 2**31 - 1, T.IntegerType()),
    (-(2**63), 2**63 - 1, T.LongType()),
)


def _types_of(prop: dict) -> tuple[list[str], str | None]:
    """Extract (type-list, format) handling ``anyOf`` and scalar/list
    ``type`` values the way the loader does (core.py:796-804)."""
    if prop.get("anyOf"):
        prop = prop["anyOf"][0]
    typ = prop.get("type", "string")
    types = [typ] if isinstance(typ, str) else list(typ)
    return [x for x in types if x != "null"], prop.get("format")


def _integer_type(prop: dict) -> T.DataType:
    """Narrowest Spark integral type holding [minimum, maximum].

    The tap stamps bounds from the MySQL byte width (signed
    ``±2^(bits-1)``, unsigned ``0..2^bits-1``); recovering the width
    here means a silver table stores a tinyint in 1 byte, not 8.
    Unsigned BIGINT (max 2^64-1) exceeds int64 -> DecimalType(20,0),
    exactly how warehouses widen it. No bounds -> long.
    """
    lo, hi = prop.get("minimum"), prop.get("maximum")
    if lo is None or hi is None:
        return T.LongType()
    for b_lo, b_hi, typ in _INT_BOUNDS:
        if lo >= b_lo and hi <= b_hi:
            return typ
    return T.DecimalType(20, 0)


def _number_type(prop: dict) -> T.DataType:
    """number -> double, unless the tap's decimal marker
    ``multipleOf = 10^-scale`` (discover_utils.py:268-271) is present
    — then an exact decimal of that scale."""
    step = prop.get("multipleOf")
    if step is None:
        return T.DoubleType()
    scale = max(0, round(-math.log10(float(step))))
    return T.DecimalType(38, scale)


def spark_type_for_property(prop: dict) -> T.DataType:
    """Translate one JSON-schema property dict to a Spark DataType."""
    types, fmt = _types_of(prop)
    if fmt == "date-time":
        return T.TimestampType()
    if fmt == "date":
        return T.DateType()
    if fmt == "time":
        return T.StringType()  # Spark has no TIME; keep 'HH:MM:SS'
    if fmt == "binary":
        return T.BinaryType()
    if "number" in types:
        return _number_type(prop)
    if "integer" in types and "string" in types:
        return T.StringType()
    if "integer" in types:
        return _integer_type(prop)
    if "boolean" in types:
        return T.BooleanType()
    if "object" in types:
        props = prop.get("properties")
        if not props:
            return T.StringType()  # schemaless object -> JSON string
        return T.StructType(
            [
                T.StructField(name, spark_type_for_property(p), True)
                for name, p in props.items()
            ]
        )
    if "array" in types:
        items = prop.get("items")
        if not items:
            return T.ArrayType(T.StringType())  # JSON REPEATED fallback
        return T.ArrayType(spark_type_for_property(items), True)
    return T.StringType()


def struct_for_jsonschema(schema: dict) -> T.StructType:
    """Whole JSON-schema (``{"properties": {...}}``) -> StructType."""
    return T.StructType(
        [
            T.StructField(name, spark_type_for_property(p), True)
            for name, p in schema.get("properties", {}).items()
        ]
    )


_INT_EMIT: dict[type, int] = {
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 4,
    T.LongType: 8,
}


def property_for_spark_type(typ: T.DataType) -> dict:
    """DISCOVERY direction: Spark type -> JSON-schema property dict,
    mirroring the tap's emission (`discover_utils.py:241-299`) so a
    round trip ``spark_type_for_property(property_for_spark_type(t))``
    is the identity on the supported lattice. Integral types emit the
    signed byte-width bounds exactly as the tap does; decimals emit
    ``multipleOf = 10^-scale``; timestamps/dates emit string +
    format."""
    if isinstance(typ, T.BooleanType):
        return {"type": ["null", "boolean"]}
    if type(typ) in _INT_EMIT:
        bits = _INT_EMIT[type(typ)] * 8
        return {
            "type": ["null", "integer"],
            "minimum": -(2 ** (bits - 1)),
            "maximum": 2 ** (bits - 1) - 1,
        }
    if isinstance(typ, T.DecimalType):
        if typ.scale == 0 and typ.precision >= 20:
            # The unsigned-bigint widening emitted by the forward map.
            return {"type": ["null", "integer"], "minimum": 0, "maximum": 2**64 - 1}
        return {"type": ["null", "number"], "multipleOf": 10**-typ.scale}
    if isinstance(typ, (T.DoubleType, T.FloatType)):
        return {"type": ["null", "number"]}
    if isinstance(typ, T.TimestampType) or isinstance(typ, T.TimestampNTZType):
        return {"type": ["null", "string"], "format": "date-time"}
    if isinstance(typ, T.DateType):
        return {"type": ["null", "string"], "format": "date"}
    if isinstance(typ, T.BinaryType):
        return {"type": ["null", "string"], "format": "binary"}
    if isinstance(typ, T.StructType):
        return {
            "type": ["null", "object"],
            "properties": {
                f.name: property_for_spark_type(f.dataType) for f in typ.fields
            },
        }
    if isinstance(typ, T.ArrayType):
        return {
            "type": ["null", "array"],
            "items": property_for_spark_type(typ.elementType),
        }
    return {"type": ["null", "string"]}


def jsonschema_for_struct(struct: T.StructType) -> dict:
    """Whole-schema discovery emission: StructType ->
    ``{"type": "object", "properties": {...}}`` — what the tap writes
    into the Singer catalog for a stream."""
    return {
        "type": "object",
        "properties": {
            f.name: property_for_spark_type(f.dataType) for f in struct.fields
        },
    }


def _cast_expr(col: Column, typ: T.DataType) -> Column:
    # Nested targets parse from their JSON text representation (the
    # loader's RECORD/REPEATED path, core.py:806-820); scalars are
    # permissive try_cast (failed cast -> NULL, like autodetect loads).
    if isinstance(typ, (T.StructType, T.ArrayType, T.MapType)):
        return F.from_json(col, typ)
    return col.try_cast(typ)


def silver_from_jsonschema(
    df: DataFrame, schema: dict, *, keep_extra: bool = True
) -> DataFrame:
    """Typed cast plan over an all-string bronze frame.

    Columns named in the schema are cast to their translated type;
    unlisted columns pass through (``keep_extra``) or are dropped.
    """
    struct = struct_for_jsonschema(schema)
    target = {f.name: f.dataType for f in struct.fields}
    cols = []
    for c in df.columns:
        if c in target:
            cols.append(_cast_expr(F.col(c), target[c]).alias(c))
        elif keep_extra:
            cols.append(F.col(c))
    return df.select(*cols)
