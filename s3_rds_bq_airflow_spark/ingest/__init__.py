from .sanitize import clean_column_name, derive_table_name, sanitize_columns
from .audit import with_audit_column, with_lineage_columns
from .bronze_silver import to_bronze, to_silver
from .jsonschema import (
    jsonschema_for_struct,
    property_for_spark_type,
    silver_from_jsonschema,
    spark_type_for_property,
    struct_for_jsonschema,
)
from .fixed_mode import SDC_META_COLS, unpack_fixed, unpack_view_sql, wrap_fixed

__all__ = [
    "SDC_META_COLS",
    "unpack_fixed",
    "unpack_view_sql",
    "wrap_fixed",
    "silver_from_jsonschema",
    "spark_type_for_property",
    "struct_for_jsonschema",
    "clean_column_name",
    "derive_table_name",
    "sanitize_columns",
    "with_audit_column",
    "with_lineage_columns",
    "to_bronze",
    "to_silver",
]
