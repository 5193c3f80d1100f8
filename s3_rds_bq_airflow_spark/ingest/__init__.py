from .sanitize import clean_column_name, derive_table_name, sanitize_columns
from .audit import with_audit_column, with_lineage_columns
from .bronze_silver import to_bronze, to_silver

__all__ = [
    "clean_column_name",
    "derive_table_name",
    "sanitize_columns",
    "with_audit_column",
    "with_lineage_columns",
    "to_bronze",
    "to_silver",
]
