from .tables import TABLES, load_table, load_tables, register_views
from .csv_source import read_csv_bronze, write_csv
from .ledger import ingest_new_files, read_ledger, unprocessed_files
from .jdbc import (
    bounds_probe_query,
    count_probe_query,
    partitioned_scan_options,
    read_jdbc_partitioned,
    write_jdbc_batched,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_csv_bronze",
    "write_csv",
    "ingest_new_files",
    "read_ledger",
    "unprocessed_files",
    "partitioned_scan_options",
    "bounds_probe_query",
    "count_probe_query",
    "read_jdbc_partitioned",
    "write_jdbc_batched",
]
