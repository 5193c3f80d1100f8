"""Columnar / row-format source-sink pairs beyond parquet and CSV.

The reference moves data as CSV (S3 staging) and JSON rows (Singer
messages between tap and target); its warehouses store columnar.
Spark-side every format is the same declarative scan/sink — this
module pins the engine's supported matrix and the rules that make
each format safe at scale:

- **ORC**: columnar twin of parquet (same predicate pushdown +
  min/max skipping through the vectorized reader). The alternative
  warehouse interchange format.
- **JSON Lines**: the Singer wire shape (one JSON object per line).
  ALWAYS read with an explicit schema: schema inference samples the
  data (non-deterministic over partitions, and a full extra pass at
  100 TB); splittable only when uncompressed or zstd/bzip2 — a
  single 100 GB gzip JSONL file reads on ONE task.
- **CSV**: covered by ``csv_source`` (BOM, header probe, permissive
  mode); listed here for the matrix test only.

Writers land a directory of part files (distributed write); readers
accept the directory glob. Schema is carried explicitly end-to-end —
bronze/silver discipline applies to row formats exactly as to CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "orc", "json", "csv")


def write_format(df: DataFrame, path: str, fmt: str, **options: str) -> None:
    """Overwrite-write ``df`` at ``path`` in ``fmt``."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {_FORMATS})")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def read_format(
    spark: SparkSession, path: str, fmt: str, schema: StructType | str | None = None
) -> DataFrame:
    """Read ``path`` as ``fmt``. For row formats (json/csv) a schema
    is REQUIRED — inference is a sampling pass with non-deterministic
    results and real cost at scale."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {_FORMATS})")
    r = spark.read.format(fmt)
    if fmt in ("json", "csv"):
        if schema is None:
            raise ValueError(f"{fmt} read requires an explicit schema")
        r = r.schema(schema)
        if fmt == "csv":
            r = r.option("header", "true")
    elif schema is not None:
        r = r.schema(schema)
    return r.load(path)
