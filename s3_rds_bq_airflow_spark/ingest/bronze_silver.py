"""Bronze (all-string staging) <-> silver (typed) layer pair.

The reference stages every CSV column as ``TEXT`` (RDS DDL at
``s3-to-rds.py:164-183``; live catalog confirms ``sql-datatype: text``
for all Olist columns) and re-types downstream — by BigQuery
autodetect on the direct path (``rds-to-bq.py:287-294``) or by the
JSON-schema -> BigQuery translation on the Meltano path
(``target_bigquery/core.py:1076-1097``).

Spark-first: keep the split explicit. ``to_bronze`` casts everything
to string (what an all-TEXT staging table holds); ``to_silver``
applies an explicit target schema with ``cast`` — never sampling
heuristics like the reference's 3-value datetime sniff
(``rds-to-bq.py:342-358``), which breaks under partitioned reads.
Casts are Catalyst expressions: codegen'd, no Python involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

# JSON-schema-ish logical names -> Spark types (reference layer C,
# target_bigquery/core.py:1076-1097).
LOGICAL_TYPES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "string": T.StringType(),
    "date-time": T.TimestampType(),
    "date": T.DateType(),
    "time": T.StringType(),  # Spark has no TIME; keep ISO string
    "binary": T.BinaryType(),
    "json": T.StringType(),
}


def to_bronze(df: DataFrame, *, exclude: tuple[str, ...] = ()) -> DataFrame:
    """Cast every column to string — the all-TEXT staging shape."""
    return df.select(
        *[
            F.col(c) if c in exclude else F.col(c).cast("string").alias(c)
            for c in df.columns
        ]
    )


def to_silver(
    df: DataFrame,
    schema: dict[str, T.DataType | str],
    *,
    keep_extra: bool = True,
) -> DataFrame:
    """Cast bronze strings to the given target types.

    ``schema`` maps column -> Spark type (or a logical-type name from
    ``LOGICAL_TYPES``). Unlisted columns pass through (``keep_extra``)
    or are dropped. Failed casts yield NULL (``try_cast`` — ANSI-safe),
    mirroring permissive warehouse autodetect loads.
    """
    resolved = {
        c: (LOGICAL_TYPES[t] if isinstance(t, str) else t) for c, t in schema.items()
    }
    cols = []
    for c in df.columns:
        if c in resolved:
            cols.append(F.col(c).try_cast(resolved[c]).alias(c))
        elif keep_extra:
            cols.append(F.col(c))
    return df.select(*cols)
