""""Fixed" ingestion mode: rows -> one ``data`` JSON column + _sdc_* meta.

The reference's FIXED strategy stores every record as a single
``data JSON`` column plus six Singer lineage columns, popping any
``_sdc_*`` keys out of the record first (``target_bigquery/
core.py:448-465`` ``preprocess_record``), and offers a generated
unpacking VIEW of json_extract projections on top
(``core.py:765-790``). The wrap side is what round-1 lacked; the
unpack side already exists as ``q_json_unpack_view`` (M10).

Spark-first: the wrap is a single ``to_json(struct(...))`` projection
— one codegen'd expression, no shuffle, no Python. The unpack is
``from_json`` with the translated schema (see ``jsonschema.py``),
which Catalyst can prune to the accessed fields.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from .jsonschema import struct_for_jsonschema

# Singer lineage columns in reference order (core.py:455-464).
SDC_META_COLS: tuple[str, ...] = (
    "_sdc_extracted_at",
    "_sdc_received_at",
    "_sdc_batched_at",
    "_sdc_deleted_at",
    "_sdc_sequence",
    "_sdc_table_version",
)

_SDC_TYPES: dict[str, str] = {
    "_sdc_extracted_at": "timestamp",
    "_sdc_received_at": "timestamp",
    "_sdc_batched_at": "timestamp",
    "_sdc_deleted_at": "timestamp",
    "_sdc_sequence": "bigint",
    "_sdc_table_version": "bigint",
}


def wrap_fixed(
    df: DataFrame, meta: dict[str, Column] | None = None
) -> DataFrame:
    """Wrap each row as ``{"data": <JSON of non-_sdc columns>, _sdc_*}``.

    Mirrors ``preprocess_record``: any ``_sdc_*`` column already on
    ``df`` is popped out of the payload and kept as a meta column;
    missing meta columns are typed NULL (the reference fills ``None``
    for absent keys). ``meta`` overrides let callers stamp
    deterministic lineage (e.g. a fixed batch timestamp) — wall-clock
    defaults would break replay comparison.
    """
    meta = dict(meta or {})
    payload = [c for c in df.columns if c not in SDC_META_COLS]
    out: list[Column] = [
        F.to_json(F.struct(*[F.col(c) for c in payload])).alias("data")
    ]
    for m in SDC_META_COLS:
        if m in meta:
            out.append(meta[m].cast(_SDC_TYPES[m]).alias(m))
        elif m in df.columns:
            out.append(F.col(m).cast(_SDC_TYPES[m]).alias(m))
        else:
            out.append(F.lit(None).cast(_SDC_TYPES[m]).alias(m))
    return df.select(*out)


def unpack_fixed(
    df: DataFrame, schema: dict | T.StructType, *, keep_meta: bool = False
) -> DataFrame:
    """Inverse of ``wrap_fixed``: project the ``data`` JSON back to
    typed columns — the generated VIEW (core.py:765-790) as a
    DataFrame. ``schema`` is a JSON-schema dict (translated via
    ``struct_for_jsonschema``) or an explicit StructType.
    """
    struct = (
        schema
        if isinstance(schema, T.StructType)
        else struct_for_jsonschema(schema)
    )
    parsed = df.withColumn("__rec", F.from_json(F.col("data"), struct))
    cols = [F.col(f"__rec.{f.name}").alias(f.name) for f in struct.fields]
    if keep_meta:
        cols += [F.col(m) for m in SDC_META_COLS if m in df.columns]
    return parsed.select(*cols)


def unpack_view_sql(view_name: str, table_name: str, struct: T.StructType) -> str:
    """CREATE OR REPLACE VIEW statement of json path projections —
    the catalog-object twin of ``unpack_fixed`` for SQL users
    (reference ``generate_view_statement``)."""
    lines = ",\n".join(
        f"  from_json(data, '{f.name} {f.dataType.simpleString()}').{f.name}"
        f" AS {f.name}"
        for f in struct.fields
    )
    return (
        f"CREATE OR REPLACE TEMPORARY VIEW {view_name} AS\n"
        f"SELECT\n{lines}\nFROM {table_name}"
    )
