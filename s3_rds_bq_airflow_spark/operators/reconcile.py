"""Count-reconciliation and verified-cleanup gating (reference
A2/A3/J2/V1-V4).

The reference's entire correctness machinery is runtime row-count
reconciliation: exact source-vs-destination count match gates
transfer success (`rds-to-bq.py:304-313`,
`validate_data_integrity.py:46-85`), and a tolerant ``dst >= 0.9 *
src`` gate authorizes destructive staging cleanup
(`delete-rds-after-load.py:298-327`). Reproduced here as engine
operators returning DataFrames (so they compose and can be asserted
on), not print statements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def count_reconciliation(
    pairs: dict[str, tuple[DataFrame, DataFrame]],
) -> DataFrame:
    """Per-table source/destination counts + match verdict.

    ``pairs`` maps table name -> (source_df, destination_df). Result:
    one row per table with src_cnt, dst_cnt, difference, match.
    Implemented as a union of per-table scalar aggregates joined by
    name (reference J2's 'reconciliation join').
    """
    frames = []
    for name, (src, dst) in pairs.items():
        s = src.agg(F.count(F.lit(1)).alias("src_cnt")).select(
            F.lit(name).alias("table_name"), "src_cnt"
        )
        d = dst.agg(F.count(F.lit(1)).alias("dst_cnt")).select(
            F.lit(name).alias("table_name"), "dst_cnt"
        )
        frames.append(s.join(d, "table_name"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "table_name",
        "src_cnt",
        "dst_cnt",
        (F.col("src_cnt") - F.col("dst_cnt")).alias("difference"),
        (F.col("src_cnt") == F.col("dst_cnt")).alias("match"),
    )


def verified_cleanup_gate(
    source: DataFrame,
    destination: DataFrame,
    *,
    tolerance: float = 0.9,
) -> bool:
    """True iff destination holds >= ``tolerance`` of source rows —
    the reference's safety gate before truncating staging
    (`delete-rds-after-load.py:310-314`). Driver-side booleans only;
    the counts are distributed."""
    src_cnt = source.count()
    dst_cnt = destination.count()
    return src_cnt == 0 or dst_cnt >= src_cnt * tolerance


def table_counts(spark: SparkSession, tables: dict[str, DataFrame]) -> DataFrame:
    """Catalog-style listing: table name + row count (reference S9)."""
    frames = [
        df.agg(F.count(F.lit(1)).alias("row_cnt")).select(
            F.lit(name).alias("table_name"), "row_cnt"
        )
        for name, df in tables.items()
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
