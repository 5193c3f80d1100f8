"""JDBC partitioned-scan planning (S7/S10/S14/S15).

The reference paginates JDBC reads with ``LIMIT n OFFSET m`` loops
(`rds-to-bq.py:256-275` — O(n²) server work, every OFFSET rescans) or
resumable keyset chunks ordered by primary key
(`tap_mysql/sync_strategies/full_table.py:92-179`). Spark's JDBC
source replaces both with a PARALLEL partitioned read: each of
``num_partitions`` tasks issues one range query
``WHERE pk >= lo AND pk < hi`` — no ORDER BY, no offsets, no
driver-side row loop, and resumability comes from idempotent re-runs
instead of row bookmarks.

The reader/writer calls are the stock ``spark.read.jdbc`` path;
beyond the option-building unit tests, the whole surface is EXECUTED
end-to-end against embedded Derby (which ships in Spark's jars) in
``tests/test_jdbc_executed.py`` — real partitioned range reads,
batched inserts, and probe-query pushdowns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def partitioned_scan_options(
    *,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Options for a balanced parallel JDBC scan.

    ``lower/upper_bound`` only steer the split points — rows outside
    the bounds are still read (by the unbounded first/last partition),
    so a stale bounds probe can never lose rows. ``fetch_size``
    replaces the reference's chunk sizes (100k/50k/10k,
    `rds-to-bq.py:256`): it sizes the driver<->DB cursor batches, not
    correctness.
    """
    if upper_bound <= lower_bound:
        raise ValueError("upper_bound must be > lower_bound")
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    return {
        "dbtable": table,
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetch_size),
    }


def bounds_probe_query(table: str, partition_column: str) -> str:
    """One-row bounds probe pushed to the database (replaces the
    reference's max-PK snapshot, `full_table.py:61-89`)."""
    return (
        f"(SELECT MIN({partition_column}) AS lo, MAX({partition_column}) AS hi "
        f"FROM {table}) AS bounds"
    )


def count_probe_query(table: str, where: str | None = None) -> str:
    """Server-side COUNT(*) (reference A1, `rds-to-bq.py:214`):
    aggregate pushdown for the reconciliation counts — never pull the
    table to count it."""
    clause = f" WHERE {where}" if where else ""
    return f"(SELECT COUNT(*) AS cnt FROM {table}{clause}) AS cnt"


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    *,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel partitioned JDBC read (needs a JDBC driver on the
    classpath; see module docstring)."""
    reader = spark.read.format("jdbc").option("url", url)
    for k, v in partitioned_scan_options(
        table=table,
        partition_column=partition_column,
        lower_bound=lower_bound,
        upper_bound=upper_bound,
        num_partitions=num_partitions,
        fetch_size=fetch_size,
    ).items():
        reader = reader.option(k, v)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_batched(
    df: DataFrame,
    url: str,
    *,
    table: str,
    mode: str = "append",
    batch_size: int = 1_000,
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC sink with batched inserts (reference S7's 1000-row
    ``executemany`` chunks, `s3-to-rds.py:410` — here one batched
    insert stream per partition, all partitions in parallel)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
