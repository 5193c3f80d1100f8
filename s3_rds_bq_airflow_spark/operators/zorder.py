"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet scans skip row groups / files whose column min-max stats
exclude the filter — but sorting by ONE column destroys locality in
every other. Interleaving the bits of several columns into one
z-value and range-partitioning on it gives each output file a small
bounding box in ALL dimensions, so selective filters on any of them
prune most files (Delta's OPTIMIZE ZORDER BY; a first-class layout
tool at 100 TB, pure column expressions here).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def interleave_bits(a: Column, b: Column, *, bits: int = 16) -> Column:
    """Morton code of two non-negative ints (a in even positions,
    b in odd), as a 64-bit long. JVM-side bit expressions only."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    *,
    cols: Sequence[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` range-partitioned by the z-value of two columns —
    each output file covers a compact rectangle in (cols[0], cols[1])
    space. Columns must be non-negative integers fitting ``bits``."""
    if len(cols) != 2:
        raise ValueError("zorder_write interleaves exactly two columns")
    z = interleave_bits(F.col(cols[0]), F.col(cols[1]), bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def interleave_bits_n(cols: Sequence[Column], *, bits: int = 16) -> Column:
    """Morton code of N non-negative int columns (round-robin bit
    interleave; column i occupies positions i, i+N, i+2N, ...). With
    N*bits <= 63 the code fits a long."""
    n = len(cols)
    if n < 2:
        raise ValueError("interleave at least two columns")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a 64-bit code")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z
