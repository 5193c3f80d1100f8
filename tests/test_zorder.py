"""Z-order layout: every output file must cover a small bounding box
in BOTH interleaved dimensions (that is the data-skipping property —
min/max stats per file exclude most filters), unlike a single-column
sort which only localizes one dimension.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.io.tables import load_table
from s3_rds_bq_airflow_spark.operators.zorder import interleave_bits, zorder_write


def _file_ranges(path, col_a, col_b):
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        t = pq.read_table(f, columns=[col_a, col_b])
        a, b = t.column(col_a).to_pylist(), t.column(col_b).to_pylist()
        spans.append(((max(a) - min(a)), (max(b) - min(b))))
    return spans


def test_interleave_bits_basics(spark):
    rows = (
        spark.range(1)
        .select(
            interleave_bits(F.lit(0), F.lit(0)).alias("z00"),
            interleave_bits(F.lit(1), F.lit(0)).alias("z10"),
            interleave_bits(F.lit(0), F.lit(1)).alias("z01"),
            interleave_bits(F.lit(3), F.lit(3)).alias("z33"),
        )
        .collect()[0]
    )
    assert rows["z00"] == 0
    assert rows["z10"] == 1  # a occupies even bit positions
    assert rows["z01"] == 2  # b occupies odd bit positions
    assert rows["z33"] == 15


def test_zorder_files_cluster_both_dims(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 1024).alias("dim_a"),
        (F.col("o_orderkey") % 1024).alias("dim_b"),
        "o_totalprice",
    )
    n_files = 16
    zpath = str(tmp_path / "zordered")
    zorder_write(orders, zpath, cols=["dim_a", "dim_b"], n_files=n_files, bits=10)

    # contrast: single-column range sort
    spath = str(tmp_path / "single_sorted")
    orders.repartitionByRange(n_files, "dim_a").sortWithinPartitions("dim_a").write.mode(
        "overwrite"
    ).parquet(spath)

    z_spans = _file_ranges(zpath, "dim_a", "dim_b")
    s_spans = _file_ranges(spath, "dim_a", "dim_b")
    # z-order: BOTH dims localized per file; single sort: dim_b spans
    # nearly the whole domain in every file
    z_avg_b = sum(b for _a, b in z_spans) / len(z_spans)
    s_avg_b = sum(b for _a, b in s_spans) / len(s_spans)
    assert z_avg_b < s_avg_b * 0.6, (z_avg_b, s_avg_b)
    z_avg_a = sum(a for a, _b in z_spans) / len(z_spans)
    assert z_avg_a < 1024 * 0.6
    # no data lost
    assert spark.read.parquet(zpath).count() == orders.count()


def test_interleave_bits_n(spark):
    from s3_rds_bq_airflow_spark.operators.zorder import interleave_bits_n
    import pytest as _pytest

    row = (
        spark.range(1)
        .select(
            interleave_bits_n([F.lit(1), F.lit(0), F.lit(0)], bits=4).alias("a"),
            interleave_bits_n([F.lit(0), F.lit(1), F.lit(0)], bits=4).alias("b"),
            interleave_bits_n([F.lit(0), F.lit(0), F.lit(1)], bits=4).alias("c"),
            interleave_bits_n([F.lit(3), F.lit(3), F.lit(3)], bits=4).alias("all3"),
        )
        .collect()[0]
    )
    assert (row["a"], row["b"], row["c"]) == (1, 2, 4)
    assert row["all3"] == 0b111111  # two bits each, interleaved
    with _pytest.raises(ValueError):
        interleave_bits_n([F.lit(1)], bits=4)
    with _pytest.raises(ValueError):
        interleave_bits_n([F.lit(1)] * 5, bits=16)


def _xy2d(order_bits: int, x: int, y: int) -> int:
    """Reference Hilbert xy->d walk (public-domain textbook form)."""
    d, s = 0, 1 << (order_bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_index_matches_reference_walk(spark):
    from s3_rds_bq_airflow_spark.operators.zorder import with_hilbert_index

    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["__h"]
        for r in with_hilbert_index(df, ["x", "y"], bits=3).collect()
    }
    assert got == {(x, y): _xy2d(3, x, y) for x, y in pts}
    # The curve is a permutation of the grid...
    assert sorted(got.values()) == list(range(64))
    # ...and consecutive codes are ALWAYS adjacent cells (the Hilbert
    # property Morton lacks — no seams).
    by_d = {d: xy for xy, d in got.items()}
    for d in range(63):
        (x0, y0), (x1, y1) = by_d[d], by_d[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_hilbert_write_boxes_both_dims(spark, tmp_path):
    from s3_rds_bq_airflow_spark.operators.zorder import hilbert_write

    df = spark.createDataFrame(
        [(i % 64, (i * 37) % 64) for i in range(4096)], ["a", "b"]
    )
    path = str(tmp_path / "hilbert")
    hilbert_write(df, path, cols=["a", "b"], n_files=16, bits=6)
    spans = _file_ranges(path, "a", "b")
    assert len(spans) >= 8
    # Every file covers a fraction of both dimensions' full range.
    assert max(sa for sa, _ in spans) < 48 and max(sb for _, sb in spans) < 48
    # Content preserved.
    assert spark.read.parquet(path).count() == 4096
