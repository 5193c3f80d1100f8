"""Incremental aggregate maintenance: N-batch folding equals the
one-shot aggregate over all data."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_rds_bq_airflow_spark.io.tables import load_table
from s3_rds_bq_airflow_spark.operators.incremental_agg import incremental_aggregate

AGGS = {
    "n_orders": ("o_orderkey", "count"),
    "total_dec": ("__price_dec", "sum"),
    "max_price": ("o_totalprice", "max"),
    "min_price": ("o_totalprice", "min"),
}


def test_incremental_equals_oneshot(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "__price_dec", F.col("o_totalprice").cast("decimal(18,2)")
    )
    state = str(tmp_path / "rollup_state")
    # three arbitrary batches partitioning the table
    for i in range(3):
        batch = orders.where(F.col("o_orderkey") % 3 == i)
        result = incremental_aggregate(
            spark, state, batch, keys=["o_orderstatus"], aggs=AGGS
        )
    want = (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("__price_dec").alias("total_dec"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_totalprice").alias("min_price"),
        )
    )
    got = sorted(map(tuple, result.select(*want.columns).collect()))
    assert got == sorted(map(tuple, want.collect()))
    # state stays key-sized
    assert result.count() == want.count()


def test_empty_batch_is_noop(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "__price_dec", F.col("o_totalprice").cast("decimal(18,2)")
    )
    state = str(tmp_path / "rollup_state2")
    first = incremental_aggregate(spark, state, orders, keys=["o_orderstatus"], aggs=AGGS)
    before = sorted(map(tuple, first.collect()))
    empty = orders.where(F.lit(False))
    after = incremental_aggregate(spark, state, empty, keys=["o_orderstatus"], aggs=AGGS)
    assert sorted(map(tuple, after.collect())) == before


def test_incremental_join_any_interleaving(spark, sf_dir, tmp_path):
    from s3_rds_bq_airflow_spark.operators.incremental_agg import incremental_join

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    want = sorted(map(tuple, orders.join(cust, "c_custkey").collect()))

    schedules = {
        "b_first": [
            dict(delta_b=cust),
            dict(delta_a=orders.where(F.col("o_orderkey") % 2 == 0)),
            dict(delta_a=orders.where(F.col("o_orderkey") % 2 == 1)),
        ],
        "a_first": [
            dict(delta_a=orders),
            dict(delta_b=cust.where(F.col("c_custkey") % 2 == 0)),
            dict(delta_b=cust.where(F.col("c_custkey") % 2 == 1)),
        ],
        "mixed": [
            dict(
                delta_a=orders.where(F.col("o_orderkey") % 2 == 0),
                delta_b=cust.where(F.col("c_custkey") % 2 == 0),
            ),
            dict(
                delta_a=orders.where(F.col("o_orderkey") % 2 == 1),
                delta_b=cust.where(F.col("c_custkey") % 2 == 1),
            ),
        ],
    }
    for name, folds in schedules.items():
        state = str(tmp_path / f"incjoin_{name}")
        view = None
        for kw in folds:
            view = incremental_join(spark, state, on=["c_custkey"], **kw)
        got = sorted(map(tuple, view.select(*orders.join(cust, "c_custkey").columns).collect()))
        assert got == want, name


def test_incremental_join_single_side_returns_empty_view(spark, sf_dir, tmp_path):
    from s3_rds_bq_airflow_spark.operators.incremental_agg import incremental_join

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    state = str(tmp_path / "incjoin_empty")
    view = incremental_join(spark, state, on=["c_custkey"], delta_b=cust)
    assert view.count() == 0
