"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's declared-query registry
(``s3_rds_bq_airflow_spark.queries``): every implemented operator
from SURVEY.md §2 registers a DataFrame builder and, where
SQL-expressible, a DuckDB oracle producing identical columns/values.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from s3_rds_bq_airflow_spark.queries import all_oracles, all_queries  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the star-join revenue rollup
    (joins, broadcast dims, pushed-down filters, hash aggregate)."""
    from s3_rds_bq_airflow_spark.queries.relational import q5_nation_revenue

    return q5_nation_revenue(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return all_oracles()
