"""Physical-plan introspection and scale assertions.

The reference has no optimizer (SURVEY §4) — its physical decisions
are hard-coded chunk sizes. In the rebuild the optimizer is Catalyst,
so "is this operator scale-ready?" is a checkable property of the
physical plan: filters pushed into the parquet scan, dimensions
broadcast instead of shuffled, aggregates partial+final, codegen
fused. This package turns those properties into assertions the test
suite pins, so a regression that silently un-broadcasts a join or
drops a pushdown fails CI rather than melting a 1000-executor run.
"""

from .inspect import (
    assert_broadcast_joins,
    assert_max_shuffles,
    assert_no_single_partition_window,
    assert_pushed_filter,
    single_partition_windows,
    broadcast_join_count,
    formatted_plan,
    plan_report,
    pushed_filters,
    read_schemas,
    shuffle_count,
    sortmerge_join_count,
)

__all__ = [
    "formatted_plan",
    "plan_report",
    "pushed_filters",
    "read_schemas",
    "broadcast_join_count",
    "sortmerge_join_count",
    "shuffle_count",
    "assert_broadcast_joins",
    "assert_max_shuffles",
    "assert_no_single_partition_window",
    "assert_pushed_filter",
    "single_partition_windows",
]
