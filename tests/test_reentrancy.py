"""Re-entrancy: query builders that register temp views or run
streaming jobs must be safely callable more than once in a session
(the driver may invoke a builder repeatedly — schema probe, retry,
or plan inspection)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

# every query that touches session-global state (temp views, memory
# sinks, staging dirs)
STATEFUL = [
    "q_grouping_sets",
    "q_json_unpack_view",
    "q_sql_surface",
    "q_stream_tumbling",
    "q_stream_sessionize",
]


@pytest.mark.parametrize("name", STATEFUL)
def test_double_invocation_stable(spark, sf_dir, name):
    a = QUERIES[name](spark, sf_dir)
    n_a = a.count()
    b = QUERIES[name](spark, sf_dir)
    n_b = b.count()
    assert n_a == n_b
    assert a.schema == b.schema
