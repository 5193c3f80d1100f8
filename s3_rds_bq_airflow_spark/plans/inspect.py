"""Parse Spark's explain output into checkable facts.

Works on the statically optimized plan (pre-AQE): broadcast decisions
from size estimates/hints, pushdown, and exchange placement are all
visible there. AQE can only improve on it at runtime (coalescing
partitions, converting more joins to broadcast, splitting skew).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    try:  # classic API: straight from the JVM QueryExecution
        qe = df._jdf.queryExecution()
        return qe.explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        )
    except Exception:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()


def formatted_plan(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED text for a DataFrame."""
    return _explain(df, "formatted")


def plan_nodes(df: DataFrame) -> list[str]:
    """Physical operator names, one per node (from the formatted
    plan's detail sections — each node appears exactly once there)."""
    plan = formatted_plan(df)
    return [
        m.group(1).strip()
        for m in re.finditer(r"^\(\d+\) ([A-Za-z][A-Za-z0-9 ]*?)\s*$", plan, re.M)
    ]


def pushed_filters(df: DataFrame) -> list[str]:
    """All filters pushed into data-source scans (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        inner = m.group(1).strip()
        if inner:
            out.extend(p.strip() for p in inner.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the proof of column pruning."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", formatted_plan(df))]


def broadcast_join_count(df: DataFrame) -> int:
    return sum(1 for n in plan_nodes(df) if n in ("BroadcastHashJoin", "BroadcastNestedLoopJoin"))


def sortmerge_join_count(df: DataFrame) -> int:
    return sum(1 for n in plan_nodes(df) if n == "SortMergeJoin")


def shuffle_count(df: DataFrame) -> int:
    """Data-moving exchanges. Broadcast exchanges are not shuffles of
    the big side; a ReusedExchange re-reads an existing shuffle."""
    return sum(1 for n in plan_nodes(df) if n == "Exchange")


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (from simple-mode explain,
    where fused operators carry a ``*(N)`` stage id)."""
    return len(set(re.findall(r"\*\((\d+)\)", _explain(df, "simple"))))


def plan_report(df: DataFrame) -> dict:
    """One-look summary used by tests and by bench output."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "broadcast_joins": broadcast_join_count(df),
        "sortmerge_joins": sortmerge_join_count(df),
        "shuffles": shuffle_count(df),
        "codegen_stages": codegen_stage_count(df),
    }


# ---- assertions -----------------------------------------------------------


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert some pushed filter mentions ``fragment`` (column name)."""
    filters = pushed_filters(df)
    assert any(fragment in f for f in filters), (
        f"no pushed filter mentions {fragment!r}; pushed: {filters}"
    )


def assert_broadcast_joins(df: DataFrame, at_least: int) -> None:
    n = broadcast_join_count(df)
    assert n >= at_least, f"expected >= {at_least} broadcast joins, plan has {n}"


def assert_max_shuffles(df: DataFrame, at_most: int) -> None:
    n = shuffle_count(df)
    assert n <= at_most, f"expected <= {at_most} shuffles, plan has {n}:\n{formatted_plan(df)}"
