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


# Tree line: indent prefix (":  ", "+- ", "|  ", and the "* "
# whole-stage-codegen marker) + node name + "(id)". Names never
# contain ':' or '(' — that excludes detail-section lines
# ("Output [2]: ...", "(4) Filter [codegen id : 3]") and subquery
# headers, so the same scan can walk ALL plan sections (main tree AND
# "===== Subqueries =====" trees — a broadcast hidden in a subquery
# must not be invisible to the guards below).
_TREE_LINE = re.compile(r"^([ :+*|-]*?)([A-Za-z][^(:]*)\((\d+)\)\s*$")


def _tree_from_text(text: str) -> list[tuple[int, str, int, int | None]]:
    rows: list[tuple[int, str, int, int | None]] = []
    stack: list[tuple[int, int]] = []  # (depth, id)
    for line in text.splitlines():
        m = _TREE_LINE.match(line)
        if not m:
            continue
        prefix, name, nid = m.group(1), m.group(2).strip(), int(m.group(3))
        # 3-char indent unit; an optional trailing "* " marker adds 2,
        # which // 3 absorbs. A depth-0 line starts a new tree.
        depth = len(prefix) // 3
        if depth == 0:
            stack.clear()
        while stack and stack[-1][0] >= depth:
            stack.pop()
        parent = stack[-1][1] if stack else None
        rows.append((nid, name, depth, parent))
        stack.append((depth, nid))
    return rows


def _filter_conditions(text: str) -> dict[int, str]:
    """node id -> Condition expression, for Filter detail blocks."""
    conds: dict[int, str] = {}
    cur_id: int | None = None
    cur_is_filter = False
    for line in text.splitlines():
        m = re.match(r"^\((\d+)\) ([A-Za-z][A-Za-z0-9 ]*)", line)
        if m:
            cur_id = int(m.group(1))
            cur_is_filter = m.group(2).strip() == "Filter"
            continue
        if cur_is_filter and cur_id is not None:
            m2 = re.match(r"^Condition\s*:\s*(.+)$", line)
            if m2:
                conds[cur_id] = m2.group(1).strip()
    return conds


def _is_selective_condition(cond: str) -> bool:
    """True iff the condition filters on something beyond the
    isnotnull(...) guards Spark auto-inserts above every equi-join
    input. An isnotnull-only Filter rejects ~no rows — treating it as
    bounding would absolve exactly the bare whole-relation broadcast
    the guard exists to catch."""
    residue = re.sub(r"isnotnull\([^()]*\)", "", cond)
    residue = re.sub(r"\bAND\b|\bOR\b|\bNOT\b|[()\s]", " ", residue)
    return bool(residue.strip())


def plan_tree(df: DataFrame) -> list[tuple[int, str, int, int | None]]:
    """Parse the formatted plan (ALL sections, subqueries included)
    into ``(id, name, depth, parent_id)`` rows. Depth derives from the
    3-char indent unit of explain-formatted trees, so subtree
    membership (e.g. "what sits under this BroadcastExchange") is
    checkable — node LISTS can't answer that."""
    return _tree_from_text(formatted_plan(df))


_BOUNDING_OPS = (
    "TakeOrderedAndProject",
    "GlobalLimit",
    "CollectLimit",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
)


def unbounded_broadcast_scans(df: DataFrame) -> list[int]:
    """Scan node ids that sit inside a BroadcastExchange subtree with
    NO bounding operator between the scan and the exchange — i.e. a
    full relation shipped verbatim to every executor. Bounding =
    limit / top-k / aggregate, or a Filter whose condition holds a
    REAL predicate (the broadcast of a point-filtered scan is the
    standard small-slice pattern; Spark's auto-inserted
    isnotnull-only join-key filters do NOT count). Empty list = no
    broadcast side re-materializes an entire input relation, the
    property that keeps the plan valid at 100 TB."""
    text = formatted_plan(df)
    tree = _tree_from_text(text)
    conds = _filter_conditions(text)
    by_id = {nid: (name, parent) for nid, name, _, parent in tree}

    def bounds(node_id: int, node_name: str) -> bool:
        if node_name.startswith(_BOUNDING_OPS):
            return True
        if node_name.startswith("Filter"):
            return _is_selective_condition(conds.get(node_id, ""))
        return False

    offenders = []
    for nid, name, _, _ in tree:
        if not name.startswith("Scan"):
            continue
        # walk ancestors up to the nearest BroadcastExchange (if any)
        bounded = False
        cur = by_id[nid][1]
        while cur is not None:
            pname = by_id[cur][0]
            if pname.startswith("BroadcastExchange"):
                if not bounded:
                    offenders.append(nid)
                break
            bounded = bounded or bounds(cur, pname)
            cur = by_id[cur][1]
    return offenders


def scan_tables(df: DataFrame) -> dict[int, str]:
    """Scan node id -> table name (parquet file stem from the detail
    section's Location line)."""
    out: dict[int, str] = {}
    for m in re.finditer(
        r"^\((\d+)\) Scan parquet.*?Location:[^\[\n]*\[([^\]]*)\]",
        formatted_plan(df),
        re.M | re.S,
    ):
        loc = m.group(2).split(",")[0].strip()
        stem = loc.rstrip("/").rsplit("/", 1)[-1]
        out[int(m.group(1))] = stem.removesuffix(".parquet")
    return out


def unbounded_broadcast_tables(df: DataFrame) -> set[str]:
    """Table names whose scans feed a BroadcastExchange with no
    bounding op in between. Fact tables must never appear here."""
    tables = scan_tables(df)
    return {tables.get(nid, f"scan#{nid}") for nid in unbounded_broadcast_scans(df)}


# ---- assertions -----------------------------------------------------------


def single_partition_windows(df: DataFrame) -> list[int]:
    """Window node ids whose input is funneled through an
    ``Exchange SinglePartition`` — the global-window scale-killer: the
    ENTIRE relation sorts and ranks inside one task, so the operator
    stops being distributed no matter how many executors exist.

    Detection walks each Window node's unary input chain (through the
    Sort / WindowGroupLimit / Project / Filter operators Spark plans
    between a window and its required-distribution exchange) and flags
    it when the chain reaches an Exchange whose detail block declares
    ``SinglePartition``. Final global aggregates also use
    SinglePartition exchanges — those are config-sized reductions and
    are NOT reachable from a Window node, so they don't false-positive
    here."""
    text = formatted_plan(df)
    tree = _tree_from_text(text)
    single: set[int] = set()
    cur: tuple[int, str] | None = None
    for line in text.splitlines():
        m = re.match(r"^\((\d+)\) ([A-Za-z][A-Za-z0-9]*)", line)
        if m:
            cur = (int(m.group(1)), m.group(2))
            continue
        if (
            cur is not None
            and cur[1] == "Exchange"
            and re.match(r"^Arguments\s*:\s*SinglePartition", line.strip())
        ):
            single.add(cur[0])
    children: dict[int | None, list[tuple[int, str]]] = {}
    for nid, name, _depth, parent in tree:
        children.setdefault(parent, []).append((nid, name))
    flagged: list[int] = []
    for nid, name, _depth, _parent in tree:
        if not name.startswith("Window"):
            continue
        cursor = nid
        while True:
            kids = children.get(cursor, [])
            if len(kids) != 1:
                break
            kid_id, kid_name = kids[0]
            head = kid_name.split()[0]
            if head in ("Sort", "WindowGroupLimit", "Project", "Filter"):
                cursor = kid_id
                continue
            if head == "Exchange" and kid_id in single:
                flagged.append(nid)
            break
    return flagged


# Attribute self-comparison in a join condition: `name#12 < name#98`
# (or <=) with the SAME base name on both sides — the canonical
# "emit each unordered pair once" idiom of a pair-producing
# self-join. Different base names (as-of ts < end_ts, range joins)
# do not match.
_PAIR_CONDITION = re.compile(
    r"([A-Za-z_][A-Za-z0-9_]*)#\d+L?\s*<=?\s*\1#\d+L?"
)


def pair_self_joins(df: DataFrame) -> list[dict]:
    """Pair-producing self-joins in the optimized plan, with their
    blocking keys — the round-8 straggler audit surface.

    A join node counts when its Join condition compares two
    attributes of the SAME base name with ``<``/``<=`` (the
    ``a.id < b.id`` emit-each-pair-once idiom). For each, returns
    ``{"node", "name", "keys", "pair_cols", "salted"}`` where
    ``keys`` are the equi-join key base names (the blocking key) and
    ``salted`` is True when any key follows the ``_salt`` convention.
    A pair join whose blocking key has only a handful of distinct
    values and is NOT salted serializes each block's quadratic pair
    workload into one task (q_ngram_jaccard at sf10: one 45-minute
    straggler) — the sweep in tests/test_plans.py holds every
    detection to salted-or-allowlisted."""
    text = formatted_plan(df)
    out: list[dict] = []
    cur_id: int | None = None
    cur_name = ""
    keys: list[str] = []
    cond: str | None = None

    def flush():
        if cur_id is None or "Join" not in cur_name or not cond:
            return
        pair_cols = sorted({m.group(1) for m in _PAIR_CONDITION.finditer(cond)})
        if not pair_cols:
            return
        out.append(
            {
                "node": cur_id,
                "name": cur_name,
                "keys": list(keys),
                "pair_cols": pair_cols,
                "salted": any("salt" in k.lower() for k in keys),
            }
        )

    for line in text.splitlines():
        m = re.match(r"^\((\d+)\) ([A-Za-z][A-Za-z0-9 ]*)", line)
        if m:
            flush()
            cur_id, cur_name = int(m.group(1)), m.group(2).strip()
            keys, cond = [], None
            continue
        mk = re.match(r"^Left keys \[\d+\]\s*:\s*\[([^\]]*)\]", line.strip())
        if mk:
            keys = [
                re.sub(r"#\d+L?$", "", k.strip())
                for k in mk.group(1).split(",")
                if k.strip()
            ]
            continue
        mc = re.match(r"^Join condition\s*:\s*(.+)$", line.strip())
        if mc:
            cond = mc.group(1)
    flush()
    return out


def assert_no_single_partition_window(df: DataFrame) -> None:
    assert not single_partition_windows(df), (
        f"plan ranks through a single-partition Window:\n{formatted_plan(df)}"
    )


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
