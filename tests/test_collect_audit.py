"""Catalog-wide audit of per-group materialization sites.

`collect_list`/`collect_set` build a whole group's rows into ONE
array on ONE executor — the only aggregate shape where a skewed or
unbounded group becomes an executor OOM instead of just a slow task.
At 100 TB every such site must have a structural bound on group
payload: a config-sized domain, a fixed vector dimension, or an
explicit distributed truncation BEFORE the collect (the
q_inverted_index rn <= 8 discipline).

This audit is the same pattern as PAIR_JOIN_BLOCKING_OK in
test_plans.py (the round-8 salting lesson): every call site must
carry a documented bound below; an undocumented new site fails the
scan and forces the author to state the bound. Source-level rather
than plan-level because boundedness is semantic (an ObjectHashAggregate
node can't show WHY its groups are small).
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "s3_rds_bq_airflow_spark"

# file (relative to the package) -> {line-substring: bound reason}.
# Keyed on a stable substring of the call line, not line numbers.
COLLECT_SITES_OK = {
    "operators/pq.py": {
        'collect_list(F.struct("pos", "x"))': "group = one subvector's components; bounded by dsub (config)",
    },
    "operators/ivf.py": {
        'collect_list(F.struct("pos", "x"))': "group = one vector's components; bounded by embedding dim",
    },
    "operators/histogram.py": {
        'collect_list(F.struct("__bin", "__cnt"))': "group = histogram state; bounded by n_buckets (config); two sites (build + merge)",
    },
    "queries/scalar.py": {
        'collect_list(F.struct("event_type", "cnt"))': "group = event_type domain (enum-sized)",
    },
    "queries/statsq.py": {
        'collect_list(F.struct(F.col("event_type").alias("et"), "o1", "o2"))': "group = event_type domain (enum-sized)",
    },
    "queries/searchops.py": {
        'collect_list("doc_id")': "posting prefix: rn <= _POSTING_PREFIX cut applied DISTRIBUTEDLY before the collect",
    },
    "queries/trainprep.py": {
        'collect_set("split")': "group = split-label domain (<= 3 values)",
        'collect_list(F.struct("idx", "para"))': "group = one document's paragraphs; bounded by doc length (a doc fits on an executor by the ingest contract)",
    },
    "queries/funnelq.py": {
        'collect_list(F.struct(F.col("rn"), F.col("event_type")))': "group <= 3 structs: .where(rn <= 3) truncates distributedly BEFORE the collect (q_path_analysis)",
    },
}

_CALL = re.compile(r"collect_(?:list|set)\(")


def _call_sites():
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        for line in path.read_text().splitlines():
            # a call site, not a mention in a comment/docstring
            if _CALL.search(line) and not line.lstrip().startswith("#"):
                if "collect_list" in line or "collect_set" in line:
                    if re.search(r"collect_(list|set)\s*\(", line):
                        yield rel, line.strip()


def test_every_collect_site_documents_its_bound():
    undocumented = []
    for rel, line in _call_sites():
        allowed = COLLECT_SITES_OK.get(rel, {})
        if not any(key in line for key in allowed):
            undocumented.append((rel, line))
    assert not undocumented, (
        "collect_list/collect_set without a documented group-payload "
        f"bound (add to COLLECT_SITES_OK with the bound): {undocumented}"
    )


def test_audit_is_not_stale():
    """Every documented site still exists — entries whose code was
    removed or rewritten must leave the table, keeping it an audit
    instead of an archive."""
    sites = list(_call_sites())
    for rel, allowed in COLLECT_SITES_OK.items():
        for key in allowed:
            assert any(r == rel and key in line for r, line in sites), (
                f"stale audit entry: {rel} :: {key}"
            )


# ---------------------------------------------------------------------------
# Audit #4 (round-10): grouped-pandas payload bounds.
#
# `applyInPandas` / `applyInPandasWithState` materialize each GROUP as
# one Arrow-backed pandas frame in one Python worker — the exact OOM
# rationale of the collect audit above, which its collect_list/set
# scan structurally missed (the round-9 verdict's lead finding: two
# declared queries grouped a fact table on 3-value / handful keys).
# Every grouped-pandas call site must document a structural bound on
# the per-group payload: a config-sized shard, a deterministic cap
# applied before the call, a per-entity key, or bounded per-key STATE
# (the WithState case). Iterator-based mapInPandas is exempt — it
# streams batches and never holds a whole group.
# ---------------------------------------------------------------------------

GROUPED_PANDAS_OK = {
    "operators/packing.py": {
        ".applyInPandas(pack, out_schema)": (
            "greedy_pack: sharded gear bounds each group to "
            "~group_rows/n_shards (config); the declared query "
            "(q_sequence_packing_greedy) runs n_shards=8 — n_shards=1 "
            "is the single-walk proof gear, test-only"
        ),
    },
    "operators/pandas_udaf.py": {
        ".applyInPandas(fit, out_schema)": (
            "grouped_ols: surface template — callers MUST pre-bound "
            "groups; the declared caller (q_pandas_udaf_ols) caps each "
            "group to bottom-1024-by-md5 via _util.bottom_k_by_md5; "
            "scale gear is grouped_ols_moments (no pandas at all)"
        ),
        ".applyInPandas(merge, out_schema)": (
            "cogrouped_asof_merge: group = ONE entity key's rows on "
            "both sides (per-user granularity) — the per-entity bound "
            "class, same as the doc-paragraphs collect entry"
        ),
    },
    "streaming/stateful.py": {
        ".applyInPandasWithState(": (
            "per-key STATE is two scalars (n, cents); the per-batch "
            "group is one key's micro-batch slice — bounded by trigger "
            "interval, RocksDB-tested at 1e5 keys "
            "(tests/test_state_cardinality.py)"
        ),
    },
}

_GROUPED_CALL = re.compile(r"applyInPandas(?:WithState)?\s*\(")


def _grouped_pandas_sites(pkg: Path = PKG):
    for path in sorted(pkg.rglob("*.py")):
        rel = str(path.relative_to(pkg))
        for line in path.read_text().splitlines():
            if _GROUPED_CALL.search(line) and not line.lstrip().startswith("#"):
                yield rel, line.strip()


def test_every_grouped_pandas_site_documents_its_bound():
    undocumented = []
    for rel, line in _grouped_pandas_sites():
        allowed = GROUPED_PANDAS_OK.get(rel, {})
        if not any(key in line for key in allowed):
            undocumented.append((rel, line))
    assert not undocumented, (
        "applyInPandas/applyInPandasWithState without a documented "
        "group-payload bound (whole groups land in ONE Python worker — "
        f"add to GROUPED_PANDAS_OK with the bound): {undocumented}"
    )


def test_grouped_pandas_audit_is_not_stale():
    sites = list(_grouped_pandas_sites())
    for rel, allowed in GROUPED_PANDAS_OK.items():
        for key in allowed:
            assert any(r == rel and key in line for r, line in sites), (
                f"stale grouped-pandas audit entry: {rel} :: {key}"
            )


# ---------------------------------------------------------------------------
# Audit #5 (round-10): explode(sequence(...)) fanout bounds.
#
# explode(sequence(lo, hi)) multiplies ONE input row into (hi - lo + 1)
# output rows — the remaining intermediate-blowup class after the pair
# joins (audit #3): a data-dependent hi - lo means one corrupt row
# (epoch-zero start vs current-day end = ~2M buckets at 900 s) explodes
# a single task, invisible at every test SF because test data is clean.
# Every site must document why its fanout is bounded: a literal/config
# constant, a salt width, a config tolerance/bucket ratio, a per-doc
# length — or, for the one genuinely data-dependent site, the
# max_fanout execution guard callers can pin.
# ---------------------------------------------------------------------------

EXPLODE_SEQUENCE_OK = {
    "operators/temporal.py": {
        "F.explode(F.sequence(lb, ub))": (
            "2 sites (range_join_binned left, interval_overlap_join_binned "
            "left): range gear fanout = 2*tolerance/bucket + 1 (pure config); "
            "interval gear fanout = interval_len/bucket + 1 — the ONLY "
            "data-dependent fanout in the catalog, guarded by the optional "
            "max_fanout raise (folded into the used bucket expression)"
        ),
        "F.explode(F.sequence(rb, rub))": (
            "interval_overlap_join_binned right side — same bound and "
            "max_fanout guard as the left"
        ),
    },
    "operators/skew.py": {
        "F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))": (
            "salt replication of the small side — fanout = n_salt (config, "
            "<= pair_salt_width cap 32)"
        ),
    },
    "queries/eventsops.py": {
        "F.explode(F.sequence(F.lit(0), F.lit(6)))": "literal 7-day window",
    },
    "queries/textops.py": {
        "F.explode(F.sequence(F.lit(0), F.lit(_MH_SEEDS - 1)))": (
            "fanout = _MH_SEEDS (module constant)"
        ),
    },
    "queries/dedup.py": {
        "F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))": (
            "salt replication — fanout = pair_salt_width (config, <= 32)"
        ),
    },
    "queries/clusterq.py": {
        "F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))": (
            "salt replication — fanout = pair_salt_width (config, <= 32)"
        ),
    },
    "queries/trainprep.py": {
        "F.explode(F.sequence(F.lit(0), n - 1, F.lit(_CHUNK_STRIDE)))": (
            "2 sites (context chunking): fanout = doc_tokens / _CHUNK_STRIDE "
            "— bounded by doc length (a doc fits on an executor by the "
            "ingest contract), stride is a module constant"
        ),
    },
}

_EXPLODE_SEQ = re.compile(r"explode\(\s*F\.sequence\s*\(")


def _explode_sequence_sites(pkg: Path = PKG):
    for path in sorted(pkg.rglob("*.py")):
        rel = str(path.relative_to(pkg))
        for line in path.read_text().splitlines():
            if _EXPLODE_SEQ.search(line) and not line.lstrip().startswith("#"):
                yield rel, line.strip()


def test_every_explode_sequence_site_documents_its_fanout_bound():
    undocumented = []
    for rel, line in _explode_sequence_sites():
        allowed = EXPLODE_SEQUENCE_OK.get(rel, {})
        if not any(key in line for key in allowed):
            undocumented.append((rel, line))
    assert not undocumented, (
        "explode(sequence(...)) without a documented fanout bound (one "
        "data-dependent hi-lo can multiply a corrupt row into millions — "
        f"add to EXPLODE_SEQUENCE_OK with the bound): {undocumented}"
    )


def test_explode_sequence_audit_is_not_stale():
    sites = list(_explode_sequence_sites())
    for rel, allowed in EXPLODE_SEQUENCE_OK.items():
        for key in allowed:
            assert any(r == rel and key in line for r, line in sites), (
                f"stale explode-sequence audit entry: {rel} :: {key}"
            )


def test_explode_sequence_detector_fires(tmp_path):
    rogue = tmp_path / "rogue.py"
    rogue.write_text(
        'df.withColumn("b", F.explode(F.sequence(F.col("lo"), F.col("hi"))))\n'
        "# F.explode(F.sequence( in a comment is not a call site\n"
    )
    hits = [line for rel, line in _explode_sequence_sites(tmp_path)]
    assert len(hits) == 1, hits


def test_grouped_pandas_detector_fires(tmp_path):
    """The scanner actually catches an undocumented call site — an
    audit whose detector can't fire is an archive, not a net."""
    rogue = tmp_path / "rogue.py"
    rogue.write_text(
        "df.groupBy('lang').applyInPandas(fn, schema)\n"
        "s.groupBy('k').applyInPandasWithState(f, o, st, 'update', t)\n"
        "# applyInPandas( in a comment is NOT a call site\n"
    )
    hits = [line for rel, line in _grouped_pandas_sites(tmp_path)]
    assert len(hits) == 2, hits
    assert all(not any(k in h for k in GROUPED_PANDAS_OK.get("rogue.py", {})) for h in hits)
