"""Declared query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 (plus the training-data
pipeline extensions) registers here: a DataFrame builder
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, a DuckDB
oracle SQL string producing identical column names and values.

Import side effects populate the registry; ``all_queries()`` /
``all_oracles()`` are what ``__spark_entry__.py`` re-exports.
"""

from .registry import all_oracles, all_queries, deprioritize, query

# Import for registration side effects.
from . import relational  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import scalar  # noqa: E402,F401
from . import ingestion  # noqa: E402,F401
from . import movement  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import eventsops  # noqa: E402,F401
from . import streamingq  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
from . import skewq  # noqa: E402,F401
from . import statsq  # noqa: E402,F401
from . import clusterq  # noqa: E402,F401
from . import coverage  # noqa: E402,F401
from . import funnelq  # noqa: E402,F401
from . import trainprep  # noqa: E402,F401
from . import searchops  # noqa: E402,F401
from . import privacyq  # noqa: E402,F401

# The driver verifies in iteration order and caps its batch at ~50
# entries per round, so enumeration order is a verification-evidence
# budget. The ordering is DERIVED from the driver's own
# CORRECTNESS_r*.json records (see queries/tiering.py): unverified
# oracle-backed queries first (registration order), then greens
# oldest-driver-evidence-first so stale rows get re-confirmed against
# current code, then rows-only sketches dead last. No hand-maintained
# tier lists — the rotation is automatic each round as new records
# land.
from . import tiering
from .registry import _ORACLES, _QUERIES

# Plan-rewritten this round (round 12: the three near-dup persist
# rewrites — semantics identical, plans different: InMemoryRelations
# replace repeated shingle-pipeline subtrees), so their old hash-green
# rows describe retired plans; surface them for fresh driver evidence.
# The round-11 list (ten rows) is PRUNED: CORRECTNESS_r11 landed all
# ten hash-green on the new plans, so the budget returns to
# oldest-evidence rotation. PRUNE this list once CORRECTNESS_r12
# lands green.
_REFRESH_R12 = (
    "q_dedup_minhash_lsh",
    "q_setsim_join",
    "q_containment_dedup",
)

deprioritize(
    tiering.derive_deprioritized(
        registered=list(_QUERIES),
        oracle_backed=set(_ORACLES),
        latest_green=tiering.load_latest_green(),
        refresh=_REFRESH_R12,
    )
)


def clear_query_caches(spark) -> None:
    """Release every persist created by declared-query builders.

    The near-dup/search operators persist key-sized intermediates
    (shingle tables, prefix frames, token statistics — see the
    similarity.py persist convention) and return LAZY frames, so they
    cannot unpersist themselves before the caller's action runs. The
    blocks are MEMORY_AND_DISK and LRU-evictable (an evicted block
    recomputes — correctness never depends on residency), so a
    bounded session self-heals; a long-lived session executing many
    declared queries should call this between queries (or rounds) to
    drop the accumulated cache eagerly. The driver runs each declared
    query once per session, so it never needs to."""
    spark.catalog.clearCache()


__all__ = ["all_queries", "all_oracles", "query", "clear_query_caches"]
