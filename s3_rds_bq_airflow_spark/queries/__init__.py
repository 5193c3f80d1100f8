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

# Plan-rewritten this round (round 11: the four forced-broadcast
# removals + the two optimization-round rewrites — semantics
# identical, plans different), so their old hash-green rows describe
# retired plans; surface them for fresh driver evidence. PRUNE once
# CORRECTNESS_r11 lands green.
_REFRESH_R11 = (
    "q_cohort_retention",
    "q_bloom_prefilter",
    "q_stream_static_join",
    "q_skipgram_cooccur",
    "q18_large_orders",
    "q3_shipping_priority",
    "q_cosine_topk_exact",
    "q_ann_recall_eval",
    "q_rocchio_prf",
    "q_tfidf_topterms",
)

deprioritize(
    tiering.derive_deprioritized(
        registered=list(_QUERIES),
        oracle_backed=set(_ORACLES),
        latest_green=tiering.load_latest_green(),
        refresh=_REFRESH_R11,
    )
)

__all__ = ["all_queries", "all_oracles", "query"]
