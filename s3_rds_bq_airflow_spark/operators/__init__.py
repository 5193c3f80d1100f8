from .merge import dedup_latest, merge_upsert
from .reconcile import count_reconciliation, verified_cleanup_gate

__all__ = [
    "dedup_latest",
    "merge_upsert",
    "count_reconciliation",
    "verified_cleanup_gate",
]
