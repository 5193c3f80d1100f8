"""Structured Streaming surface.

The reference's only stream-shaped constructs are batch re-reads: the
incremental high-watermark sync (`tap_mysql/sync_strategies/
incremental.py:57-66`, bookmark = max replication key, re-read with
``>=``) and an available-but-unconfigured MySQL binlog CDC path
(`tap_mysql/sync_strategies/binlog.py:17-37`, row events + offset
bookmarks + delete tombstones). This package is the Spark-native
answer: file-source micro-batch streams with event-time watermarks,
the same ``F.window``/``F.session_window`` expressions as the batch
queries, exactly-once sinks via checkpointing + idempotent
``foreachBatch`` merge, and custom stateful operators.

At 100 TB posture: the file source scales to object-store listing
(Auto-Loader-style incremental listing), state lives in the
RocksDB-backed state store sharded by key across executors, and the
watermark bounds state size — nothing here holds per-row state
without an eviction horizon.
"""

from .source import event_schema, read_event_stream, stage_as_files
from .windows import sessionize, sliding_event_counts, tumbling_event_counts
from .upsert import stream_upsert_parquet
from .stateful import running_user_totals
from .tws import running_user_totals_tws

__all__ = [
    "event_schema",
    "read_event_stream",
    "stage_as_files",
    "tumbling_event_counts",
    "sliding_event_counts",
    "sessionize",
    "stream_upsert_parquet",
    "running_user_totals",
    "running_user_totals_tws",
]
