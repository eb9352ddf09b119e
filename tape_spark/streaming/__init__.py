"""Structured Streaming surface for event-stream analytics.

The reference is batch-only (SURVEY §2.9), so this module is part of the
beyond-reference extension set: window aggregations that run identically
over batch DataFrames and streams (`readStream` + watermark), for the
``events``-style tables a large pipeline ingests continuously.
"""

from .neardup import (
    minhash_append_store,
    minhash_compact_store,
    minhash_match_batch,
    minhash_match_foreach_batch,
    minhash_rebucket_store,
    minhash_save_store,
    stream_minhash_matches,
    suggest_num_buckets,
    suggest_num_buckets_for_store,
)
from .stateful import running_stats
from .windows import (
    read_event_stream,
    stream_dedup,
    sessionize,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "read_event_stream",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "sessionize",
    "stream_dedup",
    "stream_minhash_matches",
    "minhash_save_store",
    "minhash_append_store",
    "minhash_compact_store",
    "minhash_match_batch",
    "minhash_match_foreach_batch",
    "minhash_rebucket_store",
    "suggest_num_buckets",
    "suggest_num_buckets_for_store",
    "running_stats",
]
