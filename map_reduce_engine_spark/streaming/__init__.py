"""Structured Streaming surface (extension beyond the reference).

The reference is strictly batch (SURVEY.md §2 Part B, streaming row: none —
jobs run to completion and clean up, ``MasterNode.java:415-421``). This
package adds the event-stream operators a modern pipeline needs, built on
Spark's unified model so each streaming aggregation shares semantics with
its batch twin in ``queries/events.py``.
"""

from map_reduce_engine_spark.streaming.windows import (
    events_stream,
    ntz_of_instant,
    tumbling_counts,
    sliding_counts,
    session_window_agg,
    dynamic_session_window_agg,
    run_to_memory,
    stateful_running_total,
    streaming_dedup,
    stream_static_enrich,
    stream_stream_interval_join,
    foreach_batch_idempotent_sink,
    stateful_user_stats,
    user_stats_batch_twin,
    chained_window_rollup,
    windowed_value_sketch,
    streaming_cusum_monitor,
    streaming_kmv_distinct,
    streaming_mg_heavy_hitters,
)

__all__ = [
    "ntz_of_instant",
    "streaming_cusum_monitor",
    "streaming_kmv_distinct",
    "streaming_mg_heavy_hitters",
    "windowed_value_sketch",
    "chained_window_rollup",
    "user_stats_batch_twin",
    "stateful_user_stats",
    "stream_stream_interval_join",
    "foreach_batch_idempotent_sink",
    "events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_window_agg",
    "dynamic_session_window_agg",
    "run_to_memory",
    "stateful_running_total",
    "streaming_dedup",
    "stream_static_enrich",
]
