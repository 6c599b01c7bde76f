from .ops import (
    stream_route_to_sinks,
    stream_hash_replace,
    stream_tag_cardinality_limit,
    stream_aggregate,
    stream_dedupe,
    stream_incremental_dedup,
    stream_pages_pipeline,
    stream_reduce_sessions,
    stream_reduce_max_events,
    stream_reduce_merges,
    stream_parse_netflow,
    stream_throttle,
)

__all__ = [
    "stream_aggregate",
    "stream_dedupe",
    "stream_incremental_dedup",
    "stream_pages_pipeline",
    "stream_route_to_sinks",
    "stream_hash_replace",
    "stream_tag_cardinality_limit",
    "stream_reduce_sessions",
    "stream_reduce_max_events",
    "stream_reduce_merges",
    "stream_parse_netflow",
    "stream_throttle",
]
