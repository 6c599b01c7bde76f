from .ops import (
    stream_aggregate,
    stream_dedupe,
    stream_pages_pipeline,
    stream_reduce_sessions,
    stream_throttle,
)

__all__ = [
    "stream_aggregate",
    "stream_dedupe",
    "stream_pages_pipeline",
    "stream_reduce_sessions",
    "stream_throttle",
]
