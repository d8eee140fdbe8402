from vectorsearchutil_spark.streaming.windows import (
    read_events_stream,
    streaming_dedup,
    streaming_session_window,
    streaming_tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "streaming_dedup",
    "streaming_session_window",
    "streaming_tumbling_counts",
]
