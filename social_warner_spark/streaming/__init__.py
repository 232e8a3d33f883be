from social_warner_spark.streaming.events import (
    read_events_stream,
    tumbling_counts_stream,
    dedup_stream,
    run_stream_to_memory,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts_stream",
    "dedup_stream",
    "run_stream_to_memory",
]
