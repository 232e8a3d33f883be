from social_warner_spark.streaming.events import (
    enrich_stream,
    followup_join_stream,
    read_events_stream,
    tumbling_counts_stream,
    dedup_stream,
    run_stream_to_memory,
)
from social_warner_spark.streaming.sinks import (
    stream_foreach_batch,
    stream_to_parquet,
)

__all__ = [
    "enrich_stream",
    "followup_join_stream",
    "read_events_stream",
    "tumbling_counts_stream",
    "dedup_stream",
    "run_stream_to_memory",
    "stream_foreach_batch",
    "stream_to_parquet",
]
