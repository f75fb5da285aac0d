from mape_calculation_and_anonymization_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    sliding_event_counts,
    stateful_distinct_users,
    streaming_hourly_wape,
    user_session_windows,
)

__all__ = [
    "read_events_stream",
    "run_stream_to_memory",
    "streaming_hourly_wape",
    "sliding_event_counts",
    "user_session_windows",
    "stateful_distinct_users",
]
