from pulsar_project_spark.streaming.pipeline import (  # noqa: F401
    events_stream,
    run_keep_last_state,
    run_session_windows,
    run_streaming_debounce,
    run_stream_stream_join,
    run_streaming_dedup,
    run_topic_frequencies,
    run_windowed_counts,
)
