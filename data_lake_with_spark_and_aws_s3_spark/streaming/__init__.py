from .twins import (  # noqa: F401
    run_to_memory,
    stream_events,
    streaming_dedup,
    run_foreach_batch_upsert,
    streaming_event_time_join,
    streaming_session_window,
    streaming_tumbling,
)
