from .twins import (  # noqa: F401
    run_to_memory,
    stream_documents,
    stream_events,
    stream_events_with_wm_sentinel,
    streaming_dedup,
    run_foreach_batch_upsert,
    streaming_event_time_join,
    streaming_full_outer_join,
    streaming_left_outer_join,
    streaming_dedup_then_tumbling,
    streaming_session_window,
    streaming_tumbling,
)
