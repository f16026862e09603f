from .incremental import (
    EVENTS_SCHEMA,
    deduped,
    read_events_stream,
    run_incremental_upsert,
    run_streaming_sessions,
    streaming_session_rollup,
)

__all__ = [
    "EVENTS_SCHEMA",
    "deduped",
    "read_events_stream",
    "run_incremental_upsert",
    "run_streaming_sessions",
    "streaming_session_rollup",
]
