from .jobs import (  # noqa: F401
    dedup_events_stream,
    sessionized_stream,
    tumbling_event_counts,
)
