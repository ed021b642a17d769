from .jobs import (  # noqa: F401
    dedup_events_stream,
    sessionized_stream,
    stateful_user_totals,
    tumbling_event_counts,
)
