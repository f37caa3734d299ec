from .windows import (  # noqa: F401
    stream_events,
    streaming_dedup,
    streaming_tumbling_agg,
    streaming_upsert_sink,
)
