"""Event-time processing over the ``events`` table.

Batch window aggregations (tumbling / sliding / session), true
Structured Streaming execution of the same logic asserted equal to the
batch result, and custom stateful sessionization via
``applyInPandasWithState``.
"""

from .stateful import q_streaming_sessionized, sessionize_stream
from .windows import (
    q_events_tumbling,
    q_events_sliding,
    q_events_sessionized,
    q_streaming_tumbling,
    oracles,
)

__all__ = [
    "q_events_tumbling",
    "q_events_sliding",
    "q_events_sessionized",
    "q_streaming_tumbling",
    "q_streaming_sessionized",
    "sessionize_stream",
    "oracles",
]
