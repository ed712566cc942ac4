from .events import (
    sessionize_stream,
    stream_dedup,
    tumbling_counts_stream,
)

__all__ = ["sessionize_stream", "stream_dedup", "tumbling_counts_stream"]
