from .incremental import IncrementalValidator
from .stateful import dedup_stream, windowed_event_counts

__all__ = ["IncrementalValidator", "dedup_stream", "windowed_event_counts"]
