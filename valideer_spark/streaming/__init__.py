from .incremental import IncrementalValidator
from .stateful import dedup_stream

__all__ = ["IncrementalValidator", "dedup_stream"]
