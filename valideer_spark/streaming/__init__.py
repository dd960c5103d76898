from .incremental import IncrementalValidator

__all__ = ["IncrementalValidator"]
