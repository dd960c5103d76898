from .stats import column_profile
from .uniqueness import duplicate_keys
from .referential import orphan_rows, orphan_keys
from .drift import quantile_drift, tdigest_quantiles

__all__ = [
    "column_profile",
    "duplicate_keys",
    "orphan_rows",
    "orphan_keys",
    "quantile_drift",
    "tdigest_quantiles",
]
