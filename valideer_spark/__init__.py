"""valideer_spark — a PySpark-native schema + constraint validation engine.

Two layers:

* :mod:`valideer_spark.core` — the row-level validator algebra (the semantic
  oracle), a clean-room reimplementation of the reference semantics
  (``/root/reference/valideer``), pure py3, no Spark dependency.
* the Spark engine — :mod:`valideer_spark.plans` lowers a validator tree to
  columnar check plans (Spark SQL predicate/adaptation expressions),
  :mod:`valideer_spark.operators` provides engine-level table constraints
  (stats, uniqueness, referential, drift, dedup, similarity, text analysis),
  :mod:`valideer_spark.engine` orchestrates verdicts / violations /
  checkpointing at cluster scale.
"""

from .core import *  # noqa: F401,F403  — the valideer-compatible API
from .core import __all__ as _core_all

# `import valideer_spark as V` is the supported drop-in usage; V.base is
# provided for reference-API compatibility (V.base.reset_type_names()).
from . import core as base  # noqa: F401

__version__ = "0.1.0"
__all__ = list(_core_all) + ["base"]
