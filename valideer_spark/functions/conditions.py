"""Conditions that carry BOTH a row-level Python predicate (kernel parity)
and a Column-expression builder (JVM lowering — keeps the hot path free of
per-row Python, unlike a bare ``Condition`` which must fall back to a
pandas UDF)."""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column

from ..core import checks as K


class ColumnCondition(K.Condition):
    """A :class:`~valideer_spark.core.checks.Condition` with a native Spark
    lowering.

    :param predicate: row-level Python predicate (the semantic oracle).
    :param column_predicate: ``Column -> Column[bool]`` builder evaluated
        JVM-side; must agree with ``predicate`` on every value.
    :param name: stable display name used in error messages
        ("must satisfy predicate <name>").
    """

    def __init__(
        self,
        predicate: Callable,
        column_predicate: Callable[[Column], Column],
        name: Optional[str] = None,
        traps=Exception,
        soa_fields: Optional[tuple] = None,
        soa_predicate: Optional[Callable[..., Column]] = None,
    ):
        super().__init__(predicate, traps)
        self.column_predicate = column_predicate
        self._display_name = name
        #: optional struct-of-arrays form for conditions over StructType
        #: values: ``soa_fields`` names the (≤2) struct fields the
        #: condition reads; ``soa_predicate`` takes one Column per field
        #: (the per-element field values) and must agree with
        #: ``column_predicate`` on every element — including a NULL
        #: element, which extracts to NULL in every field. Enables the
        #: sequence-of-structs SoA fast path (plans/lowering.py).
        self.soa_fields = tuple(soa_fields) if soa_fields else None
        self.soa_predicate = soa_predicate

    @property
    def humanized_name(self) -> str:
        if self._display_name:
            return self._display_name
        return super().humanized_name
