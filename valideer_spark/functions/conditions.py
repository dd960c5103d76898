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
    ):
        super().__init__(predicate, traps)
        self.column_predicate = column_predicate
        self._display_name = name

    @property
    def humanized_name(self) -> str:
        if self._display_name:
            return self._display_name
        return super().humanized_name
