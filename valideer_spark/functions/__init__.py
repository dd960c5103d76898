from .conditions import ColumnCondition

__all__ = ["ColumnCondition"]
