"""Row-level validation kernel (the semantic oracle for the Spark engine)."""

from .errors import (
    SchemaError,
    ValidationError,
    get_type_name,
    reset_type_names,
    set_name_for_types,
)
from .registry import Validator, parse, parsing, register, register_factory
from .checks import (
    AdaptBy,
    AdaptTo,
    AllOf,
    AnyOf,
    Boolean,
    ChainOf,
    Condition,
    Date,
    Datetime,
    Enum,
    HeterogeneousSequence,
    HomogeneousSequence,
    Integer,
    Mapping,
    NonNullable,
    Nullable,
    Number,
    Object,
    Pattern,
    Range,
    String,
    Time,
    Type,
)
from .decorators import accepts, adapts, returns

__all__ = [
    "SchemaError", "ValidationError", "Validator",
    "parse", "parsing", "register", "register_factory",
    "set_name_for_types", "reset_type_names", "get_type_name",
    "accepts", "returns", "adapts",
    "AnyOf", "AllOf", "ChainOf", "Nullable", "NonNullable",
    "Enum", "Condition", "AdaptBy", "AdaptTo",
    "Type", "Boolean", "Integer", "Number", "Range",
    "String", "Pattern", "Date", "Datetime", "Time",
    "HomogeneousSequence", "HeterogeneousSequence", "Mapping", "Object",
]
