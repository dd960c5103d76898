"""Error types and type-name registry for the validation kernel.

Behavioral contract mirrors the reference library's error surface
(``/root/reference/valideer/base.py:18-57, 349-363``): a ``ValidationError``
carries the failing message, optionally the failing value, and a *context
path* (appended innermost-first) that renders as ``foo[1][b'x']`` —
first element bare, subsequent elements as ``[repr]``.
"""

from __future__ import annotations

from typing import Any, Callable

#: sentinel for "no value attached to this error"
_NO_VALUE = object()

# Optional human-friendly names for types in error messages
# (reference parity: base.py:349-363).
_TYPE_DISPLAY_NAMES: dict[type, str] = {}


def set_name_for_types(name: str, *types: type) -> None:
    """Associate one or more types with an alternative display name."""
    for tp in types:
        _TYPE_DISPLAY_NAMES[tp] = name


def reset_type_names() -> None:
    _TYPE_DISPLAY_NAMES.clear()


def get_type_name(tp: type) -> str:
    return _TYPE_DISPLAY_NAMES.get(tp) or tp.__name__


class SchemaError(Exception):
    """Raised when an object cannot be compiled into a validator."""


class ValidationError(ValueError):
    """Raised when a value fails validation.

    Reference parity: base.py:22-57 (message format, context rendering,
    ``message``/``args`` properties).
    """

    _UNDEFINED = _NO_VALUE  # public alias kept for API parity

    def __init__(self, msg: str, value: Any = _NO_VALUE):
        self.msg = msg
        self.value = value
        self.context: list[Any] = []
        super().__init__()

    def add_context(self, context: Any) -> "ValidationError":
        self.context.append(context)
        return self

    def to_string(self, repr_value: Callable[[Any], str] = repr) -> str:
        text = self.msg
        if self.value is not _NO_VALUE:
            text = "Invalid value %s (%s): %s" % (
                repr_value(self.value),
                get_type_name(self.value.__class__),
                text,
            )
        if self.context:
            # innermost-first storage; render outermost-first, first bare
            parts = []
            for i, ctx in enumerate(reversed(self.context)):
                parts.append("[%r]" % (ctx,) if i > 0 else str(ctx))
            text += " (at %s)" % "".join(parts)
        return text

    def __str__(self) -> str:
        return self.to_string()

    @property
    def message(self) -> str:
        return self.to_string()

    @property
    def args(self):  # noqa: D102 - parity with reference
        return (self.to_string(),)
