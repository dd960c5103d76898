"""Schema parsing front-end: named-validator registry + factory chain.

Reference parity: ``/root/reference/valideer/base.py:60-215``. The schema
mini-language (strings, types, callables, dicts, lists, tuples, compiled
regexps) is compiled eagerly into a tree of :class:`Validator` nodes.

Dispatch order in :func:`parse` (base.py:144-165):

1. ``Validator`` instance → returned as-is.
2. ``Validator`` subclass → instantiated with no arguments.
3. Named registry lookup (unhashable keys fall through); a registry hit
   that is still a class is instantiated and memoized back as an instance.
4. Factory chain, searched in *reverse* registration order; first factory
   returning non-None wins.
5. Otherwise ``SchemaError``.
"""

from __future__ import annotations

import inspect
import threading
from contextlib import contextmanager
from typing import Any, Callable, Optional

from .errors import SchemaError, ValidationError

_registry_lock = threading.RLock()

#: name → Validator instance (or subclass, instantiated lazily on lookup)
_named: dict[Any, Any] = {}

#: factory callables, most-recently-registered first
_factories: list[Callable[[Any], Optional["Validator"]]] = []


def register(name: str, validator: "Validator") -> None:
    """Register a validator *instance* under ``name``."""
    if not isinstance(validator, Validator):
        raise TypeError(
            "Validator instance expected, %s given" % validator.__class__
        )
    _named[name] = validator


def register_factory(func: Callable[[Any], Optional["Validator"]]):
    """Register ``func`` as a schema factory (searched before older ones)."""
    _factories.insert(0, func)
    return func


class Validator:
    """Abstract base of all validators.

    Subclasses implement :meth:`validate`; a class-level ``name`` makes the
    subclass addressable by that name in schemas (auto-registered, reference
    parity base.py:209-215 via ``__init_subclass__`` instead of a metaclass).
    """

    name: Optional[str] = None

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        reg_name = cls.__dict__.get("name")
        if reg_name is not None:
            _named[reg_name] = cls

    def validate(self, value: Any, adapt: bool = True) -> Any:
        """Check ``value``; raise :class:`ValidationError` if invalid.

        When ``adapt`` is true, return the adapted value; otherwise the
        return value is unspecified (validation-only fast path).
        """
        raise NotImplementedError

    def is_valid(self, value: Any) -> bool:
        try:
            self.validate(value, adapt=False)
            return True
        except ValidationError:
            return False

    def error(self, value: Any) -> None:
        raise ValidationError("must be %s" % self.humanized_name, value)

    @property
    def humanized_name(self) -> str:
        return self.name or self.__class__.__name__

    # ---- spark lowering hook (overridden via plans.lowering dispatch) ----

    # static aliases for API parity with the reference (base.py:265-269)
    parse = None  # assigned below, after parse() is defined
    register = staticmethod(register)
    register_factory = staticmethod(register_factory)


def parse(
    obj: Any,
    required_properties: Optional[bool] = None,
    additional_properties: Any = None,
    ignore_optional_property_errors: Optional[bool] = None,
) -> Validator:
    """Compile ``obj`` (schema mini-language) into a :class:`Validator`."""
    if not (
        required_properties
        is additional_properties
        is ignore_optional_property_errors
        is None
    ):
        with parsing(
            required_properties=required_properties,
            additional_properties=additional_properties,
            ignore_optional_property_errors=ignore_optional_property_errors,
        ):
            return parse(obj)

    result: Any = None
    if isinstance(obj, Validator):
        result = obj
    elif inspect.isclass(obj) and issubclass(obj, Validator):
        result = obj()
    else:
        hit = _MISS
        try:
            hit = _named[obj]
        except (KeyError, TypeError):
            pass
        if hit is _MISS:
            for factory in _factories:
                result = factory(obj)
                if result is not None:
                    break
        else:
            result = hit
            if inspect.isclass(hit) and issubclass(hit, Validator):
                result = hit()
                _named[obj] = result  # memoize instance over class

    if not isinstance(result, Validator):
        raise SchemaError("%r cannot be parsed as a Validator" % (obj,))
    return result


_MISS = object()

Validator.parse = staticmethod(parse)


@contextmanager
def parsing(**kwargs):
    """Temporarily override Object parsing defaults for a code block.

    Reference parity: base.py:168-188 — flips ``Object.REQUIRED_PROPERTIES``
    / ``ADDITIONAL_PROPERTIES`` / ``IGNORE_OPTIONAL_PROPERTY_ERRORS`` class
    attributes under a lock, restoring them on exit.
    """
    from .checks import Object

    with _registry_lock:
        saved = {}
        for key, value in kwargs.items():
            if value is not None:
                attr = key.upper()
                saved[key] = getattr(Object, attr)
                setattr(Object, attr, value)
        try:
            yield
        finally:
            for key in kwargs:
                if kwargs[key] is not None:
                    setattr(Object, key.upper(), saved[key])
