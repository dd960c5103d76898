"""The validator algebra: leaf checks, adaptors, combinators, structures.

Clean-room py3 implementation of the reference semantics
(``/root/reference/valideer/validators.py``). This module is the *semantic
oracle* for the Spark engine: every columnar check plan is tested against
these row-level validators.

Semantic gotchas preserved on purpose (SURVEY.md appendix):

* ``Integer``/``Number`` reject ``bool``; the raw-type schema ``int`` accepts it.
* ``Pattern`` anchors at the start only (``re.match``).
* ``Range`` messages format bounds with ``%d`` even for floats; bounds inclusive.
* ``AllOf`` children all see the ORIGINAL value; result = LAST adaptation.
* ``AnyOf`` adaptation = first accepting child; error msgs joined ``" or "``.
* ``Nullable``/``NonNullable`` UNWRAP a nested (Non)Nullable parsed from a
  non-instance schema instead of composing.
* ``Object`` fills a missing property from a Nullable default only when the
  default is non-None; ``ignore_optional_errors`` deletes the bad property.
* Adaptation preserves container classes (``value.__class__(...)``/``copy()``).
* ``Mapping`` validates each VALUE before its KEY; value errors get key context.
"""

from __future__ import annotations

import collections.abc as cabc
import datetime
import inspect
import numbers
import re
from typing import Any, Optional

from .errors import ValidationError, get_type_name
from .registry import Validator, parse, register_factory

__all__ = [
    "AnyOf", "AllOf", "ChainOf", "Nullable", "NonNullable",
    "Enum", "Condition", "AdaptBy", "AdaptTo",
    "Type", "Boolean", "Integer", "Number", "Range",
    "String", "Pattern", "Date", "Datetime", "Time",
    "HomogeneousSequence", "HeterogeneousSequence", "Mapping", "Object",
]


def _describe_types(types) -> str:
    """Join type display names: "a, b or c" (reference validators.py:735-742)."""
    if inspect.isclass(types):
        types = (types,)
    names = [get_type_name(t) for t in types]
    if len(names) == 1:
        return names[0]
    return ", ".join(names[:-1]) + " or " + names[-1]


# --------------------------------------------------------------------------
# combinators
# --------------------------------------------------------------------------

class AnyOf(Validator):
    """Disjunction: first component to accept supplies the adapted value.

    Reference parity: validators.py:18-40 (msgs joined " or ").
    """

    def __init__(self, *schemas):
        self._components = [parse(s) for s in schemas]

    def validate(self, value, adapt=True):
        messages = []
        for component in self._components:
            try:
                return component.validate(value, adapt)
            except ValidationError as ex:
                messages.append(ex.msg)
        raise ValidationError(" or ".join(messages), value)

    @property
    def humanized_name(self):
        return " or ".join(c.humanized_name for c in self._components)


class AllOf(Validator):
    """Conjunction: every component validates the ORIGINAL value; the
    adapted result is the LAST component's output.

    Reference parity: validators.py:43-61 (original-value semantics at :56).
    """

    def __init__(self, *schemas):
        self._components = [parse(s) for s in schemas]

    def validate(self, value, adapt=True):
        out = value
        for component in self._components:
            out = component.validate(value, adapt)
        return out

    @property
    def humanized_name(self):
        return " and ".join(c.humanized_name for c in self._components)


class ChainOf(Validator):
    """Pipeline: each component sees the previous component's adaptation.

    Reference parity: validators.py:64-80.
    """

    def __init__(self, *schemas):
        self._components = [parse(s) for s in schemas]

    def validate(self, value, adapt=True):
        for component in self._components:
            value = component.validate(value, adapt)
        return value

    @property
    def humanized_name(self):
        return " chained to ".join(c.humanized_name for c in self._components)


class Nullable(Validator):
    """Accepts ``None`` (adapting it to ``default``), else delegates.

    ``default`` may be a zero-argument callable. When used as an Object
    property schema, a *missing* property is filled from
    :attr:`default_object_property` iff that is not undefined.

    Reference parity: validators.py:83-133 (unwrapping at :104-106,
    default_object_property at :119-122, "?" factory at :129-133).
    """

    _UNDEFINED = object()

    def __init__(self, schema, default=None):
        if isinstance(schema, Validator):
            self._validator = schema
        else:
            inner = parse(schema)
            if isinstance(inner, (Nullable, NonNullable)):
                inner = inner._validator
            self._validator = inner
        self._default = default

    def validate(self, value, adapt=True):
        if value is None:
            return self.default
        return self._validator.validate(value, adapt)

    @property
    def default(self):
        d = self._default
        return d() if callable(d) else d

    @property
    def default_object_property(self):
        d = self.default
        return d if d is not None else self._UNDEFINED

    @property
    def humanized_name(self):
        return "%s or null" % self._validator.humanized_name


class NonNullable(Validator):
    """Rejects ``None``; optionally delegates to an inner schema.

    Reference parity: validators.py:136-164 (unwrapping at :141-144,
    "+" factory at :160-164).
    """

    def __init__(self, schema=None):
        if schema is not None and not isinstance(schema, Validator):
            inner = parse(schema)
            if isinstance(inner, (Nullable, NonNullable)):
                inner = inner._validator
            self._validator = inner
        else:
            self._validator = schema

    def validate(self, value, adapt=True):
        if value is None:
            self.error(value)
        if self._validator is not None:
            return self._validator.validate(value, adapt)
        return value

    @property
    def humanized_name(self):
        return self._validator.humanized_name if self._validator else "non null"


# --------------------------------------------------------------------------
# leaf checks
# --------------------------------------------------------------------------

class Enum(Validator):
    """Membership in a finite value set.

    Values are kept as a set when hashable, else as a list; an unhashable
    probe value is simply invalid (TypeError swallowed).

    Reference parity: validators.py:167-195.
    """

    values: Any = ()

    def __init__(self, values=None):
        super().__init__()
        if values is None:
            values = self.values
        try:
            self.values = set(values)
        except TypeError:
            self.values = list(values)

    def validate(self, value, adapt=True):
        try:
            if value in self.values:
                return value
        except TypeError:
            pass
        self.error(value)

    @property
    def humanized_name(self):
        # deterministic order: a set iterates in PYTHONHASHSEED-bound order,
        # which would make the message differ between the queries() and
        # oracle_sql() processes if the driver ever splits them; sort by
        # repr so the message is stable across processes (and mixed types)
        return "one of {%s}" % ", ".join(
            sorted(repr(v) for v in self.values)
        )


class Condition(Validator):
    """Accepts a value iff ``predicate(value)`` is truthy.

    Exceptions listed in ``traps`` count as rejection; ``traps=()`` lets
    them propagate. Classes are not accepted as predicates.

    Reference parity: validators.py:198-235.
    """

    def __init__(self, predicate, traps=Exception):
        if not (callable(predicate) and not inspect.isclass(predicate)):
            raise TypeError("Callable expected, %s given" % predicate.__class__)
        self._predicate = predicate
        self._traps = traps

    def validate(self, value, adapt=True):
        if self._traps:
            try:
                ok = self._predicate(value)
            except self._traps:
                ok = False
        else:
            ok = self._predicate(value)
        if not ok:
            self.error(value)
        return value

    def error(self, value):
        raise ValidationError(
            "must satisfy predicate %s" % self.humanized_name, value
        )

    @property
    def humanized_name(self):
        return str(getattr(self._predicate, "__name__", self._predicate))


class AdaptBy(Validator):
    """Replaces the value with ``adaptor(value)``; trapped exceptions are
    wrapped into :class:`ValidationError`.

    Reference parity: validators.py:239-259.
    """

    def __init__(self, adaptor, traps=Exception):
        self._adaptor = adaptor
        self._traps = traps

    def validate(self, value, adapt=True):
        if not self._traps:
            return self._adaptor(value)
        try:
            return self._adaptor(value)
        except self._traps as ex:
            raise ValidationError(str(ex), value)


class AdaptTo(AdaptBy):
    """Adapts to a target class; instances pass through unless ``exact``
    and the value is a strict subclass instance.

    Reference parity: validators.py:262-285.
    """

    def __init__(self, target_cls, traps=Exception, exact=False):
        if not inspect.isclass(target_cls):
            raise TypeError("Type expected, %s given" % target_cls.__class__)
        self._exact = exact
        super().__init__(target_cls, traps)

    def validate(self, value, adapt=True):
        if isinstance(value, self._adaptor) and (
            not self._exact or value.__class__ == self._adaptor
        ):
            return value
        return super().validate(value, adapt)


class Type(Validator):
    """isinstance check with accept/reject type tuples.

    Reference parity: validators.py:288-319 (incl. the raw-class factory).
    """

    accept_types: Any = ()
    reject_types: Any = ()

    def __init__(self, accept_types=None, reject_types=None):
        if accept_types is not None:
            self.accept_types = accept_types
        if reject_types is not None:
            self.reject_types = reject_types

    def validate(self, value, adapt=True):
        if not isinstance(value, self.accept_types) or isinstance(
            value, self.reject_types
        ):
            self.error(value)
        return value

    @property
    def humanized_name(self):
        return self.name or _describe_types(self.accept_types)


class Boolean(Type):
    name = "boolean"
    accept_types = bool


class Integer(Type):
    """Integral numbers, excluding bool."""

    name = "integer"
    accept_types = numbers.Integral
    reject_types = bool


class Number(Type):
    """Any number (incl. Decimal/complex), excluding bool."""

    name = "number"
    accept_types = numbers.Number
    reject_types = bool


class Date(Type):
    name = "date"
    accept_types = datetime.date


class Datetime(Type):
    name = "datetime"
    accept_types = datetime.datetime


class Time(Type):
    name = "time"
    accept_types = datetime.time


class Range(Validator):
    """Inclusive bounds check, optionally over an inner schema's adaptation.

    NB: bound violation messages use ``%d`` (reference parity
    validators.py:361-366), truncating float bounds in the message.
    """

    def __init__(self, schema=None, min_value=None, max_value=None):
        super().__init__()
        self._validator = parse(schema) if schema is not None else None
        self._min_value = min_value
        self._max_value = max_value

    def validate(self, value, adapt=True):
        # reference parity: validators.py:340-368
        if self._validator is not None:
            value = self._validator.validate(value, adapt=adapt)
        if self._min_value is not None and value < self._min_value:
            raise ValidationError(
                "must not be less than %d" % self._min_value, value
            )
        if self._max_value is not None and value > self._max_value:
            raise ValidationError(
                "must not be larger than %d" % self._max_value, value
            )
        return value


class String(Type):
    """Strings with optional length bounds."""

    name = "string"
    accept_types = str

    def __init__(self, min_length=None, max_length=None):
        super().__init__()
        self._min_length = min_length
        self._max_length = max_length

    def validate(self, value, adapt=True):
        super().validate(value)
        if self._min_length is not None and len(value) < self._min_length:
            raise ValidationError(
                "must be at least %d characters long" % self._min_length, value
            )
        if self._max_length is not None and len(value) > self._max_length:
            raise ValidationError(
                "must be at most %d characters long" % self._max_length, value
            )
        return value


_COMPILED_RE = type(re.compile(""))


class Pattern(String):
    """Strings matching a regexp — anchored at the START only (``re.match``).

    Reference parity: validators.py:432-463 (re.match at :447; error
    override at :451-452).
    """

    regexp: Any = None

    def __init__(self, regexp=None):
        super().__init__()
        self.regexp = re.compile(regexp or self.regexp)

    def validate(self, value, adapt=True):
        super().validate(value)
        if not self.regexp.match(value):
            self.error(value)
        return value

    def error(self, value):
        raise ValidationError("must match %s" % self.humanized_name, value)

    @property
    def humanized_name(self):
        return "pattern %s" % self.regexp.pattern


# --------------------------------------------------------------------------
# structures
# --------------------------------------------------------------------------

class HomogeneousSequence(Type):
    """Non-string sequence; every item validated by one schema.

    Adaptation rebuilds ``value.__class__(items)``; item error contexts are
    integer indices. Fails fast on the first invalid item.

    Reference parity: validators.py:466-516.
    """

    accept_types = cabc.Sequence
    reject_types = str

    def __init__(self, item_schema=None, min_length=None, max_length=None):
        super().__init__()
        self._item_validator = (
            parse(item_schema) if item_schema is not None else None
        )
        self._min_length = min_length
        self._max_length = max_length

    def validate(self, value, adapt=True):
        super().validate(value)
        if self._min_length is not None and len(value) < self._min_length:
            raise ValidationError(
                "must contain at least %d elements" % self._min_length, value
            )
        if self._max_length is not None and len(value) > self._max_length:
            raise ValidationError(
                "must contain at most %d elements" % self._max_length, value
            )
        if self._item_validator is None:
            return value
        if adapt:
            return value.__class__(self._checked_items(value, adapt))
        for _ in self._checked_items(value, adapt):
            pass

    def _checked_items(self, value, adapt):
        check = self._item_validator.validate
        for i, item in enumerate(value):
            try:
                yield check(item, adapt)
            except ValidationError as ex:
                raise ex.add_context(i)


class HeterogeneousSequence(Type):
    """Non-string sequence of fixed arity; item i validated by schema i.

    Reference parity: validators.py:519-558.
    """

    accept_types = cabc.Sequence
    reject_types = str

    def __init__(self, *item_schemas):
        super().__init__()
        self._item_validators = [parse(s) for s in item_schemas]

    def validate(self, value, adapt=True):
        super().validate(value)
        if len(value) != len(self._item_validators):
            raise ValidationError(
                "%d items expected, %d found"
                % (len(self._item_validators), len(value)),
                value,
            )
        if adapt:
            return value.__class__(self._checked_items(value, adapt))
        for _ in self._checked_items(value, adapt):
            pass

    def _checked_items(self, value, adapt):
        for i, (validator, item) in enumerate(zip(self._item_validators, value)):
            try:
                yield validator.validate(item, adapt)
            except ValidationError as ex:
                raise ex.add_context(i)


class Mapping(Type):
    """Mappings with optional key/value schemas.

    Each entry's VALUE is validated before its KEY; value errors get the key
    as context, key errors get none. Adaptation rebuilds ``value.__class__``.

    Reference parity: validators.py:561-603 (ordering at :595-603).
    """

    accept_types = cabc.Mapping

    def __init__(self, key_schema=None, value_schema=None):
        super().__init__()
        self._key_validator = parse(key_schema) if key_schema is not None else None
        self._value_validator = (
            parse(value_schema) if value_schema is not None else None
        )

    def validate(self, value, adapt=True):
        super().validate(value)
        if adapt:
            return value.__class__(self._checked_items(value, adapt))
        for _ in self._checked_items(value, adapt):
            pass

    def _checked_items(self, value, adapt):
        kv = self._key_validator
        vv = self._value_validator
        for k, v in value.items():
            if vv is not None:
                try:
                    v = vv.validate(v, adapt)
                except ValidationError as ex:
                    raise ex.add_context(k)
            if kv is not None:
                k = kv.validate(k, adapt)
            yield (k, v)


class Object(Type):
    """Mapping with declared optional/required string properties.

    * missing required properties → error listing them;
    * each declared, present property validated with its name as context —
      unless it is optional and ``ignore_optional_errors``, in which case
      the bad property is dropped from the adapted copy;
    * a missing property whose schema is :class:`Nullable` with a non-None
      default is filled with that default;
    * additional (undeclared) keys: allow (True) / forbid (False) /
      strip (:attr:`REMOVE`) / validate against a schema.

    Adaptation starts from ``value.copy()``. On a name collision between
    ``optional`` and ``required``, required wins.

    Reference parity: validators.py:606-732 (missing-required at :663-666,
    ignore-optional delete at :676-682, Nullable default fill at :683-686,
    additional policies at :688-708, dict merge at :654, factory :712-732).
    """

    accept_types = cabc.Mapping

    REQUIRED_PROPERTIES = False
    ADDITIONAL_PROPERTIES = True
    IGNORE_OPTIONAL_PROPERTY_ERRORS = False
    REMOVE = object()

    def __init__(self, optional={}, required={}, additional=None,
                 ignore_optional_errors=None):
        super().__init__()
        if additional is None:
            additional = self.ADDITIONAL_PROPERTIES
        if ignore_optional_errors is None:
            ignore_optional_errors = self.IGNORE_OPTIONAL_PROPERTY_ERRORS
        if not isinstance(additional, bool) and additional is not self.REMOVE:
            additional = parse(additional)
        merged = dict(optional, **required)
        self._property_validators = [
            (prop, parse(schema)) for prop, schema in merged.items()
        ]
        # set for membership; ordered list (declaration order) for message
        # rendering — a set's iteration order is PYTHONHASHSEED-bound, which
        # would make multi-key missing-required messages differ between
        # processes (and between kernel and lowered plan)
        self._required_keys = set(required)
        self._required_order = list(required)
        self._all_keys = {prop for prop, _ in self._property_validators}
        self._additional = additional
        self._ignore_optional_errors = ignore_optional_errors

    def validate(self, value, adapt=True):
        super().validate(value)
        missing = [k for k in self._required_order if k not in value]
        if missing:
            raise ValidationError(
                "missing required properties: %s" % missing, value
            )

        result = value.copy() if adapt else None
        for prop, validator in self._property_validators:
            if prop in value:
                try:
                    adapted = validator.validate(value[prop], adapt)
                    if result is not None:
                        result[prop] = adapted
                except ValidationError as ex:
                    if (not self._ignore_optional_errors
                            or prop in self._required_keys):
                        raise ex.add_context(prop)
                    elif result is not None:
                        del result[prop]
            elif result is not None and isinstance(validator, Nullable):
                default = validator.default_object_property
                if default is not Nullable._UNDEFINED:
                    result[prop] = default

        if self._additional is not True:
            declared = self._all_keys
            extras = [k for k in value if k not in declared]
            if extras:
                if self._additional is False:
                    raise ValidationError(
                        "additional properties: %s" % extras, value
                    )
                elif self._additional is self.REMOVE:
                    if result is not None:
                        for k in extras:
                            del result[k]
                else:
                    check_extra = self._additional.validate
                    for k in extras:
                        try:
                            adapted = check_extra(value[k], adapt)
                            if result is not None:
                                result[k] = adapted
                        except ValidationError as ex:
                            raise ex.add_context(k)

        return result


# --------------------------------------------------------------------------
# schema mini-language factories — registered LAST-wins, so effective search
# order is: Object, HeterogeneousSequence, HomogeneousSequence, Pattern,
# Type, Condition, NonNullable, Nullable (reference parity base.py:205 +
# module definition order in validators.py).
# --------------------------------------------------------------------------

@register_factory
def _nullable_from_string(obj):
    """``"?name"`` → Nullable(name)."""
    if isinstance(obj, str) and obj.startswith("?"):
        return Nullable(obj[1:])


@register_factory
def _nonnullable_from_string(obj):
    """``"+name"`` → NonNullable(name)."""
    if isinstance(obj, str) and obj.startswith("+"):
        return NonNullable(obj[1:])


@register_factory
def _condition_from_callable(obj):
    """A non-class callable → Condition."""
    if callable(obj) and not inspect.isclass(obj):
        return Condition(obj)


@register_factory
def _type_from_class(obj):
    """A python type → Type."""
    if inspect.isclass(obj):
        return Type(obj)


@register_factory
def _pattern_from_compiled_regexp(obj):
    """A compiled regexp → Pattern."""
    if isinstance(obj, _COMPILED_RE):
        return Pattern(obj)


@register_factory
def _homogeneous_sequence_from_list(obj):
    """``[]`` or ``[schema]`` → HomogeneousSequence."""
    if isinstance(obj, list) and len(obj) <= 1:
        return HomogeneousSequence(*obj)


@register_factory
def _heterogeneous_sequence_from_tuple(obj):
    """``(s1, ..., sN)`` → HeterogeneousSequence."""
    if isinstance(obj, tuple):
        return HeterogeneousSequence(*obj)


@register_factory
def _object_from_dict(obj):
    """``{name: schema}`` → Object; ``+name`` required, ``?name`` optional,
    bare names follow ``Object.REQUIRED_PROPERTIES``."""
    if isinstance(obj, dict):
        optional, required = {}, {}
        for key, schema in obj.items():
            if key.startswith("+"):
                required[key[1:]] = schema
            elif key.startswith("?"):
                optional[key[1:]] = schema
            elif Object.REQUIRED_PROPERTIES:
                required[key] = schema
            else:
                optional[key] = schema
        return Object(optional, required)
