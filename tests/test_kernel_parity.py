"""Row-parity suite: every behavior of the reference test suite
(``/root/reference/valideer/tests/test_validators.py``, 171 tests) ported as
pytest fixtures against the clean-room kernel.

The harness mirrors the reference's ``_testValidation``: for each value it
asserts ``is_valid``, both adapt=False/adapt=True paths, the adapted value
AND its exact class, and golden error strings.
"""

from datetime import date, datetime
from decimal import Decimal
from functools import partial, wraps
import collections
import json
import re

import pytest

import valideer_spark as V


class Fraction(V.Type):
    name = "fraction"
    accept_types = (float, complex, Decimal)


class DateOrDatetime(V.Type):
    accept_types = (date, datetime)


class Gender(V.Enum):
    name = "gender"
    values = ("male", "female", "it's complicated")


@pytest.fixture(autouse=True)
def _required_props_default():
    """Reference suite runs with REQUIRED_PROPERTIES=True by default."""
    old = V.Object.REQUIRED_PROPERTIES
    V.Object.REQUIRED_PROPERTIES = True
    V.reset_type_names()
    yield
    V.Object.REQUIRED_PROPERTIES = old


def check(schema, valid=(), invalid=(), adapted=(), errors=(), repr_fn=repr):
    validator = V.parse(schema)
    for from_value, to_value in [(v, v) for v in valid] + list(adapted):
        assert validator.is_valid(from_value), repr(from_value)
        validator.validate(from_value, adapt=False)
        out = validator.validate(from_value, adapt=True)
        assert out.__class__ is to_value.__class__
        assert out == to_value
    for value, error in [(v, None) for v in invalid] + list(errors):
        assert not validator.is_valid(value), repr(value)
        for adapt in (True, False):
            with pytest.raises(V.ValidationError) as exc_info:
                validator.validate(value, adapt=adapt)
            if error:
                assert exc_info.value.to_string(repr_fn) == error
    return validator


# ---------------------------------------------------------------- scalars

def test_none_rejected_by_all():
    for obj in ["boolean", "integer", "number", "string",
                V.HomogeneousSequence, V.HeterogeneousSequence,
                V.Mapping, V.Object, int, float, str,
                Fraction, Fraction(), Gender, Gender()]:
        assert not V.parse(obj).is_valid(None)


def test_boolean():
    for obj in ("boolean", V.Boolean, V.Boolean()):
        check(obj, valid=[True, False], invalid=[1, 1.1, "foo", {}, []])


def test_integer():
    for obj in ("integer", V.Integer, V.Integer()):
        check(obj, valid=[1], invalid=[1.1, "foo", {}, [], False, True])


def test_raw_int_accepts_bool():
    check(int, valid=[1, True, False], invalid=[1.1, "foo", {}, []])


def test_number():
    for obj in ("number", V.Number, V.Number()):
        check(obj, valid=[1, 1.1], invalid=["foo", {}, [], False, True])


def test_raw_float():
    check(float, valid=[1.1], invalid=[1, "foo", {}, [], False, True])


def test_string():
    for obj in ("string", V.String, V.String()):
        check(obj, valid=["foo", "bar"], invalid=[1, 1.1, {}, [], False, True])


def test_string_length_bounds():
    check(V.String(min_length=2), valid=["foo", "fo"], invalid=["f", "", False])
    check(V.String(max_length=2), valid=["", "f", "fo"],
          invalid=["foo", [1, 2, 3]])


def test_pattern_start_anchor_only():
    check(re.compile(r"a*$"), valid=["aaa"], invalid=["aba", "baa"])


def test_range():
    check(V.Range("integer", 1), valid=[1, 2, 3], invalid=[0, -1])
    check(V.Range("integer", max_value=2), valid=[-1, 0, 1, 2], invalid=[3])
    check(V.Range("integer", 1, 2), valid=[1, 2], invalid=[-1, 0, 3])
    check(V.Range(min_value=1, max_value=2), valid=[1, 2], invalid=[-1, 0, 3])


def test_custom_type_union():
    for obj in ("fraction", Fraction, Fraction()):
        check(obj, valid=[1.1, 0j, 5 + 3j, Decimal(1) / Decimal(8)],
              invalid=[1, "foo", {}, [], False, True])


def test_reject_types():
    ev = V.Type(accept_types=Exception, reject_types=Warning)
    ev.validate(KeyError())
    with pytest.raises(V.ValidationError):
        ev.validate(UserWarning())


# ------------------------------------------------------------- sequences

def test_homogeneous_sequence():
    for obj in (V.HomogeneousSequence, V.HomogeneousSequence()):
        check(obj, valid=[[], [1], (1, 2), [1, (2, 3), 4]],
              invalid=[1, 1.1, "foo", {}, False, True])
    check(["number"], valid=[[], [1, 2.1, 3], (1, 4, 6)],
          invalid=[[1, 2.1, 3, "x"]])


def test_heterogeneous_sequence():
    for obj in (V.HeterogeneousSequence, V.HeterogeneousSequence()):
        check(obj, valid=[(), []], invalid=[1, 1.1, "foo", {}, False, True])
    check(("string", "number"), valid=[("a", 2), ["b", 4.1]],
          invalid=[[], (), (2, "a"), ("a", "b"), (1, 2)])


def test_sequence_length_bounds():
    check(V.HomogeneousSequence(int, min_length=2),
          valid=[[1, 2, 4], (1, 2)], invalid=[[1], [], (), "123", "", False])
    check(V.HomogeneousSequence(int, max_length=2),
          valid=[[], (), (1,), (1, 2), [1, 2]], invalid=[[1, 2, 3], "123", "f"])


# ----------------------------------------------------- mappings & objects

def test_mapping():
    for obj in (V.Mapping, V.Mapping()):
        check(obj, valid=[{}, {"foo": 3}],
              invalid=[1, 1.1, "foo", [], False, True])
    check(V.Mapping("string", "number"),
          valid=[{"foo": 3}, {"foo": 3, "bar": -2.1, "baz": Decimal("12.3")}],
          invalid=[{"foo": 3, ("bar",): -2.1}, {"foo": 3, "bar": "2.1"}])


def test_object():
    for obj in (V.Object, V.Object()):
        check(obj, valid=[{}, {"foo": 3}],
              invalid=[1, 1.1, "foo", [], False, True])
    check({"foo": "number", "bar": "string"},
          valid=[{"foo": 1, "bar": "baz"}, {"foo": 1, "bar": "baz", "quux": 42}],
          invalid=[{"foo": 1, "bar": []}, {"foo": "baz", "bar": 2.3}])


def test_required_properties_global():
    check({"foo": "number", "?bar": "boolean", "baz": "string"},
          valid=[{"foo": -23., "baz": "yo"}],
          invalid=[{}, {"bar": True}, {"baz": "yo"}, {"foo": 3},
                   {"bar": False, "baz": "yo"}, {"bar": True, "foo": 3.1}])


def test_required_properties_global_optional_default():
    V.Object.REQUIRED_PROPERTIES = False
    check({"+foo": "number", "bar": "boolean", "+baz": "string"},
          valid=[{"foo": -23., "baz": "yo"}],
          invalid=[{}, {"bar": True}, {"baz": "yo"}, {"foo": 3},
                   {"bar": False, "baz": "yo"}, {"bar": True, "foo": 3.1}])


def test_required_properties_parse_parameter():
    schema = {"foo": "number", "?bar": "boolean", "?nested": [{"baz": "string"}]}
    missing = [{}, {"bar": True}, {"foo": 3, "nested": [{}]}]
    for _ in range(3):
        check(V.parse(schema, required_properties=True), invalid=missing)
        check(V.parse(schema, required_properties=False), valid=missing)


def test_parsing_required_properties_context_manager():
    get_schema = lambda: {"foo": V.Nullable("number"),
                          "?nested": [V.Nullable({"baz": "string"})]}
    valid = [{"foo": 3, "nested": [None]}]
    missing = [{}, {"foo": 3, "nested": [{}]}]
    for _ in range(3):
        with V.parsing(required_properties=False):
            check(get_schema(), valid=valid + missing)
        with V.parsing(required_properties=True):
            check(get_schema(), valid=valid, invalid=missing)
        # gotcha: V.Nullable already parsed inner schema with the defaults
        if V.Object.REQUIRED_PROPERTIES:
            check(V.parse(get_schema(), required_properties=True),
                  invalid=[missing[1]])
        else:
            check(V.parse(get_schema(), required_properties=True),
                  valid=[missing[1]])


def test_ignore_optional_property_errors_parse_parameter():
    schema = {"+foo": "number", "?bar": "boolean",
              "?nested": [{"+baz": "string", "?zoo": "number"}]}
    invalid_required = [{"foo": "2", "bar": True}]
    invalid_optional = [
        {"foo": 3, "bar": "nan"},
        {"foo": 3.1, "nested": [{"baz": "x", "zoo": "12"}]},
        {"foo": 0, "nested": [{"baz": 1, "zoo": 2}]},
    ]
    adapted = [{"foo": 3}, {"foo": 3.1, "nested": [{"baz": "x"}]}, {"foo": 0}]
    for _ in range(3):
        check(V.parse(schema, ignore_optional_property_errors=False),
              invalid=invalid_required + invalid_optional)
        check(V.parse(schema, ignore_optional_property_errors=True),
              invalid=invalid_required,
              adapted=list(zip(invalid_optional, adapted)))


def test_parsing_ignore_optional_property_errors():
    get_schema = lambda: V.Nullable({"+foo": "number", "?bar": "boolean",
                                     "?nested": [{"+baz": "string",
                                                  "?zoo": "number"}]})
    invalid_required = [{"foo": "2", "bar": True}]
    invalid_optional = [
        {"foo": 3, "bar": "nan"},
        {"foo": 3.1, "nested": [{"baz": "x", "zoo": "12"}]},
        {"foo": 0, "nested": [{"baz": 1, "zoo": 2}]},
    ]
    adapted = [{"foo": 3}, {"foo": 3.1, "nested": [{"baz": "x"}]}, {"foo": 0}]
    for _ in range(3):
        with V.parsing(ignore_optional_property_errors=False):
            check(get_schema(), invalid=invalid_required + invalid_optional)
        with V.parsing(ignore_optional_property_errors=True):
            check(get_schema(), invalid=invalid_required,
                  adapted=list(zip(invalid_optional, adapted)))
        # gotcha: inner Nullable parsed before the parse() kwarg applies
        check(V.parse(get_schema(), ignore_optional_property_errors=False),
              invalid=invalid_required + invalid_optional)
        check(V.parse(get_schema(), ignore_optional_property_errors=True),
              invalid=invalid_required + invalid_optional)


def test_adapt_missing_property_from_nullable_default():
    check({"foo": "number", "?bar": V.Nullable("boolean", False)},
          adapted=[({"foo": -12}, {"foo": -12, "bar": False})])


def test_no_additional_properties():
    check(V.Object(required={"foo": "number"}, optional={"bar": "string"},
                   additional=False),
          valid=[{"foo": 23}, {"foo": -23., "bar": "yo"}],
          invalid=[{"foo": 23, "xyz": 1}, {"foo": -23., "bar": "yo", "xyz": 1}])


def test_remove_additional_properties():
    check(V.Object(required={"foo": "number"}, optional={"bar": "string"},
                   additional=V.Object.REMOVE),
          adapted=[({"foo": 23}, {"foo": 23}),
                   ({"foo": -23., "bar": "yo"}, {"foo": -23., "bar": "yo"}),
                   ({"foo": 23, "xyz": 1}, {"foo": 23}),
                   ({"foo": -23., "bar": "yo", "xyz": 1},
                    {"foo": -23., "bar": "yo"})])


def test_additional_properties_schema():
    check(V.Object(required={"foo": "number"}, optional={"bar": "string"},
                   additional="boolean"),
          valid=[{"foo": 23, "bar": "yo", "x1": True, "x2": False}],
          invalid=[{"foo": 23, "x1": 1},
                   {"foo": -23., "bar": "yo", "x1": True, "x2": 0}])


def test_additional_properties_parse_parameter():
    schema = {"?bar": "boolean", "?nested": [{"?baz": "integer"}]}
    values = [{"x1": "yes"}, {"bar": True, "nested": [{"x1": "yes"}]}]
    for _ in range(3):
        check(V.parse(schema, additional_properties=True), valid=values)
        check(V.parse(schema, additional_properties=False), invalid=values)
        check(V.parse(schema, additional_properties=V.Object.REMOVE),
              adapted=[(values[0], {}),
                       (values[1], {"bar": True, "nested": [{}]})])
        check(V.parse(schema, additional_properties="string"),
              valid=values,
              invalid=[{"x1": 42}, {"bar": True, "nested": [{"x1": 42}]}])


def test_parsing_additional_properties():
    get_schema = lambda: {"?bar": "boolean",
                          "?nested": [V.Nullable({"?baz": "integer"})]}
    values = [{"x1": "yes"}, {"bar": True, "nested": [{"x1": "yes"}]}]
    for _ in range(3):
        with V.parsing(additional_properties=True):
            check(get_schema(), valid=values)
        with V.parsing(additional_properties=False):
            check(get_schema(), invalid=values)
        # gotcha: parse() kwarg applies at top level only
        check(V.parse(get_schema(), additional_properties=False),
              invalid=values[:1], valid=values[1:])
        with V.parsing(additional_properties=V.Object.REMOVE):
            check(get_schema(), adapted=[(values[0], {}),
                                         (values[1],
                                          {"bar": True, "nested": [{}]})])
        check(V.parse(get_schema(), additional_properties=V.Object.REMOVE),
              adapted=[(values[0], {}), (values[1], values[1])])
        with V.parsing(additional_properties="string"):
            check(get_schema(), valid=values,
                  invalid=[{"x1": 42}, {"bar": True, "nested": [{"x1": 42}]}])
        check(V.parse(get_schema(), additional_properties="string"),
              invalid=[{"x1": 42}],
              valid=[{"bar": True, "nested": [{"x1": 42}]}])


def test_nested_parsing():
    get_schema = lambda: {"bar": "integer",
                          "?nested": [V.Nullable({"baz": "number"})]}
    values = [
        {"bar": 1},
        {"bar": 1, "nested": [{"baz": 0}, None]},
        {"bar": 1, "xx": 2},
        {"bar": 1, "nested": [{"baz": 2.1, "xx": 1}]},
        {},
        {"bar": 1, "nested": [{}]},
    ]
    check(get_schema(), valid=values[:4], invalid=values[4:])
    with V.parsing(required_properties=True):
        check(get_schema(), valid=values[:4], invalid=values[4:])
        with V.parsing(additional_properties=False):
            check(get_schema(), valid=values[:2], invalid=values[2:])
        check(get_schema(), valid=values[:4], invalid=values[4:])
    check(get_schema(), valid=values[:4], invalid=values[4:])


def test_adapt_preserves_ordered_dict():
    check({"foo": V.AdaptTo(int), "bar": V.AdaptTo(float)},
          adapted=[(collections.OrderedDict([("foo", "1"), ("bar", "2")]),
                    collections.OrderedDict([("foo", 1), ("bar", 2.0)]))])
    check(V.Mapping("string", V.AdaptTo(float)),
          adapted=[(collections.OrderedDict([("foo", "1"), ("bar", "2")]),
                    collections.OrderedDict([("foo", 1.0), ("bar", 2.0)]))])


# ----------------------------------------------------------- combinators

def test_enum():
    check(V.Enum([1, 2, 3]), valid=[1, 2, 3], invalid=[0, 4, "1", [1]])
    check(V.Enum(["foo", "bar"]), valid=["foo", "bar"],
          invalid=["", "fooabar", ["foo"]])
    check(V.Enum([True]), valid=[True], invalid=[False, [True]])
    check(V.Enum([{"foo": "bar"}]), valid=[{"foo": "bar"}])
    check(V.Enum([{"foo": "quux"}]), invalid=[{"foo": "bar"}])


def test_enum_subclass():
    for obj in ("gender", Gender, Gender()):
        check(obj, valid=["male", "female", "it's complicated"],
              invalid=["other", ""])


def test_nullable():
    for obj in ("?integer", V.Nullable(V.Integer()), V.Nullable("+integer")):
        check(obj, valid=[None, 0], invalid=[1.1, True, False])
    check(V.Nullable(["?string"]),
          valid=[None, [], ["foo"], [None], ["foo", None]],
          invalid=["", [None, "foo", 1]])


def test_nullable_with_default():
    check(V.Nullable("integer", -1),
          adapted=[(None, -1), (0, 0)], invalid=[1.1, True, False])
    check(V.Nullable("integer", lambda: -1),
          adapted=[(None, -1), (0, 0)], invalid=[1.1, True, False])


def test_nullable_default_object_property():
    class ObjectNullable(V.Nullable):
        default_object_property = property(lambda self: self.default)

    for obj in ["?integer", V.Nullable("integer"), V.Nullable("integer", None),
                V.Nullable("integer", default=None),
                V.Nullable("integer", lambda: None),
                V.Nullable("integer", default=lambda: None)]:
        check({"?foo": obj}, adapted=[({}, {})])

    for obj in [ObjectNullable("integer"), ObjectNullable("integer", None),
                ObjectNullable("integer", default=None),
                ObjectNullable("integer", lambda: None),
                ObjectNullable("integer", default=lambda: None)]:
        check({"?foo": obj}, adapted=[({}, {"foo": None})])


def test_nonnullable():
    for obj in (V.NonNullable, V.NonNullable()):
        check(obj, invalid=[None], valid=[0, False, "", (), []])
    for obj in ("+integer", V.NonNullable(V.Integer()),
                V.NonNullable("?integer")):
        check(obj, invalid=[None, False], valid=[0, 2])


def test_anyof():
    check(V.AnyOf("integer", {"foo": "integer"}),
          valid=[1, {"foo": 1}], invalid=[{"foo": 1.1}])


def test_allof():
    check(V.AllOf({"id": "integer"}, V.Mapping("string", "number")),
          valid=[{"id": 3}, {"id": 3, "bar": 4.5}],
          invalid=[{"id": 1.1, "bar": 4.5}, {"id": 3, "bar": True},
                   {"id": 3, 12: 4.5}])
    check(V.AllOf("number", lambda x: x > 0,
                  V.AdaptBy(datetime.utcfromtimestamp)),
          adapted=[(1373475820, datetime(2013, 7, 10, 17, 3, 40))],
          invalid=["1373475820", -1373475820])


def test_chainof():
    check(V.ChainOf(V.AdaptTo(int), V.Condition(lambda x: x > 0),
                    V.AdaptBy(datetime.utcfromtimestamp)),
          adapted=[(1373475820, datetime(2013, 7, 10, 17, 3, 40)),
                   ("1373475820", datetime(2013, 7, 10, 17, 3, 40))],
          invalid=["nan", -1373475820])


def test_condition():
    def is_odd(n):
        return n % 2 == 1

    is_even = lambda n: n % 2 == 0

    class C:
        def is_odd_method(self, n):
            return is_odd(n)

        def is_even_method(self, n):
            return is_even(n)

        is_odd_static = staticmethod(is_odd)
        is_even_static = staticmethod(is_even)

    for obj in (is_odd, C().is_odd_method, C.is_odd_static):
        check(obj, valid=[1, 3, -11, 9.0, True], invalid=[6, 2.1, False, "1", []])
    for obj in (is_even, C().is_even_method, C.is_even_static):
        check(obj, valid=[6, 2, -42, 4.0, 0, 0.0, False],
              invalid=[1, 2.1, True, "2", []])
    check(str.isalnum, valid=["abc", "123", "ab32c"],
          invalid=["a+b", "a 1", "", True, 2])
    with pytest.raises(TypeError):
        V.Condition(C)
    with pytest.raises(TypeError):
        V.Condition(is_even, traps=()).validate([2, 4])


def test_condition_partial():
    def max_range(sequence, range_limit):
        return max(sequence) - min(sequence) <= range_limit

    f = wraps(max_range)(partial(max_range, range_limit=10))
    for obj in (f, V.Condition(f)):
        check(obj, valid=[range(11), range(1000, 1011)],
              invalid=[range(12), [0, 1, 2, 3, 4, 11]])


def test_adapt_by():
    check(V.AdaptBy(hex, traps=TypeError),
          invalid=[1.2, "1"], adapted=[(255, "0xff"), (0, "0x0")])
    check(V.AdaptBy(int, traps=(ValueError, TypeError)),
          invalid=["12b", "1.2", {}, (), []],
          adapted=[(12, 12), ("12", 12), (1.2, 1)])
    with pytest.raises(TypeError):
        V.AdaptBy(hex, traps=()).validate(1.2)


def test_adapt_to():
    with pytest.raises(TypeError):
        V.AdaptTo(hex)
    for exact in (False, True):
        check(V.AdaptTo(int, traps=(ValueError, TypeError), exact=exact),
              invalid=["12b", "1.2", {}, (), []],
              adapted=[(12, 12), ("12", 12), (1.2, 1)])

    class smallint(int):
        pass

    i = smallint(2)
    assert V.AdaptTo(int).validate(i) is i
    assert V.AdaptTo(int, exact=True).validate(i) is not i


# --------------------------------------------------------------- framework

def test_schema_errors():
    for obj in [True, 1, 3.2, "foo", object(), ["foo"], {"field": "foo"}]:
        with pytest.raises(V.SchemaError):
            V.parse(obj)


def test_not_implemented_validation():
    class MyValidator(V.Validator):
        pass

    with pytest.raises(NotImplementedError):
        MyValidator().validate(1)


def test_register():
    for register in (V.register, V.Validator.register):
        register("to_int", V.AdaptTo(int, traps=(ValueError, TypeError)))
        check("to_int", invalid=["12b", "1.2"],
              adapted=[(12, 12), ("12", 12), (1.2, 1)])
        with pytest.raises(TypeError):
            register("to_int", int)


def test_accepts():
    @V.accepts(a="fraction", b=int, body={"+field_ids": ["integer"],
                                          "?is_ok": bool, "?sex": "gender"})
    def f(a, b=1, **body):
        pass

    valid = [
        partial(f, 2.0, field_ids=[]),
        partial(f, Decimal(1), b=5, field_ids=[1], is_ok=True),
        partial(f, a=3j, b=-1, field_ids=[1, 2, 5], sex="male"),
        partial(f, 5 + 3j, 0, field_ids=[-12, 0, 0], is_ok=False, sex="female"),
        partial(f, 2.0, field_ids=[], additional="extra param allowed"),
    ]
    invalid = [
        partial(f, 1),
        partial(f, 1.0),
        partial(f, 1.0, b=4.1, field_ids=[]),
        partial(f, 1.0, b=2, field_ids=3),
        partial(f, 1.0, b=1, field_ids=[3.0]),
        partial(f, 1.0, b=1, field_ids=[], is_ok=1),
        partial(f, 1.0, b=1, field_ids=[], sex="m"),
    ]
    for fcall in valid:
        fcall()
    for fcall in invalid:
        with pytest.raises(V.ValidationError):
            fcall()


def test_returns():
    @V.returns(int)
    def f(a):
        return a

    @V.returns(V.Type(type(None)))
    def g(a=True):
        if a:
            return a

    f(1)
    g(False)
    for fcall in (partial(f, 1.0), partial(f, "x"), partial(g, True)):
        with pytest.raises(V.ValidationError):
            fcall()


def test_adapts():
    @V.adapts(body={"+field_ids": ["integer"],
                    "?scores": V.Mapping("string", float),
                    "?users": [{"+name": ("+string", "+string"),
                                "?sex": "gender",
                                "?active": V.Nullable("boolean", True)}]})
    def f(body):
        return body

    adapted = f({"field_ids": [1, 5],
                 "scores": {"foo": 23.1, "bar": 2.0},
                 "users": [
                     {"name": ("Nick", "C"), "sex": "male"},
                     {"name": ("Kim", "B"), "active": False},
                     {"name": ("Joe", "M"), "active": None},
                 ]})
    assert adapted["field_ids"] == [1, 5]
    assert adapted["scores"] == {"foo": 23.1, "bar": 2.0}
    assert adapted["users"][0] == {"name": ("Nick", "C"), "sex": "male",
                                   "active": True}
    assert adapted["users"][1] == {"name": ("Kim", "B"), "active": False}
    assert adapted["users"][2]["name"] == ("Joe", "M")
    assert adapted["users"][2].get("active") is True

    invalid = [
        partial(f, {}),
        partial(f, {"field_ids": [], "scores": {"a": "2.3"}}),
        partial(f, {"field_ids": [], "users": [{"name": ("B", "R", "J")}]}),
        partial(f, {"field_ids": [], "users": [{"name": ("Bob", 12)}]}),
        partial(f, {"field_ids": [], "users": [{"name": ("Bob", None)}]}),
    ]
    for fcall in invalid:
        with pytest.raises(V.ValidationError):
            fcall()


def test_adapts_varargs_kwargs():
    @V.adapts(a="integer", b="number", nums=["number"])
    def f(a, b=1, *nums, **params):
        return a * b + sum(nums)

    assert f(2) == 2
    assert f(2, b=2) == 4
    assert f(2, 2.5, 3) == 8
    assert f(2, 2.5, 3, -2.5) == 5.5

    @V.adapts(a="integer", b="number", params={"?foo": int, "?bar": float})
    def g(a, b=1, **params):
        return a * b + params.get("foo", 1) * params.get("bar", 0.0)

    assert g(1) == 1
    assert g(1, 2) == 2
    assert g(1, b=2.5, foo=3) == 2.5
    assert g(1, b=2.5, bar=3.5) == 6.0
    assert g(1, foo=2, bar=3.5) == 8.0
    assert g(1, b=2.5, foo=2, bar=3.5) == 9.5

    @V.adapts(a="integer", b="number", nums=["number"],
              params={"?foo": int, "?bar": float})
    def h(a, b=1, *nums, **params):
        return a * b + sum(nums) + params.get("foo", 1) * params.get("bar", 0.0)

    assert h(2) == 2
    assert h(2, 2.5, 3, -2.5) == 5.5
    assert h(2, 2.5, 3, foo=2, bar=3.5) == 15.0


def test_humanized_names():
    class DummyValidator(V.Validator):
        name = "dummy"

        def validate(self, value, adapt=True):
            return value

    assert DummyValidator().humanized_name == "dummy"
    assert V.Nullable(DummyValidator()).humanized_name == "dummy or null"
    assert V.AnyOf("boolean", DummyValidator()).humanized_name == \
        "boolean or dummy"
    assert V.AllOf("boolean", DummyValidator()).humanized_name == \
        "boolean and dummy"
    assert V.ChainOf("boolean", DummyValidator()).humanized_name == \
        "boolean chained to dummy"
    assert DateOrDatetime().humanized_name == "date or datetime"


# ------------------------------------------------------------- messages

def test_error_message():
    check({"+foo": "number", "?bar": ["integer"]}, errors=[
        (42, "Invalid value 42 (int): must be Mapping"),
        ({}, "Invalid value {} (dict): missing required properties: ['foo']"),
        ({"foo": "3"}, "Invalid value '3' (str): must be number (at foo)"),
        ({"foo": 3, "bar": None},
         "Invalid value None (NoneType): must be Sequence (at bar)"),
        ({"foo": 3, "bar": [1, "2", 3]},
         "Invalid value '2' (str): must be integer (at bar[1])"),
    ])


def test_error_properties():
    for contexts in ([], ["bar"], ["bar", "baz"]):
        ex = V.ValidationError("foo")
        for context in contexts:
            ex.add_context(context)
        assert ex.message == str(ex)
        assert ex.args == (str(ex),)


def test_error_message_custom_repr():
    check({"+foo": "number", "?bar": ["integer"]}, repr_fn=json.dumps, errors=[
        (42, "Invalid value 42 (int): must be Mapping"),
        ({}, "Invalid value {} (dict): missing required properties: ['foo']"),
        ({"foo": "3"}, 'Invalid value "3" (str): must be number (at foo)'),
        ({"foo": [3]}, 'Invalid value [3] (list): must be number (at foo)'),
        ({"foo": 3, "bar": None},
         "Invalid value null (NoneType): must be Sequence (at bar)"),
        ({"foo": 3, "bar": False},
         "Invalid value false (bool): must be Sequence (at bar)"),
        ({"foo": 3, "bar": [1, {"a": 3}, 3]},
         'Invalid value {"a": 3} (dict): must be integer (at bar[1])'),
    ])


def test_error_message_json_type_names():
    V.set_name_for_types("null", type(None))
    V.set_name_for_types("integer", int)
    V.set_name_for_types("number", float)
    V.set_name_for_types("string", str)
    V.set_name_for_types("array", list, collections.abc.Sequence)
    V.set_name_for_types("object", dict, collections.abc.Mapping)
    check({"+foo": "number", "?bar": ["integer"],
           "?baz": V.AnyOf("number", ["number"]), "?opt": "?string"},
          errors=[
              (42, "Invalid value 42 (integer): must be object"),
              ({}, "Invalid value {} (object): "
                   "missing required properties: ['foo']"),
              ({"foo": "3"},
               "Invalid value '3' (string): must be number (at foo)"),
              ({"foo": None},
               "Invalid value None (null): must be number (at foo)"),
              ({"foo": 3, "bar": None},
               "Invalid value None (null): must be array (at bar)"),
              ({"foo": 3, "bar": [1, "2", 3]},
               "Invalid value '2' (string): must be integer (at bar[1])"),
              ({"foo": 3, "baz": "23"},
               "Invalid value '23' (string): "
               "must be number or must be array (at baz)"),
              ({"foo": 3, "opt": 12},
               "Invalid value 12 (integer): must be string (at opt)"),
          ])


# ------------------------------------------------ flagship complex schema

def _complex_validator():
    return V.parse({
        "n": "number",
        "?i": V.Nullable("integer", 0),
        "?b": bool,
        "?e": V.Enum(["r", "g", "b"]),
        "?d": V.AnyOf("date", "datetime"),
        "?s": V.String(min_length=1, max_length=8),
        "?p": V.Nullable(re.compile(r"\d{1,4}$")),
        "?l": [{"+s2": "string"}],
        "?t": (str, "number"),
        "?h": V.Mapping(int, ["string"]),
        "?o": V.NonNullable({"+i2": "integer"}),
    })


COMPLEX_VALID = [
    {"n": 2},
    {"n": 2.1, "i": 3},
    {"n": -1, "b": False},
    {"n": Decimal(3), "e": "r"},
    {"n": 2, "d": datetime.now()},
    {"n": 0, "d": date.today()},
    {"n": 0, "s": "abc"},
    {"n": 0, "p": None},
    {"n": 0, "p": "123"},
    {"n": 0, "l": []},
    {"n": 0, "l": [{"s2": "foo"}, {"s2": ""}]},
    {"n": 0, "t": ("joe", 3.1)},
    {"n": 0, "h": {5: ["foo", "bar"], 0: []}},
    {"n": 0, "o": {"i2": 3}},
]

COMPLEX_INVALID = [
    None, {}, {"n": None}, {"n": True},
    {"n": 1, "e": None}, {"n": 1, "e": "a"}, {"n": 1, "d": None},
    {"n": 1, "s": None}, {"n": 1, "s": ""}, {"n": 1, "s": "123456789"},
    {"n": 1, "p": "123a"}, {"n": 1, "l": None}, {"n": 1, "l": [None]},
    {"n": 1, "l": [{}]}, {"n": 1, "l": [{"s2": None}]},
    {"n": 1, "l": [{"s2": 1}]}, {"n": 1, "t": ()},
    {"n": 0, "t": (3.1, "joe")}, {"n": 0, "t": ("joe", None)},
    {"n": 1, "h": {5: ["foo", "bar"], "0": []}},
    {"n": 1, "h": {5: ["foo", 2.1], 0: []}},
    {"n": 1, "o": {}}, {"n": 1, "o": {"i2": "2"}},
]


def test_complex_validation():
    cv = _complex_validator()
    for value in COMPLEX_VALID:
        cv.validate(value, adapt=False)
    for value in COMPLEX_INVALID:
        with pytest.raises(V.ValidationError):
            cv.validate(value, adapt=False)


def test_complex_adaptation():
    cv = _complex_validator()
    for value in COMPLEX_VALID:
        adapted = cv.validate(value)
        assert isinstance(adapted["n"], (int, float, Decimal))
        assert isinstance(adapted["i"], int)  # Nullable default fill
        assert adapted.get("b") is None or isinstance(adapted["b"], bool)
        assert adapted.get("t") is None or isinstance(adapted["t"], tuple)
        if adapted.get("l") is not None:
            assert all(isinstance(item["s2"], str) for item in adapted["l"])
        if adapted.get("h") is not None:
            assert all(isinstance(k, int) for k in adapted["h"])


def test_complex_validator_optional_defaults_variant():
    V.Object.REQUIRED_PROPERTIES = False
    cv = V.parse({
        "+n": "+number",
        "i": V.Nullable("integer", 0),
        "b": bool,
        "e": V.Enum(["r", "g", "b"]),
        "d": V.AnyOf("date", "datetime"),
        "s": V.String(min_length=1, max_length=8),
        "p": V.Nullable(re.compile(r"\d{1,4}$")),
        "l": [{"+s2": "string"}],
        "t": (str, "number"),
        "h": V.Mapping(int, ["string"]),
        "o": V.NonNullable({"+i2": "integer"}),
    })
    for value in COMPLEX_VALID:
        cv.validate(value, adapt=False)
    for value in COMPLEX_INVALID:
        with pytest.raises(V.ValidationError):
            cv.validate(value, adapt=False)
