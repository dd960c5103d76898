"""Function-boundary validation decorators (driver-side helpers).

Reference parity: ``/root/reference/valideer/base.py:272-346``. These are
row-level conveniences used for job-config functions; they never run on the
Spark hot path.
"""

from __future__ import annotations

import functools
import inspect

from .registry import parse


def accepts(**schemas):
    """Validate (no adaptation) function call arguments against schemas."""
    validate = parse(schemas).validate

    def wrap(func):
        @functools.wraps(func)
        def checked(*args, **kwargs):
            validate(inspect.getcallargs(func, *args, **kwargs), adapt=False)
            return func(*args, **kwargs)
        return checked
    return wrap


def returns(schema):
    """Validate (no adaptation) a function's return value."""
    validate = parse(schema).validate

    def wrap(func):
        @functools.wraps(func)
        def checked(*args, **kwargs):
            out = func(*args, **kwargs)
            validate(out, adapt=False)
            return out
        return checked
    return wrap


def adapts(**schemas):
    """Validate AND adapt function call arguments, then invoke with the
    adapted values (varargs/kwargs reconstructed)."""
    validate = parse(schemas).validate

    def wrap(func):
        spec = inspect.getfullargspec(func)

        @functools.wraps(func)
        def adapting(*args, **kwargs):
            adapted = validate(
                inspect.getcallargs(func, *args, **kwargs), adapt=True
            )
            if spec.varargs is None and spec.varkw is None:
                return func(**adapted)
            extra_args = adapted.pop(spec.varargs, ()) if spec.varargs else ()
            extra_kwargs = adapted.pop(spec.varkw, {}) if spec.varkw else {}
            if not extra_args:
                if extra_kwargs:
                    adapted.update(extra_kwargs)
                return func(**adapted)
            positional = [adapted[a] for a in spec.args]
            positional.extend(extra_args)
            return func(*positional, **extra_kwargs)

        return adapting
    return wrap
